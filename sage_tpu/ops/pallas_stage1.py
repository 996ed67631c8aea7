"""Pallas TPU kernel for stage-1 preliminary scoring (narrow windows).

Implements the hot loop of the reference's preliminary pass
(/root/reference/crates/sage/src/scoring.rs:335-382 over the bucketed
index database.rs:480-536) as a single fused VMEM-resident kernel:

for each query row (spectrum x charge x isotope): DMA the precursor
window's precomputed fragment ladders (a [W, SLp] f32 slice of the
HBM-resident ladder table) into VMEM, compare every fragment against
every peak's per-charge tolerance window with the rank-difference trick
(#(lo <= f) - #(hi < f)), reduce to per-candidate matched counts, and
write one packed i32 column: [counts[0..W), matched_total, scored].

Layout choices driven by Mosaic's no-cross-lane-movement rule:
* peaks arrive pre-transposed as [steps, Pk, G] so the per-charge window
  bounds live in SUBLANES ([Pk, 1] columns) and broadcast against the
  fragment window's LANES ([1, SLp] rows) — the [Pk, SLp] compare tile is
  fully dense VPU work with no transposes.
* outputs are written column-major [steps, W+2 (sublanes), G (lanes)] and
  untransposed by XLA after the kernel.

Per grid step the kernel processes G=8 rows, double-buffering the next
group's window DMAs behind the current group's compute. All f32 window
math uses the same op order as the XLA path (ops/search.py
count_fragment_matches), so the two paths are bit-identical.

The kernel always emits the full [R, W+2] counts; for wide windows
(W > K) the caller composes it with an XLA per-row top-K on device so
only the packed [R, 2K+2] result is ever fetched (ops/search.py
_build_stage1_pallas).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .search import tol_bounds_static as _tol_bounds

G = 8  # query rows per grid step


def _kernel(
    # scalar prefetch
    p0_ref, i0_ref, i1_ref, maxz_ref,
    # inputs
    lad_ref,        # [P_pad, SLp] f32, HBM (ANY)
    peaks_ref,      # [1, Pk, G] f32 block (peaks in sublanes, rows in lanes)
    # outputs
    out_ref,        # [1, OUTS, G] i32 block (counts in sublanes)
    # scratch
    win, cnt, sems,
    *, W, SLp, Pk, Z, tol, n_steps,
):
    step = pl.program_id(0)

    def start_group(g_step, slot):
        # one DMA per row in the group; row windows are scattered in the
        # ladder table so they cannot share one descriptor
        base = g_step * G
        for g in range(G):
            pltpu.make_async_copy(
                lad_ref.at[pl.ds(p0_ref[base + g], W)],
                win.at[slot, g],
                sems.at[slot, g],
            ).start()

    @pl.when(step == 0)
    def _():
        start_group(0, 0)

    @pl.when(step + 1 < n_steps)
    def _():
        start_group(step + 1, (step + 1) % 2)

    slot = step % 2
    base = step * G
    for g in range(G):
        pltpu.make_async_copy(
            lad_ref.at[pl.ds(p0_ref[base + g], W)],
            win.at[slot, g],
            sems.at[slot, g],
        ).wait()

    kind, tlo, thi = tol
    for g in range(G):
        pk_col = peaks_ref[0, :, g : g + 1]    # [Pk, 1]
        maxz = maxz_ref[base + g]
        qb = []
        for zi in range(Z):
            z = np.float32(zi + 1)
            q = pk_col * z
            lo_q, hi_q = _tol_bounds(kind, tlo, thi, q)
            if zi > 0:
                # plane active only below the row's fragment-charge bound;
                # +inf bounds match no finite fragment
                z_ok = (zi + 1) < maxz
                lo_q = jnp.where(z_ok, lo_q, np.float32(np.inf))
                hi_q = jnp.where(z_ok, hi_q, np.float32(np.inf))
            qb.append((lo_q, hi_q))
        def per_candidate(w, _):
            f_row = win[slot, g, pl.ds(w, 1), :]  # [1, SLp]
            acc = jnp.zeros((Pk, SLp), jnp.int32)
            for lo_q, hi_q in qb:
                a = (f_row >= lo_q).astype(jnp.int32)   # [Pk, SLp]
                b = (f_row > hi_q).astype(jnp.int32)
                acc = acc + (a - b)
            # invalid fragments hold -inf and contribute 0 to a - b
            s = jnp.sum(acc, axis=0, keepdims=True)     # [1, SLp]
            cnt[pl.ds(w, 1), g : g + 1] = jnp.sum(s, axis=1, keepdims=True)
            return 0

        jax.lax.fori_loop(0, W, per_candidate, 0)
        p0 = p0_ref[base + g]
        gidx = p0 + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        valid = (gidx >= i0_ref[base + g]) & (gidx < i1_ref[base + g])
        counts = jnp.where(valid, cnt[0:W, g : g + 1], 0)  # [W, 1]
        mtot = jnp.sum(counts, axis=0, keepdims=True)      # [1, 1]
        scored = jnp.sum(
            (counts > 0).astype(jnp.int32), axis=0, keepdims=True
        )
        out_ref[0, 0:W, g : g + 1] = counts
        out_ref[0, W : W + 1, g : g + 1] = mtot
        out_ref[0, W + 1 : W + 2, g : g + 1] = scored


def stage1_counts_pallas_call(
    lad2d, peaks_t, p0, i0, i1, maxz, *, W, SLp, Pk, Z, R, tol, out_rows
):
    """Invoke the stage-1 counts kernel (call under jit).

    lad2d: [P_pad, SLp] f32 index-filtered ladder table (-inf invalid);
    peaks_t: [R//G, Pk, G] f32 per-row neutral peak masses, transposed;
    p0/i0/i1/maxz: [R] i32 row metadata. Returns [R//G, out_rows, G] i32
    packed columns (counts[0..W), matched_total, scored)."""
    n_steps = R // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, Pk, G), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows, G), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, G, W, SLp), jnp.float32),
            pltpu.VMEM((W, G), jnp.int32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    kernel = functools.partial(
        _kernel, W=W, SLp=SLp, Pk=Pk, Z=Z, tol=tol, n_steps=n_steps
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, out_rows, G), jnp.int32),
        grid_spec=grid_spec,
    )(p0, i0, i1, maxz, lad2d, peaks_t)


@functools.partial(
    jax.jit, static_argnames=("W", "SLp", "Pk", "Z", "R", "tol")
)
def stage1_counts_pallas(
    lad2d, peaks_dev, spec_idx, p0, i0, i1, maxz, *, W, SLp, Pk, Z, R, tol
):
    """Full stage-1 device program: gather per-row peaks, run the kernel,
    untranspose to the packed [R, W+2] i32 layout the host merge expects."""
    out_rows = ((W + 2 + 7) // 8) * 8
    peaks_rows = peaks_dev[0][spec_idx]                    # [R, Pk]
    peaks_t = jnp.transpose(
        peaks_rows.reshape(R // G, G, Pk), (0, 2, 1)
    )                                                      # [R//G, Pk, G]
    out = stage1_counts_pallas_call(
        lad2d, peaks_t, p0, i0, i1, maxz,
        W=W, SLp=SLp, Pk=Pk, Z=Z, R=R, tol=tol, out_rows=out_rows,
    )
    # [R//G, out_rows, G] -> [R, W+2]
    return jnp.transpose(out, (0, 2, 1)).reshape(R, out_rows)[:, : W + 2]
