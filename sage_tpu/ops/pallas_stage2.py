"""Pallas TPU kernel for stage-2 full candidate rescoring.

Implements score_candidate (/root/reference/crates/sage/src/scoring.rs:
675-767) for a batch of (spectrum, peptide) items as one fused kernel:

per item: for every (fragment, charge) of the peptide's complete b/y
ladders, find the most intense in-window experimental peak (ties to the
later peak index, spectrum.rs:134-159), then accumulate the reference's
strictly-sequential f32 sums (summed b/y intensity, intensity-weighted
ppm) in fragments-iterator order (series, ion, charge) and run the
longest-run automata (scoring.rs:771-793).

Layout: items are processed G2 at a time per grid step. The per-item
compare is a [SLp (fragments, sublanes) x Pk (peaks, lanes)] dense VPU
tile, which requires the ladder rows transposed ([steps, SLp, G2],
prepared by XLA). Per-(item, charge) term planes are staged into VMEM
scratch columns; the sequential phase then walks sublane rows with
jax.lax.fori_loop, processing all G2 items lane-parallel — padding rows
beyond the real ladder length are never visited, and every f32 add
happens in exactly the reference's order, so results are bit-identical
to the XLA path (ops/search.py _build_stage2_compact).

Outputs pack as [steps, 8, G2] f32 columns
(mb, my, summed_b, summed_y, ppm_sum, longest_b, longest_y, unused).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .search import tol_bounds_static as _tol_bounds

G2 = 32  # items per grid step


def _kernel(
    # scalar prefetch
    maxz_ref,
    # inputs
    lad_t_ref,   # [1, SLp, G2] f32 block: item ladders, fragments in sublanes
    pkm_ref,     # [G2, Pk] f32 block: peak masses per item
    pki_ref,     # [G2, Pk] f32 block: peak intensities per item
    # outputs
    out_ref,     # [1, 8, G2] f32 block
    # scratch
    ti, tp, bb, bm, ma, mbmy,
    *, L, SLp, Pk, Z, S, is_nterm, tol,
):
    step = pl.program_id(0)
    base = step * G2
    kind, tlo, thi = tol

    # ---- dense pre-pass: per-charge window bounds for ALL items --------
    f_all = lad_t_ref[0]                             # [SLp, G2]
    for zi in range(Z):
        z = np.float32(zi + 1)
        mz_all = f_all / z
        lo_all, hi_all = _tol_bounds(kind, tlo, thi, mz_all)
        ti[zi] = lo_all                              # stage bounds in the
        tp[zi] = hi_all                              # term scratch for now

    # ---- per-item matching: only the [SLp, Pk] compare + two reductions
    # stay in the unrolled loop; best intensity / best mass land in
    # scratch columns for the dense post-pass
    for g in range(G2):
        pk_row = pkm_ref[g : g + 1, :]               # [1, Pk]
        pi_row = pki_ref[g : g + 1, :]
        maxz = maxz_ref[base + g]
        for zi in range(Z):
            lo = ti[zi, :, g : g + 1]                # [SLp, 1]
            hi = tp[zi, :, g : g + 1]
            qual = (pk_row >= lo) & (pk_row <= hi) & (pi_row >= 0)
            if zi > 0:
                qual = qual & ((zi + 1) < maxz)
            val = jnp.where(qual, pi_row, np.float32(-1.0))
            # most intense in-window peak; the matched peak's mass is the
            # max mass attaining it (masses ascend with index = ties to
            # the LATER index, spectrum.rs:150-157)
            best = jnp.max(val, axis=1, keepdims=True)       # [SLp, 1]
            bmass = jnp.max(
                jnp.where(val == best, pk_row, np.float32(-np.inf)),
                axis=1, keepdims=True,
            )
            bb[zi, :, g : g + 1] = best
            bm[zi, :, g : g + 1] = bmass

    # ---- dense post-pass: matched masks, intensity/ppm terms, mb/my ----
    mb_acc = jnp.zeros((1, G2), jnp.int32)
    my_acc = jnp.zeros((1, G2), jnp.int32)
    for zi in range(Z):
        z = np.float32(zi + 1)
        best = bb[zi]                                # [SLp, G2]
        m = best >= 0
        mi = m.astype(jnp.int32)
        pk_i = jnp.where(m, best, np.float32(0.0))
        pk_m = jnp.where(m, bm[zi], np.float32(0.0))
        mzc = f_all / z
        d = jnp.abs(mzc - pk_m)
        den = mzc + pk_m
        ppm_t = jnp.where(
            m,
            ((pk_i * d) * np.float32(2e6))
            / jnp.where(den == 0, np.float32(1.0), den),
            np.float32(0.0),
        )
        ti[zi] = pk_i
        tp[zi] = ppm_t
        if zi == 0:
            ma[:, :] = mi
        else:
            ma[:, :] = ma[:, :] | mi
        for s in range(S):
            cnt = jnp.sum(mi[s * L : (s + 1) * L, :], axis=0, keepdims=True)
            if is_nterm[s]:
                mb_acc = mb_acc + cnt
            else:
                my_acc = my_acc + cnt
    mbmy[0:1, :] = mb_acc
    mbmy[1:2, :] = my_acc

    # ---- sequential phase: all G2 items lane-parallel -------------------
    zero = jnp.zeros((1, G2), jnp.float32)
    izero = jnp.zeros((1, G2), jnp.int32)

    def series_sum(s, carry):
        # strictly-sequential f32 adds in (ion, charge) order for series s
        def body(j, c):
            acc_s, acc_p = c
            row = s * L + j
            for zi in range(Z):
                acc_s = acc_s + ti[zi, pl.ds(row, 1), :]
                acc_p = acc_p + tp[zi, pl.ds(row, 1), :]
            return (acc_s, acc_p)

        return jax.lax.fori_loop(0, L, body, carry)

    def series_run(s, carry):
        # longest-run automaton (scoring.rs:771-793) incl. the initial
        # last == 0 state swallowing ion index 0
        def body(j, c):
            start, length, last, longest = c
            m = ma[pl.ds(s * L + j, 1), :] > 0
            l = jnp.full((1, G2), 0, jnp.int32) + j
            skip = m & (last == l)
            ext = m & ~skip & (start + length == l)
            rst = m & ~skip & ~ext
            length = jnp.where(ext, length + 1, jnp.where(rst, 1, length))
            start = jnp.where(rst, l, start)
            longest = jnp.where(
                ext | rst, jnp.maximum(longest, length), longest
            )
            last = jnp.where(m & ~skip, l, last)
            return (start, length, last, longest)

        return jax.lax.fori_loop(0, L, body, carry)

    acc_b = zero
    acc_y = zero
    acc_p = zero
    run_b = (izero, izero, izero, izero)
    run_y = (izero, izero, izero, izero)
    for s in range(S):
        if is_nterm[s]:
            acc_b, acc_p = series_sum(s, (acc_b, acc_p))
            run_b = series_run(s, run_b)
        else:
            acc_y, acc_p = series_sum(s, (acc_y, acc_p))
            run_y = series_run(s, run_y)

    out_ref[0, 0:1, :] = mbmy[0:1, :].astype(jnp.float32)
    out_ref[0, 1:2, :] = mbmy[1:2, :].astype(jnp.float32)
    out_ref[0, 2:3, :] = acc_b
    out_ref[0, 3:4, :] = acc_y
    out_ref[0, 4:5, :] = acc_p
    out_ref[0, 5:6, :] = run_b[3].astype(jnp.float32)
    out_ref[0, 6:7, :] = run_y[3].astype(jnp.float32)
    out_ref[0, 7:8, :] = jnp.zeros((1, G2), jnp.float32)


def stage2_pallas_call(
    lad_t, pkm_items, pki_items, maxz,
    *, L, SLp, Pk, Z, S, is_nterm, tol, N,
):
    n_steps = N // G2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, SLp, G2), lambda s, *_: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G2, Pk), lambda s, *_: (s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G2, Pk), lambda s, *_: (s, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, G2), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((Z, SLp, G2), jnp.float32),   # bounds -> intensity terms
            pltpu.VMEM((Z, SLp, G2), jnp.float32),   # bounds -> ppm terms
            pltpu.VMEM((Z, SLp, G2), jnp.float32),   # best intensity per z
            pltpu.VMEM((Z, SLp, G2), jnp.float32),   # best mass per z
            pltpu.VMEM((SLp, G2), jnp.int32),        # matched-any-z
            pltpu.VMEM((2, G2), jnp.int32),          # mb/my counts
        ],
    )
    kernel = functools.partial(
        _kernel, L=L, SLp=SLp, Pk=Pk, Z=Z, S=S,
        is_nterm=tuple(is_nterm), tol=tol,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, 8, G2), jnp.float32),
        grid_spec=grid_spec,
    )(maxz, lad_t, pkm_items, pki_items)


@functools.partial(
    jax.jit,
    static_argnames=("L", "SLp", "Pk", "Z", "S", "is_nterm", "tol", "N"),
)
def stage2_pallas(
    lad2d_full, peaks_dev, spec_idx, pep, maxz,
    *, L, SLp, Pk, Z, S, is_nterm, tol, N,
):
    """Full stage-2 device program: gather per-item ladders and peaks,
    run the kernel, return the packed f32 [N, 7] layout of the XLA path."""
    lad_items = lad2d_full[pep]                       # [N, SLp]
    lad_t = jnp.transpose(
        lad_items.reshape(N // G2, G2, SLp), (0, 2, 1)
    )                                                 # [steps, SLp, G2]
    pkm_items = peaks_dev[0][spec_idx]                # [N, Pk]
    pki_items = peaks_dev[1][spec_idx]
    out = stage2_pallas_call(
        lad_t, pkm_items, pki_items, maxz,
        L=L, SLp=SLp, Pk=Pk, Z=Z, S=S, is_nterm=is_nterm, tol=tol, N=N,
    )
    # [steps, 8, G2] -> [N, 7]
    return jnp.transpose(out, (0, 2, 1)).reshape(N, 8)[:, :7]
