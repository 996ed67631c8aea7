"""Pallas TPU kernel: batched in-VMEM bitonic sort of i32 rows.

The open-search count core sorts each spectrum's gathered fragment
entries by peptide id ([B, F] i32, F up to tens of thousands) — with
`jax.lax.sort` this is the single largest device cost of an open search
(measured ~60% of stage-1 time at proteome scale). XLA's generic sort
streams HBM every merge pass; a whole row at F <= 64k fits comfortably
in VMEM, so this kernel runs the complete bitonic network on-chip:
8 spectra per grid step, each compare-exchange pass vectorized over the
full [8, F] block with two lane-rolls + min/max + selects, O(log^2 F)
passes and exactly one HBM round trip for the data.

Keys are plain int32 (callers bit-pack any payload; see
open_search._open_count_core) and the result is ascending per row —
bit-identical to `jax.lax.sort` on the same keys, property-tested in
tests/test_pallas_sort.py.

Reference analog: none (the reference's bucketed walk sorts nothing);
this is the TPU-side cost of reformulating database.rs:480-536's sparse
walk as data-parallel gather/sort/run-length counting.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step: one sublane tile
_RB = 8
# VMEM budget cap FOR ONE IN-VMEM BLOCK: Mosaic's scoped stack holds the
# [8, F] block plus several live temporaries across the unrolled
# network; 16k keeps the measured footprint (~8 MB) under the 16 MB
# scoped-VMEM limit.
_BLOCK_MAX = 1 << 14
# default block size for the hierarchical path (F > _BLOCK_MAX): rows
# are split into CB-sized blocks, each sorted fully in VMEM, then merged
# with flip/cross compare-exchange passes (pure elementwise, one HBM
# stream each) plus one in-VMEM finish kernel per merge level.
_CB = int(os.environ.get("SAGE_TPU_PSORT_BLOCK", str(1 << 13)))
# overall cap: rows longer than this fall back to lax.sort (HBM
# footprint of the padded row matrix, not VMEM, is the limit here)
MAX_F = 1 << 17


def _sort_kernel(x_ref, o_ref, *, F):
    v = x_ref[:]  # [RB, F] i32
    lane = jax.lax.broadcasted_iota(jnp.int32, (_RB, F), 1)
    k = F.bit_length() - 1
    for s in range(1, k + 1):
        asc = ((lane >> s) & 1) == 0
        for j in range(s - 1, -1, -1):
            d = 1 << j
            up = (lane & d) == 0  # this element is the lower partner
            # partner value: roll by -d brings x[i+d] to i (for lower
            # partners), +d brings x[i-d] (for upper partners)
            pl_v = pltpu.roll(v, F - d, 1)  # x[i+d] (shift must be >= 0)
            pr_v = pltpu.roll(v, d, 1)      # x[i-d]
            partner = jnp.where(up, pl_v, pr_v)
            lo = jnp.minimum(v, partner)
            hi = jnp.maximum(v, partner)
            # ascending block: the lower index keeps the min
            v = jnp.where(up == asc, lo, hi)
    o_ref[:] = v


def _finish_kernel(x_ref, o_ref, *, F):
    """Ascending bitonic MERGE of each row (rows must be bitonic): the
    within-block tail of a hierarchical merge level — substages with
    stride F/2 .. 1, direction uniform (min keeps the lower index)."""
    v = x_ref[:]  # [RB, F] i32
    lane = jax.lax.broadcasted_iota(jnp.int32, (_RB, F), 1)
    for j in range(F.bit_length() - 2, -1, -1):
        d = 1 << j
        up = (lane & d) == 0
        pl_v = pltpu.roll(v, F - d, 1)  # x[i+d]
        pr_v = pltpu.roll(v, d, 1)      # x[i-d]
        partner = jnp.where(up, pl_v, pr_v)
        v = jnp.where(
            up, jnp.minimum(v, partner), jnp.maximum(v, partner)
        )
    o_ref[:] = v


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def _rows_call(x, kernel, interpret=False):
    B, F = x.shape
    return pl.pallas_call(
        functools.partial(kernel, F=F),
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.int32),
        grid=(B // _RB,),
        in_specs=[
            pl.BlockSpec((_RB, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _sort_call(x, interpret=False):
    return _rows_call(x, _sort_kernel, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("cb", "interpret"))
def _hier_sort(x, cb, interpret=False):
    """Row sort for F > the VMEM block size: sort CB blocks in VMEM,
    then per merge level run one flip pass (compare A[i] with the
    mirrored partner of the sibling run — the first substage of a
    bitonic merge of two ascending runs), cross-block substages at
    strides >= CB (plain paired min/max, one fused HBM stream each),
    and one in-VMEM finish kernel for the strides < CB. Bit-identical
    to lax.sort on i32 keys (single operand, exact duplicates)."""
    B, Fp = x.shape
    nb = Fp // cb
    xb = _rows_call(
        x.reshape(B * nb, cb), _sort_kernel, interpret=interpret
    )
    x = xb.reshape(B, Fp)
    n = 2 * cb
    while n <= Fp:
        xr = x.reshape(B, Fp // n, n)
        a = xr[..., : n // 2]
        b = xr[..., n // 2:][..., ::-1]
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        x = jnp.concatenate(
            [lo, hi[..., ::-1]], axis=-1
        ).reshape(B, Fp)
        d = n // 4
        while d >= cb:
            xr = x.reshape(B, -1, 2, d)
            lo = jnp.minimum(xr[..., 0, :], xr[..., 1, :])
            hi = jnp.maximum(xr[..., 0, :], xr[..., 1, :])
            x = jnp.stack([lo, hi], axis=-2).reshape(B, Fp)
            d //= 2
        x = _rows_call(
            x.reshape(B * nb, cb), _finish_kernel, interpret=interpret
        ).reshape(B, Fp)
        n *= 2
    return x


def bitonic_sort_rows(x, pad_value=np.int32(2**31 - 1), interpret=None,
                      block=None):
    """Sort each row of i32 ``x`` [B, F] ascending. F is padded to a
    power of two with ``pad_value`` (must be >= every real key for the
    suffix to land at the tail) and B to a multiple of 8; the result is
    sliced back to the input shape. ``block`` forces the hierarchical
    block size (testing hook; default _CB, one-shot when the row fits
    VMEM)."""
    B, F = x.shape
    Fp = 1
    while Fp < F:
        Fp *= 2
    Bp = ((B + _RB - 1) // _RB) * _RB
    if Fp != F or Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, Fp - F)),
                    constant_values=pad_value)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cb = min(block or _CB, _BLOCK_MAX)
    if Fp <= (cb if block else _BLOCK_MAX):
        out = _sort_call(x, interpret=interpret)
    else:
        out = _hier_sort(x, cb=cb, interpret=interpret)
    return out[:B, :F]


def use_pallas_sort(F: int, n_pep: int) -> bool:
    """Engage the VMEM sort: TPU backend (the interpreter is far slower
    than lax.sort), row fits the budget (VMEM for one-shot rows, HBM
    streaming for the hierarchical block-merge path), and peptide ids
    fit the 26-bit packing the callers use."""
    env = os.environ.get("SAGE_TPU_PSORT")
    if env is not None:
        return env != "0"
    if jax.default_backend() == "cpu":
        return False
    return F <= MAX_F and n_pep < (1 << 25)
