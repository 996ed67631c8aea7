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
# VMEM budget cap: Mosaic's scoped stack holds the [8, F] block plus
# several live temporaries across the unrolled network; 16k keeps the
# measured footprint (~8 MB) under the 16 MB scoped-VMEM limit.
# Larger rows fall back to lax.sort (or, at open-search scale, are
# usually peeled below this by the p75 size-class split).
MAX_F = 1 << 14


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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sort_call(x, interpret=False):
    B, F = x.shape
    return pl.pallas_call(
        functools.partial(_sort_kernel, F=F),
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


def bitonic_sort_rows(x, pad_value=np.int32(2**31 - 1), interpret=None):
    """Sort each row of i32 ``x`` [B, F] ascending. F is padded to a
    power of two with ``pad_value`` (must be >= every real key for the
    suffix to land at the tail) and B to a multiple of 8; the result is
    sliced back to the input shape."""
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
    out = _sort_call(x, interpret=interpret)
    return out[:B, :F]


def use_pallas_sort(F: int, n_pep: int) -> bool:
    """Engage the VMEM sort: TPU backend (the interpreter is far slower
    than lax.sort), row fits the VMEM budget, and peptide ids fit the
    26-bit packing the callers use."""
    env = os.environ.get("SAGE_TPU_PSORT")
    if env is not None:
        return env != "0"
    if jax.default_backend() == "cpu":
        return False
    return F <= MAX_F and n_pep < (1 << 25)
