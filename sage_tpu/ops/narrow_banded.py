"""Peak-major banded stage-1 for NARROW search.

The candidate-major stage 1 (ops/search.py) compares every candidate
fragment against every peak — O(W x L x Pk) per query row. That is the
right shape for tiny windows, but at proteome scale (W of hundreds) it
burns ~100x more raw ops than the reference's sparse bucketed walk
(database.rs:480-536, scoring.rs:335-382). This module is the sparse
formulation for the narrow regime, built TPU-first:

1. The flat m/z-sorted fragment index is re-sorted by (peptide BAND,
   m/z) with FINE bands (~2k peptides each — far finer than the open
   search's, because a narrow precursor window spans only 1-2 such
   bands). Per (peak, fragment-charge, covered band), the in-tolerance
   fragments form a contiguous range of the band segment.
2. The range endpoints are found ON DEVICE with a vectorized bounded
   binary search (a fori_loop of gather+compare steps over
   [spectra, bands, peaks] lanes) — no host searchsorted, no extra
   upload beyond the 2x[B, nbcov] segment bounds. The f32 window bounds
   use the exact reference op order (tol_bounds_static), so the ranges
   cover exactly the fragments the candidate-major compare counts.
3. Entries are gathered/sorted/run-length-counted per spectrum and
   masked per query row by the same `_open_count_core` that powers the
   open search — bit-identical counts to the candidate-major stage 1,
   at ~entries-touched cost instead of O(W x L x Pk).

The per-spectrum entry capacity F is a static shape learned adaptively:
the device program reports the true max entry count and the caller
re-runs at a grown F on overflow (same adapt-and-redo contract as the
fused stage-2 budget).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .open_search import (
    V_ROW,
    _open_count_core,
    _quarter_octave,
    spectrum_window_union,
)
from .pallas_sort import use_pallas_sort
from .search import tol_bounds_static


@partial(
    jax.jit,
    static_argnames=(
        "F", "Pk", "Zb", "K", "R", "nbcov", "tol", "nstep", "psort",
    ),
)
def _banded_count(
    frag_mz,     # f32 [N_pad] (band, m/z)-sorted fragment masses
    frag_pep8,   # i32 [N_pad / V_ROW, V_ROW] matching peptide ids
    peaks_dev,   # f32 [2, B, Pk] (masses, intensities; +inf pad)
    bb,          # i32 [B, nbcov, 2] covered-band segment bounds [lo, hi)
    ints,        # i32 [8, R] query rows (spec, p0, i0, i1, maxz, z, iso, slot)
    *, F, Pk, Zb, K, R, nbcov, tol, nstep, psort=False,
):
    """Packed i32 [R, 2K+2] per-row top-K (vals, pep, mtot, scored) plus
    the true max per-spectrum entry count (the F-overflow signal)."""
    masses = peaks_dev[0]
    B = masses.shape[0]
    kind, lo_t, hi_t = tol
    seg_lo = bb[:, :, 0][:, :, None]  # [B, nbcov, 1]
    seg_hi = bb[:, :, 1][:, :, None]

    def bounded_count(bound, inclusive):
        """First in-segment index NOT satisfying (mz < bound) /
        (mz <= bound): a bounded binary search, vectorized over every
        (spectrum, band, peak) lane. NaN/inf bounds (padding peaks)
        compare false -> empty ranges."""
        lo_i = jnp.broadcast_to(seg_lo, bound.shape).astype(jnp.int32)
        hi_i = jnp.broadcast_to(seg_hi, bound.shape).astype(jnp.int32)

        def step(_, st):
            lo_c, hi_c = st
            mid = (lo_c + hi_c) // 2
            v = frag_mz[jnp.clip(mid, 0, frag_mz.shape[0] - 1)]
            pred = (v <= bound) if inclusive else (v < bound)
            pred = pred & (lo_c < hi_c)
            lo_c = jnp.where(pred, mid + 1, lo_c)
            hi_c = jnp.where(pred, hi_c, jnp.minimum(mid, hi_c))
            return lo_c, hi_c

        lo_i, _ = jax.lax.fori_loop(0, nstep, step, (lo_i, hi_i))
        return lo_i

    starts_z = []
    lens_z = []
    for zi in range(Zb):
        q = masses * np.float32(zi + 1)               # [B, Pk]
        lo_b, hi_b = tol_bounds_static(kind, lo_t, hi_t, q)
        lo_b = jnp.broadcast_to(lo_b[:, None, :], (B, nbcov, Pk))
        hi_b = jnp.broadcast_to(hi_b[:, None, :], (B, nbcov, Pk))
        left = bounded_count(lo_b, inclusive=False)   # [B, nbcov, Pk]
        right = bounded_count(hi_b, inclusive=True)
        # +inf padding peaks produce inf/NaN bounds; `v <= inf` is true
        # for every fragment, so unmasked they'd claim whole band
        # segments (the host open-search ranges mask these identically)
        finite = jnp.isfinite(lo_b) & jnp.isfinite(hi_b)
        ln = jnp.where(finite, jnp.maximum(right - left, 0), 0)
        starts_z.append(left.reshape(B, nbcov * Pk))
        lens_z.append(ln.reshape(B, nbcov * Pk))
    starts = jnp.concatenate(starts_z, axis=1)        # [B, Zb*nbcov*Pk]
    lens = jnp.concatenate(lens_z, axis=1).astype(jnp.int32)
    starts = starts.astype(jnp.int32)

    vals, cand, mtot, scored = _open_count_core(
        frag_pep8, starts, lens,
        ints[0], ints[2], ints[3], ints[4],
        F=F, Wc=8, Pk=nbcov * Pk, Z=Zb, K=K, R=R, chunked=False,
        psort=psort,
    )
    packed = jnp.concatenate(
        [vals, cand, mtot[:, None], scored[:, None]], axis=1
    )
    totmax = jnp.max(jnp.sum(lens, axis=1))
    return packed, totmax[None]


class NarrowBanded:
    """Per-Scorer state for the banded narrow stage 1: the
    (band, m/z)-sorted fragment arrays on device plus the adaptive
    per-spectrum entry capacity."""

    def __init__(self, db, K: int):
        n = int(db.fragment_pep_flat.shape[0])
        n_pep = len(db)
        self.n_pep = n_pep
        bw = int(os.environ.get("SAGE_TPU_NARROW_BAND_W", "2048"))
        self.band_w = max(bw, 8)
        self.n_bands = max(-(-n_pep // self.band_w), 1)
        pep_flat = db.fragment_pep_flat.astype(np.int32)
        band = pep_flat // np.int32(self.band_w)
        order = np.argsort(band, kind="stable")  # keeps m/z order in-band
        mz_b = db.fragment_mz_flat[order]
        pep_b = pep_flat[order]
        counts = np.bincount(band, minlength=self.n_bands)
        self.band_off = np.concatenate([[0], np.cumsum(counts)]).astype(
            np.int64
        )
        n_pad = max(((n + V_ROW - 1) // V_ROW) * V_ROW, 2 * V_ROW)
        mz_pad = np.full(n_pad, np.inf, np.float32)
        mz_pad[:n] = mz_b
        pep_pad = np.full(n_pad, -1, np.int32)
        pep_pad[:n] = pep_b
        self.frag_mz_dev = jnp.asarray(mz_pad)
        self.frag_pep8_dev = jnp.asarray(pep_pad.reshape(-1, V_ROW))
        self.K = K
        self.n_frags = n
        # adaptive per-spectrum entry capacity (grown on overflow)
        self._F = None
        self.nstep = int(np.ceil(np.log2(max(counts.max(initial=2), 2)))) + 2

    def estimate_F(self, frag_tol, Pk: int, Zb: int, nbcov: int) -> int:
        if self._F is not None:
            return self._F
        lo, hi = frag_tol.bounds(np.float32(1000.0))
        wfrac = max((float(hi) - float(lo)) / 1000.0, 1e-7)
        per_band = self.n_frags / self.n_bands
        est = per_band * wfrac * Pk * Zb * nbcov * 2.0 + 64.0
        F = _quarter_octave(int(est) + 1)
        F = ((max(F, self.K, 128) + 127) // 128) * 128
        self._F = F
        return F

    def grow_F(self, needed: int) -> None:
        F = _quarter_octave(int(needed * 1.5) + 1)
        self._F = ((max(F, self._F or 128, 128) + 127) // 128) * 128

    def dispatch(self, peaks_dev, rows, ints_dev, R: int, Zb: int,
                 frag_tol, Pk: int):
        """Device dispatch: returns (packed [R, 2K+2] device array,
        totmax [1] device array, F used). ``ints_dev`` is the fused
        path's [8, R] query-row array (original row order, single
        segment). The caller threads totmax to the host via its own
        (single) fetch and re-runs at a grown F when totmax exceeded
        it."""
        B = int(peaks_dev.shape[1])
        # per-spectrum union of precursor windows -> covered bands
        u0, u1 = spectrum_window_union(rows, B)
        b0 = np.clip(u0 // self.band_w, 0, self.n_bands - 1)
        b1 = np.clip(
            np.maximum(u1 - 1, 0) // self.band_w, 0, self.n_bands - 1
        )
        b1 = np.maximum(b1, b0)
        ncov = int((b1 - b0 + 1).max()) if B else 1
        nbcov = 1
        while nbcov < ncov:
            nbcov *= 2
        bands = b0[:, None] + np.arange(nbcov)[None, :]  # [B, nbcov]
        valid = bands <= b1[:, None]
        bands = np.clip(bands, 0, self.n_bands - 1)
        bb = np.zeros((B, nbcov, 2), np.int32)
        bb[:, :, 0] = self.band_off[bands]
        bb[:, :, 1] = np.where(
            valid, self.band_off[bands + 1], self.band_off[bands]
        )

        F = self.estimate_F(frag_tol, Pk, Zb, nbcov)
        tol = (frag_tol.kind, float(frag_tol.lo), float(frag_tol.hi))
        packed, totmax = _banded_count(
            self.frag_mz_dev, self.frag_pep8_dev, peaks_dev,
            jnp.asarray(bb), ints_dev,
            F=F, Pk=Pk, Zb=Zb, K=self.K, R=R, nbcov=nbcov, tol=tol,
            nstep=self.nstep, psort=use_pallas_sort(F, self.n_pep),
        )
        return packed, totmax, F
