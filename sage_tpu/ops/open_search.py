"""Peak-major preliminary scoring for open (wide precursor window) search.

The candidate-major stage 1 (ops/search.py) regenerates every candidate's
ion ladder, which is ideal for narrow windows but scales as
O(window x L x Pk) per query — hopeless when a -500/+100 Da window spans
most of the peptide table. This module is the TPU re-design of the
reference's bucketed index walk for that regime
(/root/reference/crates/sage/src/database.rs:480-536 +
scoring.rs:335-382):

1. HOST: for every (peak, fragment-charge) the tolerance window is a
   contiguous range of the flat m/z-sorted fragment index — two
   vectorized searchsorted calls (the f32 window bounds use the exact
   reference op order, so the range covers exactly the in-tolerance
   fragments).
2. DEVICE: each range is split into fixed-size chunks (C=128 entries) and
   the chunks' peptide ids are fetched with a WIDE-ROW gather — the
   table is viewed as [N/8, 8] and whole 8-element rows are gathered, so
   each gather descriptor moves 8 contiguous entries instead of 1
   (TPU gathers are descriptor-bound: measured 6x faster than the
   per-element gather for the same bytes). Alignment slop and chunk
   padding are masked to an out-of-band key and the per-spectrum sort
   (peptide DESCENDING) compacts them to the tail, after which the axis
   is sliced back down to the true max entry count. Run-length counting
   + top_k over run-end counts then yields the per-row top-K
   (count, peptide) with exactly the PreScore tie rule (count desc,
   peptide desc — scoring.rs:43-49), because descending order makes
   top_k's first-occurrence preference pick the largest peptide index.
3. Per query row (spectrum x charge x isotope), entries are masked by the
   row's precursor-mass range [i0, i1) and fragment-charge bound before
   counting, so counts equal the candidate-major stage 1 bit-for-bit.
   The per-run masked-count base is propagated from each run start by a
   cummax (the masked cumsum is non-decreasing) rather than a random
   gather.

Returns the same packed [R, K*2+2] i32 layout as the top-k stage-1 path:
(vals[K], pep[K], matched_total, scored).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

F32 = np.float32

# window-chunking geometry for the wide-row gather: each tolerance window
# is split into chunks of C_CHUNK entries; a chunk fetches RC whole
# V-element table rows (one extra row covers the start's alignment slop)
V_ROW = 8
C_CHUNK = 128
RC = C_CHUNK // V_ROW + 1


def _quarter_octave(n: int) -> int:
    """Smallest value >= n of the form (4..7) * 2^k — static-shape
    padding with <= 4 buckets per octave and <= 12.5% mean waste."""
    octave = 8
    while octave * 2 <= n:
        octave *= 2
    return octave * (-(-n * 4 // octave)) // 4


def _entries_chunked(frag_pep8, starts, lens, Wc, Pk, Z):
    """Chunked wide-row gather: [B, F2] sort keys (+ z tags) where each
    window occupies whole RC*V-slot chunks. Best when windows are long
    (the gather moves 8 contiguous entries per descriptor); at short mean
    window lengths the chunk padding dominates — use _entries_flat."""
    B, Wn = starts.shape
    N8 = frag_pep8.shape[0]
    bidx = jnp.arange(B)[:, None]
    # chunk descriptors: window w owns chunk slots [cumc0_w, cumc_w)
    nc = (lens + (C_CHUNK - 1)) // C_CHUNK              # [B, Wn]
    cumc = jnp.cumsum(nc, axis=1)
    cumc0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), cumc[:, :-1]], axis=1
    )
    tc = cumc[:, -1]                                    # chunks/spectrum
    # owning-window index per chunk slot: every window marks its first
    # slot, cumsum - 1 = index of the last window starting at or before
    # the slot (empty windows share the next window's start and are never
    # the last mark of an occupied slot). Trailing empty windows mark
    # column Wc, which is dropped.
    marks = jnp.zeros((B, Wc + 1), jnp.int32)
    marks = marks.at[bidx, jnp.minimum(cumc0, Wc)].add(
        jnp.ones((B, Wn), jnp.int32)
    )
    w_of = jnp.cumsum(marks[:, :Wc], axis=1) - 1        # [B, Wc]
    w_of = jnp.clip(w_of, 0, Wn - 1)
    slot = jnp.arange(Wc, dtype=jnp.int32)[None, :]
    win_start = starts[bidx, w_of]
    win_len = lens[bidx, w_of]
    cidx = slot - cumc0[bidx, w_of]                     # chunk # in window
    chunk_start = win_start + cidx * C_CHUNK
    chunk_len = jnp.clip(win_len - cidx * C_CHUNK, 0, C_CHUNK)
    chunk_ok = (slot < tc[:, None]) & (chunk_len > 0)
    chunk_start = jnp.clip(chunk_start, 0, N8 * V_ROW - 1)
    # the hot gather: RC whole V-element rows per chunk
    row0 = chunk_start // V_ROW
    a = chunk_start - row0 * V_ROW                      # alignment slop
    rowidx = row0[..., None] + jnp.arange(RC, dtype=jnp.int32)[None, None, :]
    rowidx = jnp.minimum(rowidx, N8 - 1)
    g = frag_pep8[rowidx].reshape(B, Wc, RC * V_ROW)    # [B, Wc, 136]
    pos = jnp.arange(RC * V_ROW, dtype=jnp.int32)[None, None, :]
    evalid = (
        chunk_ok[..., None]
        & (pos >= a[..., None])
        & (pos < (a + chunk_len)[..., None])
        & (g >= 0)
    )
    F2 = Wc * RC * V_ROW
    neg = jnp.where(evalid, -g, np.int32(2**30)).reshape(B, F2)
    if Z == 1:
        return neg, None
    # fragment-charge tag of each entry's window (z-major: w = (z-1)*Pk+pk)
    z_of = jnp.broadcast_to(
        (w_of // Pk + 1)[..., None], (B, Wc, RC * V_ROW)
    ).reshape(B, F2)
    return neg, z_of


def _entries_flat(frag_pep8, starts, lens, F, Pk, Z):
    """Ragged flatten + per-element gather: [B, F] sort keys with zero
    slot padding (entry j of spectrum b reads frag index
    src[b, j] = starts[b, w] + (j - cum[b, w-1]) for its window w).
    Best when windows are short; the per-element gather is descriptor-
    bound at long windows — use _entries_chunked there."""
    B = starts.shape[0]
    frag_pep = frag_pep8.reshape(-1)
    cum = jnp.cumsum(lens, axis=1)                      # [B, W]
    cum0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1
    )
    total = cum[:, -1]                                  # [B]
    # offset_w = starts[w] - cum0[w]; build per-entry offsets by
    # scattering the boundary deltas and cumsum-ing.
    off_w = starts - cum0                               # [B, W]
    off_delta = jnp.concatenate(
        [off_w[:, :1], off_w[:, 1:] - off_w[:, :-1]], axis=1
    )
    deltas = jnp.zeros((B, F), jnp.int32)
    clip_pos = jnp.minimum(cum0, F - 1)
    # windows with len 0 still carry their delta so later offsets stay
    # correct; duplicate positions accumulate (scatter-add)
    deltas = deltas.at[jnp.arange(B)[:, None], clip_pos].add(off_delta)
    src = jnp.cumsum(deltas, axis=1) + jnp.arange(F, dtype=jnp.int32)[None, :]
    jvalid = jnp.arange(F, dtype=jnp.int32)[None, :] < total[:, None]
    src = jnp.clip(src, 0, frag_pep.shape[0] - 1)
    pep = jnp.where(jvalid, frag_pep[src], np.int32(-1))   # [B, F]
    neg = jnp.where(pep >= 0, -pep, np.int32(2**30))
    if Z == 1:
        return neg, None
    # fragment-charge tag via the same boundary-cumsum trick
    w_of = jnp.cumsum(
        jnp.zeros((B, F), jnp.int32).at[
            jnp.arange(B)[:, None], clip_pos
        ].add(jnp.ones((B, starts.shape[1]), jnp.int32)),
        axis=1,
    ) - 1
    z_of = jnp.clip(w_of, 0, Z * Pk - 1) // Pk + 1          # [B, F]
    return neg, z_of


@functools.partial(
    jax.jit, static_argnames=("F", "Wc", "Pk", "Z", "K", "R", "chunked")
)
def _device_open_count(
    frag_pep8,     # i32 [N_frag_pad / V_ROW, V_ROW] (HBM)
    starts,        # i32 [B, Z*Pk] window range starts
    lens,          # i32 [B, Z*Pk] window range lengths
    row_spec,      # i32 [R] spectrum index per query row
    row_i0,        # i32 [R] precursor candidate range
    row_i1,        # i32 [R]
    row_maxz,      # i32 [R] exclusive fragment-charge bound
    *, F, Wc, Pk, Z, K, R, chunked,
):
    B = starts.shape[0]
    if chunked:
        neg, z_of = _entries_chunked(frag_pep8, starts, lens, Wc, Pk, Z)
    else:
        neg, z_of = _entries_flat(frag_pep8, starts, lens, F, Pk, Z)
    # ---- sort per spectrum by peptide DESCENDING; padding/slop sorts to
    # the tail, so the axis can be cut back to F (> any true entry count)
    if z_of is None:
        # single fragment-charge plane: every entry's z tag is 1 and the
        # per-row bound is always >= 2, so the tag (and its extra sort
        # operand) is dead — sort the peptide key alone.
        (neg_sorted,) = jax.lax.sort((neg,), dimension=1, num_keys=1)
        neg_sorted = neg_sorted[:, :F]
        z_sorted = None
    else:
        neg_sorted, z_sorted = jax.lax.sort(
            (neg, z_of), dimension=1, num_keys=1
        )
        neg_sorted = neg_sorted[:, :F]
        z_sorted = z_sorted[:, :F]
    pep_sorted = jnp.where(neg_sorted < 2**30, -neg_sorted, np.int32(-1))

    run_start = jnp.concatenate(
        [
            jnp.ones((B, 1), dtype=bool),
            pep_sorted[:, 1:] != pep_sorted[:, :-1],
        ],
        axis=1,
    )
    run_end = jnp.concatenate(
        [pep_sorted[:, 1:] != pep_sorted[:, :-1], jnp.ones((B, 1), bool)],
        axis=1,
    )

    # ---- per query row: mask by precursor range + charge bound, count
    def per_row(spec, i0, i1, maxz):
        p = pep_sorted[spec]
        ok = (p >= i0) & (p < i1)
        if z_sorted is not None:
            ok &= z_sorted[spec] < maxz
        cs = jnp.cumsum(ok.astype(jnp.int32))
        cs0 = jnp.concatenate([jnp.zeros(1, jnp.int32), cs[:-1]])
        # masked count at each run's start, propagated to the run end:
        # cs0 is non-decreasing, so a plain cummax over (run_start ?
        # cs0 : 0) carries the latest run-start value forward — no
        # random per-element gather (which costs ~10x the cummax here)
        base = jax.lax.cummax(jnp.where(run_start[spec], cs0, 0))
        cnt = jnp.where(run_end[spec] & (p >= 0), cs - base, 0)
        matched_total = jnp.sum(ok & (p >= 0))
        scored = jnp.sum((cnt > 0).astype(jnp.int32))
        vals, idx = jax.lax.top_k(cnt, K)
        cand = jnp.where(vals > 0, p[idx], np.int32(0))
        return vals, cand, matched_total, scored

    vals, cand, mtot, scored = jax.vmap(per_row)(
        row_spec, row_i0, row_i1, row_maxz
    )
    return jnp.concatenate(
        [vals, cand, mtot[:, None], scored[:, None]], axis=1
    )


class OpenSearcher:
    """Peak-major preliminary counts against the flat sorted fragment
    index. Constructed per Scorer; stateless between batches apart from
    the device-resident peptide-id array."""

    def __init__(self, db, frag_tol, Z: int, K: int = 50):
        assert db.fragment_mz_flat is not None
        self.frag_mz = db.fragment_mz_flat
        n = db.fragment_pep_flat.shape[0]
        n_pad = max(((n + 127) // 128) * 128, RC * V_ROW)
        pep_pad = np.full(n_pad, -1, np.int32)
        pep_pad[:n] = db.fragment_pep_flat.astype(np.int32)
        # [N/8, 8] view for the wide-row gather (rows are contiguous)
        self.frag_pep8_dev = jnp.asarray(pep_pad.reshape(-1, V_ROW))
        self.frag_tol = frag_tol
        self.Z = Z
        self.K = K

    def ranges(self, masses: np.ndarray, Zb: int) -> Tuple[np.ndarray, np.ndarray]:
        """Host: [B, Zb*Pk] range starts/lengths for every (z, peak)
        window over the sorted fragment m/z array. +inf-padded peaks give
        NaN/inf bounds -> empty ranges."""
        B, Pk = masses.shape
        starts = np.zeros((B, Zb * Pk), np.int32)
        lens = np.zeros((B, Zb * Pk), np.int32)
        for zi in range(Zb):
            q = (masses * F32(zi + 1)).astype(np.float32)
            with np.errstate(invalid="ignore"):
                # +inf padding peaks produce inf*ppm = NaN bounds; they
                # are zeroed below
                lo, hi = self.frag_tol.bounds(q)
                s = np.searchsorted(self.frag_mz, lo, side="left")
                e = np.searchsorted(self.frag_mz, hi, side="right")
            bad = ~np.isfinite(lo) | ~np.isfinite(hi)
            s[bad] = 0
            e[bad] = 0
            starts[:, zi * Pk : (zi + 1) * Pk] = s
            lens[:, zi * Pk : (zi + 1) * Pk] = np.maximum(e - s, 0)
        return starts, lens

    # device-memory budget for the [B, F] entry matrices; batches whose
    # (spectra x max-entries) footprint exceeds it are split (deep open
    # searches on large proteomes can reach 10^5 entries per spectrum)
    MAX_ELEMENTS = 64 << 20

    def preliminary_packed(
        self, masses: np.ndarray, rows: Dict[str, np.ndarray],
        maxz: np.ndarray, R: int, Zb: int, _ranges=None,
    ) -> np.ndarray:
        """Packed i32 [R, 2K+2] preliminary result for the given query
        rows (same layout as the candidate-major top-k path). Splits into
        spectrum sub-batches when the ragged-entry matrices would exceed
        the element budget (ranges are computed once and sliced through
        the recursion)."""
        B = masses.shape[0]
        starts, lens = self.ranges(masses, Zb) if _ranges is None else _ranges
        # entry layout: chunked wide-row gather when windows are long
        # (>= 16 entries on average the chunk padding is cheaper than
        # per-element gather descriptors), ragged flat gather otherwise
        n_win = max(int((lens > 0).sum()), 1)
        env_ch = os.environ.get("SAGE_TPU_OPEN_CHUNKED")
        if env_ch is not None:
            chunked = env_ch != "0"
        else:
            chunked = float(lens.sum()) / n_win >= 16.0
        tc = ((lens + (C_CHUNK - 1)) // C_CHUNK).sum(axis=1)  # chunks/spec
        if B > 1:
            if chunked:
                F_est = int(tc.max()) * RC * V_ROW + 1
            else:
                F_est = int(lens.sum(axis=1).max()) + 1
            if B * F_est > self.MAX_ELEMENTS:
                # halve the spectrum batch; rows partition cleanly because
                # they reference spectra by index (spectrum-major order)
                mid = B // 2
                si = rows["si"]
                left = si < mid
                n_rows = si.size
                maxz_rows = maxz[:n_rows]
                out = np.zeros((R, 2 * self.K + 2), np.int32)
                off = 0
                for sel, m_lo, m_hi, si_off in (
                    (left, 0, mid, 0),
                    (~left, mid, B, mid),
                ):
                    sub_rows = {
                        k: (v[sel] - (si_off if k == "si" else 0))
                        for k, v in rows.items()
                    }
                    n_sub = int(sel.sum())
                    # pow2 padding: exact 8-multiples would compile a new
                    # executable per distinct sub-batch row count
                    R_sub = 8
                    while R_sub < n_sub:
                        R_sub *= 2
                    mz_sub = np.full(R_sub, 2, np.int32)
                    mz_sub[:n_sub] = maxz_rows[sel]
                    sub = np.asarray(
                        jax.device_get(
                            self.preliminary_packed(
                                masses[m_lo:m_hi], sub_rows, mz_sub,
                                R_sub, Zb,
                                _ranges=(
                                    starts[m_lo:m_hi], lens[m_lo:m_hi]
                                ),
                            )
                        )
                    )
                    out[off : off + n_sub] = sub[:n_sub]
                    off += n_sub
                return out
        totals = lens.reshape(masses.shape[0], -1).sum(axis=1)
        # Wc chunk slots cover the densest spectrum; quarter-octave
        # padding (like F below) bounds recompiles while keeping the
        # sort axis (proportional to Wc) within 12% of minimal
        Wc = _quarter_octave(max(int(tc.max()), 8)) if chunked else 8
        # F strictly greater than any spectrum's true entry count (the
        # chunked sort axis Wc*RC*V is cut down to F before counting;
        # the flat layout uses F as the entry axis directly); at least K
        # so the per-row top_k never exceeds the axis. Quarter-octave
        # padding: F is a static shape, and exact padding would compile a
        # fresh executable per batch (seconds each on tunneled links)
        # for <= 12% extra count-phase work saved.
        F = _quarter_octave(int(max(totals.max(), 1)) + 1)
        F = ((max(F, self.K, 128) + 127) // 128) * 128
        if chunked:
            F = min(F, Wc * RC * V_ROW)
        n_rows = rows["si"].size
        row_spec = np.zeros(R, np.int32)
        row_i0 = np.zeros(R, np.int32)
        row_i1 = np.zeros(R, np.int32)
        row_spec[:n_rows] = rows["si"]
        row_i0[:n_rows] = rows["i0"]
        row_i1[:n_rows] = rows["i1"]
        out = _device_open_count(
            self.frag_pep8_dev,
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(row_spec),
            jnp.asarray(row_i0),
            jnp.asarray(row_i1),
            jnp.asarray(maxz),
            F=F, Wc=Wc, Pk=masses.shape[1], Z=Zb, K=self.K, R=R,
            chunked=chunked,
        )
        out.copy_to_host_async()
        return out  # device handle; caller device_gets at finalize time
