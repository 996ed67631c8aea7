"""Peak-major preliminary scoring for open (wide precursor window) search.

The candidate-major stage 1 (ops/search.py) regenerates every candidate's
ion ladder, which is ideal for narrow windows but scales as
O(window x L x Pk) per query — hopeless when a -500/+100 Da window spans
most of the peptide table. This module is the TPU re-design of the
reference's bucketed index walk for that regime
(/root/reference/crates/sage/src/database.rs:480-536 +
scoring.rs:335-382):

1. HOST: the flat fragment index is segmented into peptide-mass BANDS
   (sorted by (band, m/z)); for every (peak, fragment-charge, covered
   band) the tolerance window is a contiguous range of that band's
   m/z-sorted segment — vectorized searchsorted calls (the f32 window
   bounds use the exact reference op order, so the ranges cover exactly
   the in-tolerance fragments). Only bands intersecting the spectrum's
   precursor-window union are searched or gathered (~4x less device
   work for -500/+100 Da on a proteome; see OpenSearcher._auto_bands).
2. DEVICE: each range's peptide ids are fetched with an ALIGNED
   WIDE-ROW gather — the table is viewed as [N/V, V] (V=64) and each
   slot fetches one whole aligned row, so a window costs len/V + <=2
   gather descriptors (TPU gathers are descriptor-bound). Alignment
   slack is masked to an out-of-band key and the per-spectrum sort
   (peptide DESCENDING) compacts it to the tail, after which the axis
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

from .pallas_sort import use_pallas_sort

F32 = np.float32

# row-aligned gather geometry: each slot of the dense layout fetches one
# whole V_ROW-element row of the fragment-pep table. TPU gathers are
# descriptor-bound (~30 ns per descriptor regardless of size up to
# hundreds of bytes), so fewer, wider rows win as long as the alignment
# slack (<= 2 partial rows per window) stays small next to the window
# length: measured on v5e at 2.6M peptides / -500+100 Da, V_ROW=64 cut
# the gather phase ~3x over the round-1 8-wide chunk layout.
# SAGE_TPU_OPEN_VROW overrides for A/B runs (pow2; banded windows are
# shorter, where narrower rows trade descriptors for less sort slack).
V_ROW = int(os.environ.get("SAGE_TPU_OPEN_VROW", "64"))


def _quarter_octave(n: int) -> int:
    """Smallest value >= n of the form (4..7) * 2^k — static-shape
    padding with <= 4 buckets per octave and <= 12.5% mean waste."""
    octave = 8
    while octave * 2 <= n:
        octave *= 2
    return octave * (-(-n * 4 // octave)) // 4



def spectrum_window_union(rows, B):
    """Per-spectrum union [u0, u1) of the precursor-window peptide-index
    ranges of its query rows (0-width where a spectrum has no live
    rows). Shared by the open-search geometry, the banded narrow stage 1
    and the mesh open sharding — ONE definition of the union rule."""
    u0 = np.full(B, np.iinfo(np.int64).max, np.int64)
    u1 = np.zeros(B, np.int64)
    live = rows["i1"] > rows["i0"]
    if live.any():
        np.minimum.at(u0, rows["si"][live], rows["i0"][live])
        np.maximum.at(u1, rows["si"][live], rows["i1"][live])
    return np.where(u1 > 0, u0, 0), u1


def covered_bands(u0, u1, band_w: int, nb: int, B: int):
    """Host: per-spectrum covered band range (b0, b1) and the static
    slot count nbcov — ONE definition shared by ranges(),
    ranges_device() and the dispatch-time element-budget check."""
    if u0 is None or nb == 1:
        b0 = np.zeros(B, np.int64)
        b1 = np.full(B, nb - 1, np.int64)
    else:
        b0 = np.clip(u0 // band_w, 0, nb - 1).astype(np.int64)
        b1 = np.clip(
            np.maximum(u1 - 1, 0) // band_w, 0, nb - 1
        ).astype(np.int64)
        b1 = np.maximum(b1, b0)
    nbcov = int((b1 - b0 + 1).max()) if B else 1
    return b0, b1, nbcov


@functools.partial(
    jax.jit, static_argnames=("Zb", "nbcov", "tol")
)
def _device_ranges(
    mz64,       # f32 [R64, 64] band-aligned sorted masses (+inf pad)
    dec,        # f32 [n_bands, DEC] every 64th mass per band (+inf pad)
    row_off,    # i32 [n_bands] first mz64 row of each band
    blen,       # i32 [n_bands] true entries per band
    boff,       # i32 [n_bands] band start in the ORIGINAL flat arrays
    bfirst,     # f32 [n_bands] first mass per band (+inf when empty)
    blast,      # f32 [n_bands] last mass per band (-inf when empty)
    peaks,      # f32 [2, B, Pk]
    band_ids,   # i32 [B, nbcov] covered band per slot (clipped)
    bvalid,     # bool [B, nbcov]
    *, Zb, nbcov, tol,
):
    """Exact per-(z, peak, band) window ranges on device — see
    OpenSearcher.ranges_device. The rank of a bound among a band's
    sorted masses is found with a THREE-level decimated descent (each
    level exact because the masses — hence every decimation — are
    non-decreasing within a band, +inf-padded):

    1. a dense compare-count against the 4096x decimation (every 64th
       of ``dec``) locates the 64-group of ``dec`` containing the
       boundary: all groups before it have max OP bound, so all their
       elements do;
    2. one aligned 64-lane gather of that ``dec`` group + masked count
       finishes the rank among the 64x-decimated values — j =
       #(decimated values OP bound) locates the one 64-lane mass row
       that can contain the boundary (positions [0, 64j) all satisfy
       OP, position 64j+63 does not);
    3. a masked compare-count inside that mass row finishes it.

    Exact for any duplicate structure. The dense level-1 compare is
    O(DEC/64) per bound instead of O(DEC) — at proteome scale
    (DEC ~ 48k rows/band) the one-level form was ~60x more compare
    work and dominated the whole open-search device time."""
    from .search import tol_bounds_static

    masses = peaks[0]
    B, Pk = masses.shape
    NR = mz64.shape[0]
    kind, lo_t, hi_t = tol
    BIG = np.float32(3.0e38)
    lane = jnp.arange(64, dtype=jnp.int32)
    # level-1 tables derived in-trace: dec padded to a 64-multiple and
    # viewed as [nb, DEC2, 64]; dec2 = per-group max (last element)
    nb_t, DEC = dec.shape
    DEC2 = -(-DEC // 64)
    decp = jnp.pad(
        dec, ((0, 0), (0, DEC2 * 64 - DEC)), constant_values=np.inf
    )
    decg = decp.reshape(nb_t, DEC2, 64)
    dec2 = decg[:, :, 63]                        # [nb, DEC2]

    def rank_slot(bound, bids):
        # bound: [B, Pk, 2] f32 with the strict (lo) bound in [..., 0]
        # and the inclusive (hi) bound in [..., 1] (non-finite lanes
        # replaced by BIG, masked afterward); bids: [B] band per
        # spectrum for this covered-band slot. One slot at a time keeps
        # the gathered intermediates at [B, Pk, 2, 64] — the all-slots
        # form OOMed at B=1024.
        ro = row_off[bids]                       # [B]
        bl = blen[bids]
        rows_b = (bl + 63) // 64
        d2 = dec2[bids]                          # [B, DEC2]
        # level 1: group of dec holding each bound's rank boundary
        q_lo = jnp.sum(
            (d2[:, None, :] < bound[..., 0][..., None]),
            axis=-1, dtype=jnp.int32,
        )
        q_hi = jnp.sum(
            (d2[:, None, :] <= bound[..., 1][..., None]),
            axis=-1, dtype=jnp.int32,
        )
        q2 = jnp.stack([q_lo, q_hi], axis=-1)    # [B, Pk, 2]
        qc = jnp.minimum(q2, DEC2 - 1)
        # level 2: rank among the 64x-decimated values (+inf pad never
        # satisfies OP, so no validity mask is needed)
        dg = decg[bids[:, None, None], qc]       # [B, Pk, 2, 64]
        c2 = jnp.sum(
            jnp.where(
                jnp.arange(2, dtype=jnp.int32)[None, None, :, None] == 0,
                dg < bound[..., 0][..., None, None],
                dg <= bound[..., 1][..., None, None],
            ).astype(jnp.int32),
            axis=-1,
        )
        j2 = qc * 64 + c2                        # [B, Pk, 2]
        jr = jnp.minimum(
            j2, jnp.maximum(rows_b[:, None, None] - 1, 0)
        )
        rowidx = jnp.clip(ro[:, None, None] + jr, 0, NR - 1)
        vals = mz64[rowidx]                      # [B, Pk, 2, 64]
        lanepos = jr[..., None] * 64 + lane
        ok = lanepos < bl[:, None, None, None]
        c = jnp.where(
            jnp.arange(2, dtype=jnp.int32)[None, None, :, None] == 0,
            vals < bound[..., 0][..., None, None],
            vals <= bound[..., 1][..., None, None],
        )
        cnt = jnp.sum((c & ok).astype(jnp.int32), axis=-1)
        return jnp.minimum(jr * 64 + cnt, bl[:, None, None])

    starts_l, lens_l = [], []
    for zi in range(Zb):
        q = masses * np.float32(zi + 1)
        lo_b, hi_b = tol_bounds_static(kind, lo_t, hi_t, q)
        finite = jnp.isfinite(lo_b) & jnp.isfinite(hi_b)
        lo_c = jnp.where(finite, lo_b, BIG)
        hi_c = jnp.where(finite, hi_b, BIG)
        bound = jnp.stack([lo_c, hi_c], axis=-1)  # [B, Pk, 2]
        for k in range(nbcov):
            bids = band_ids[:, k]
            r = rank_slot(bound, bids)           # [B, Pk, 2]
            # the host's `hit` shortcut: windows that don't overlap the
            # band's mass span keep start 0 — reproduced exactly so the
            # device arrays are byte-identical to ranges()
            hit = (
                finite & bvalid[:, k][:, None]
                & (hi_b >= bfirst[bids][:, None])
                & (lo_b <= blast[bids][:, None])
            )
            ln = jnp.where(hit, jnp.maximum(r[..., 1] - r[..., 0], 0), 0)
            st = jnp.where(hit, boff[bids][:, None] + r[..., 0], 0)
            # host layout: col = (zi*nbcov + k)*Pk + pk
            starts_l.append(st)
            lens_l.append(ln)
    return (
        jnp.concatenate(starts_l, axis=1).astype(jnp.int32),
        jnp.concatenate(lens_l, axis=1).astype(jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("Zb", "tol")
)
def _device_ranges_flat(
    mz64, dec, row_off, blen, boff, bfirst, blast,
    peaks,       # f32 [2, B, Pk]
    slot_spec,   # i32 [NS] spectrum per slot
    slot_band,   # i32 [NS] band per slot (clipped)
    slot_valid,  # bool [NS]
    *, Zb, tol,
):
    """Slot-major form of _device_ranges: exact per-(z, peak) window
    ranges for an EXPLICIT list of (spectrum, band) slots — the
    size-class dispatch already enumerates live slots, so probing only
    those does ~nbcov/live_fraction less work than the [B, nbcov] grid
    (dead covered-band padding slots gathered like live ones there).
    Same three-level decimated descent, bit-identical ranks; columns
    are z-major (zi*Pk + pk), matching the nbcov=1 count core layout."""
    from .search import tol_bounds_static

    masses = peaks[0]
    B, Pk = masses.shape
    NS = slot_spec.shape[0]
    NR = mz64.shape[0]
    kind, lo_t, hi_t = tol
    BIG = np.float32(3.0e38)
    lane = jnp.arange(64, dtype=jnp.int32)
    nb_t, DEC = dec.shape
    DEC2 = -(-DEC // 64)
    decp = jnp.pad(
        dec, ((0, 0), (0, DEC2 * 64 - DEC)), constant_values=np.inf
    )
    decg = decp.reshape(nb_t, DEC2, 64)
    dec2 = decg[:, :, 63]

    bids = slot_band
    ro = row_off[bids]
    bl = blen[bids]
    rows_b = (bl + 63) // 64
    d2 = dec2[bids]                              # [NS, DEC2]

    starts_l, lens_l = [], []
    for zi in range(Zb):
        q = masses * np.float32(zi + 1)
        lo_b, hi_b = tol_bounds_static(kind, lo_t, hi_t, q)  # [B, Pk]
        lo_s = lo_b[slot_spec]                   # [NS, Pk]
        hi_s = hi_b[slot_spec]
        finite = jnp.isfinite(lo_s) & jnp.isfinite(hi_s)
        lo_c = jnp.where(finite, lo_s, BIG)
        hi_c = jnp.where(finite, hi_s, BIG)
        bound = jnp.stack([lo_c, hi_c], axis=-1)  # [NS, Pk, 2]
        q_lo = jnp.sum(
            (d2[:, None, :] < bound[..., 0][..., None]),
            axis=-1, dtype=jnp.int32,
        )
        q_hi = jnp.sum(
            (d2[:, None, :] <= bound[..., 1][..., None]),
            axis=-1, dtype=jnp.int32,
        )
        q2 = jnp.stack([q_lo, q_hi], axis=-1)     # [NS, Pk, 2]
        qc = jnp.minimum(q2, DEC2 - 1)
        dg = decg[bids[:, None, None], qc]        # [NS, Pk, 2, 64]
        c2 = jnp.sum(
            jnp.where(
                jnp.arange(2, dtype=jnp.int32)[None, None, :, None] == 0,
                dg < bound[..., 0][..., None, None],
                dg <= bound[..., 1][..., None, None],
            ).astype(jnp.int32),
            axis=-1,
        )
        j2 = qc * 64 + c2
        jr = jnp.minimum(
            j2, jnp.maximum(rows_b[:, None, None] - 1, 0)
        )
        rowidx = jnp.clip(ro[:, None, None] + jr, 0, NR - 1)
        vals = mz64[rowidx]                       # [NS, Pk, 2, 64]
        lanepos = jr[..., None] * 64 + lane
        ok = lanepos < bl[:, None, None, None]
        c = jnp.where(
            jnp.arange(2, dtype=jnp.int32)[None, None, :, None] == 0,
            vals < bound[..., 0][..., None, None],
            vals <= bound[..., 1][..., None, None],
        )
        cnt = jnp.sum((c & ok).astype(jnp.int32), axis=-1)
        r = jnp.minimum(jr * 64 + cnt, bl[:, None, None])
        hit = (
            finite & slot_valid[:, None]
            & (hi_s >= bfirst[bids][:, None])
            & (lo_s <= blast[bids][:, None])
        )
        ln = jnp.where(hit, jnp.maximum(r[..., 1] - r[..., 0], 0), 0)
        st = jnp.where(hit, boff[bids][:, None] + r[..., 0], 0)
        starts_l.append(st)
        lens_l.append(ln)
    return (
        jnp.concatenate(starts_l, axis=1).astype(jnp.int32),
        jnp.concatenate(lens_l, axis=1).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("nbcov", "Zb", "Pk"))
def _range_stats(starts, lens, *, nbcov=1, Zb=1, Pk=1):
    """Device [2] i32: (max per-(spectrum, band) total entries, max
    per-(spectrum, band) gather rows) — the sticky-shape overflow check
    for device-planned open batches (threaded to the host through the
    merge tail row). With nbcov == 1 the unit is the whole spectrum."""
    B = starts.shape[0]
    ends = starts + lens
    rows = jnp.where(
        lens > 0, (ends + (V_ROW - 1)) // V_ROW - starts // V_ROW, 0
    )
    if nbcov > 1:
        l4 = lens.reshape(B, Zb, nbcov, Pk)
        r4 = rows.reshape(B, Zb, nbcov, Pk)
        return jnp.stack([
            jnp.max(jnp.sum(l4, axis=(1, 3))),
            jnp.max(jnp.sum(r4, axis=(1, 3))),
        ]).astype(jnp.int32)
    return jnp.stack([
        jnp.max(jnp.sum(lens, axis=1)),
        jnp.max(jnp.sum(rows, axis=1)),
    ]).astype(jnp.int32)


def _entries_rows(frag_pep8, starts, lens, Wr, Pk, Z):
    """Row-aligned wide-row gather: [B, F2] sort keys (+ z tags) where
    window w (fragment range [s, e)) owns the whole V_ROW-aligned table
    rows floor(s/V) .. ceil(e/V); each slot fetches ONE aligned row, so
    the gather issues len/V + <=2 descriptors per window with no overlap
    slop, and per-element masks trim the alignment slack. Best when
    windows are long; at short mean window lengths the up-to-2-row
    padding dominates — use _entries_flat."""
    B, Wn = starts.shape
    N8 = frag_pep8.shape[0]
    bidx = jnp.arange(B)[:, None]
    ends = starts + lens
    r0 = starts // V_ROW
    nr = jnp.where(
        lens > 0, (ends + (V_ROW - 1)) // V_ROW - r0, 0
    )  # rows/window
    cumr = jnp.cumsum(nr, axis=1)
    cumr0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), cumr[:, :-1]], axis=1
    )
    tr = cumr[:, -1]                                    # rows/spectrum
    # owning-window index per row slot: every window marks its first
    # slot, cumsum - 1 = index of the last window starting at or before
    # the slot (empty windows share the next window's start and are never
    # the last mark of an occupied slot). Trailing empty windows mark
    # column Wr, which is dropped.
    marks = jnp.zeros((B, Wr + 1), jnp.int32)
    marks = marks.at[bidx, jnp.minimum(cumr0, Wr)].add(
        jnp.ones((B, Wn), jnp.int32)
    )
    w_of = jnp.cumsum(marks[:, :Wr], axis=1) - 1        # [B, Wr]
    w_of = jnp.clip(w_of, 0, Wn - 1)
    slot = jnp.arange(Wr, dtype=jnp.int32)[None, :]
    ridx = slot - cumr0[bidx, w_of]                     # row # in window
    row = r0[bidx, w_of] + ridx
    row_ok = slot < tr[:, None]
    row = jnp.clip(row, 0, N8 - 1)
    g = frag_pep8[row]                                  # [B, Wr, V]
    gpos = (
        row[..., None] * V_ROW
        + jnp.arange(V_ROW, dtype=jnp.int32)[None, None, :]
    )
    ws = starts[bidx, w_of][..., None]
    we = ends[bidx, w_of][..., None]
    evalid = row_ok[..., None] & (gpos >= ws) & (gpos < we) & (g >= 0)
    F2 = Wr * V_ROW
    neg = jnp.where(evalid, -g, np.int32(2**30)).reshape(B, F2)
    if Z == 1:
        return neg, None
    # fragment-charge tag of each entry's window (z-major: w = (z-1)*Pk+pk)
    z_of = jnp.broadcast_to(
        (w_of // Pk + 1)[..., None], (B, Wr, V_ROW)
    ).reshape(B, F2)
    return neg, z_of


def _entries_flat(frag_pep8, starts, lens, F, Pk, Z):
    """Ragged flatten + per-element gather: [B, F] sort keys with zero
    slot padding (entry j of spectrum b reads frag index
    src[b, j] = starts[b, w] + (j - cum[b, w-1]) for its window w).
    Best when windows are short; the per-element gather is descriptor-
    bound at long windows — use _entries_rows there."""
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


def _open_count_core(
    frag_pep8,     # i32 [N_frag_pad / V_ROW, V_ROW] (HBM)
    starts,        # i32 [B, Z*nbcov*Pk] window range starts (z, band, pk)
    lens,          # i32 [B, Z*nbcov*Pk] window range lengths
    row_spec,      # i32 [R] spectrum index per query row
    row_i0,        # i32 [R] precursor candidate range
    row_i1,        # i32 [R]
    row_maxz,      # i32 [R] exclusive fragment-charge bound
    *, F, Wc, Pk, Z, K, R, chunked, nbcov=1, psort=False,
):
    """Traceable core of the peak-major preliminary count. Returns
    (vals [R, K], cand [R, K], matched_total [R], scored [R]).

    With nbcov > 1 the combine is BAND-MAJOR: each (spectrum, covered
    band) pair becomes its own pseudo-row, so the per-entry sort runs on
    the short per-band axis F (one-shot in VMEM at proteome scale)
    instead of one long per-spectrum axis. This is exact, not an
    approximation, because bands PARTITION peptide ids: every entry of a
    peptide lives in exactly one band, so per-band run-length counts ARE
    the global counts, per-band top-K contains every global top-K
    candidate, and matched/scored totals sum across bands. The global
    top-K is recovered with a (count desc, peptide desc) two-key sort
    over the nbcov*K per-band winners — the exact PreScore tie rule
    (/root/reference/crates/sage/src/scoring.rs:43-49)."""
    B = starts.shape[0]
    if nbcov > 1:
        BN = B * nbcov
        st = starts.reshape(B, Z, nbcov, Pk).transpose(0, 2, 1, 3)
        st = st.reshape(BN, Z * Pk)
        ln = lens.reshape(B, Z, nbcov, Pk).transpose(0, 2, 1, 3)
        ln = ln.reshape(BN, Z * Pk)
    else:
        BN, st, ln = B, starts, lens
    if chunked:
        neg, z_of = _entries_rows(frag_pep8, st, ln, Wc, Pk, Z)
    else:
        neg, z_of = _entries_flat(frag_pep8, st, ln, F, Pk, Z)
    # ---- sort per spectrum by peptide DESCENDING; padding/slop sorts to
    # the tail, so the axis can be cut back to F (> any true entry count)
    if psort:
        from .pallas_sort import MAX_F as _PSORT_MAX_F

        # the kernel sorts the PRE-CUT entry axis: in chunked mode that
        # is Wc*V_ROW (> F), so the VMEM budget must gate on it
        if (Wc * V_ROW if chunked else F) > _PSORT_MAX_F:
            psort = False
    if psort:
        # in-VMEM bitonic kernel (pallas_sort.py): one i32 key per
        # entry, z tag bit-packed into the low 5 bits. Entry order
        # within one peptide run differs from lax.sort's, which cannot
        # change any count (runs are delimited by peptide boundaries and
        # z-masking is per-element).
        from .pallas_sort import bitonic_sort_rows

        SENT = np.int32(2**31 - 1)
        PMAX = np.int32(1 << 25)  # callers gate n_pep < 2^25
        pep_e = jnp.where(neg < 2**30, -neg, np.int32(-1))
        valid_e = pep_e >= 0
        if z_of is None:
            key = jnp.where(valid_e, PMAX - pep_e, SENT)
        else:
            key = jnp.where(
                valid_e, ((PMAX - pep_e) << 5) | z_of, SENT
            )
        key_s = bitonic_sort_rows(key)[:, :F]
        valid_s = key_s != SENT
        if z_of is None:
            pep_sorted = jnp.where(valid_s, PMAX - key_s, np.int32(-1))
            z_sorted = None
        else:
            pep_sorted = jnp.where(
                valid_s, PMAX - (key_s >> 5), np.int32(-1)
            )
            z_sorted = jnp.where(valid_s, key_s & 31, 0)
    elif z_of is None:
        # single fragment-charge plane: every entry's z tag is 1 and the
        # per-row bound is always >= 2, so the tag (and its extra sort
        # operand) is dead — sort the peptide key alone.
        (neg_sorted,) = jax.lax.sort((neg,), dimension=1, num_keys=1)
        neg_sorted = neg_sorted[:, :F]
        z_sorted = None
        pep_sorted = jnp.where(
            neg_sorted < 2**30, -neg_sorted, np.int32(-1)
        )
    else:
        neg_sorted, z_sorted = jax.lax.sort(
            (neg, z_of), dimension=1, num_keys=1
        )
        neg_sorted = neg_sorted[:, :F]
        z_sorted = z_sorted[:, :F]
        pep_sorted = jnp.where(
            neg_sorted < 2**30, -neg_sorted, np.int32(-1)
        )

    run_start = jnp.concatenate(
        [
            jnp.ones((BN, 1), dtype=bool),
            pep_sorted[:, 1:] != pep_sorted[:, :-1],
        ],
        axis=1,
    )
    run_end = jnp.concatenate(
        [pep_sorted[:, 1:] != pep_sorted[:, :-1], jnp.ones((BN, 1), bool)],
        axis=1,
    )

    # ---- per query row: mask by precursor range + charge bound, count
    Fax = int(pep_sorted.shape[1])
    _BLK = 2048

    def _topk_counts(cnt):
        """Exact top-K of (count desc, index asc). Small axes use
        lax.top_k directly; long axes use a pairing TOURNAMENT (see
        _topk_tournament) — measured ~10x cheaper than blocked top_k at
        proteome-scale entry axes, bit-identical output."""
        if Fax <= 4 * _BLK:
            return jax.lax.top_k(cnt, K)
        return _topk_tournament(cnt, K)

    def _topk_tournament(cnt, K):
        """Exact top-K of (count desc, index asc) by pair-and-halve:
        64-blocks are sorted to that order; each round takes the
        elementwise winner of one block vs its REVERSED sibling — for
        two sorted sequences this keeps exactly the top-64 of the pair
        (the first half of their bitonic merge) — and re-sorts the
        survivors. Data halves every round, so total work is ~2 sorts
        of 64-wide blocks over the input, vs a full top_k (which XLA
        lowers to a whole-axis sort). Ties: the index key makes every
        element distinct, and (count desc, index asc) is exactly
        lax.top_k's tie rule, so the result is bit-identical.

        Keys are (count << b) | (Fax-1-pos) packed into one i32 when
        the static count bound fits (counts are bounded by the entry
        axis itself), else a 2-operand lexicographic sort."""
        b = max(Fax - 1, 1).bit_length()
        # sound static bound: a run's masked count can never exceed the
        # entry axis length (strict: cnt == Fax must still fit)
        packed = b <= 15 and Fax < (1 << (31 - b))
        nb = Fax // 64  # Fax is always a multiple of 128
        pos_rev = jnp.arange(Fax - 1, -1, -1, dtype=jnp.int32)
        if packed:
            key = (cnt << b) | pos_rev
            kb = jax.lax.sort(
                -key.reshape(nb, 64), dimension=1, num_keys=1
            )
            while nb % 2 == 0 and nb > 1:
                nb //= 2
                a = kb[0::2]
                c = jnp.minimum(a, kb[1::2, ::-1])  # -key: min = winner
                kb = jax.lax.sort(c, dimension=1, num_keys=1)
            key_f = -kb.reshape(-1)
            topk, _ = jax.lax.top_k(key_f, K)
            vals = topk >> b
            idx = (Fax - 1) - (topk & ((1 << b) - 1))
            return vals, jnp.where(vals > 0, idx, 0)
        nc = (-cnt).reshape(nb, 64)
        ps = (Fax - 1 - pos_rev).reshape(nb, 64)
        nc, ps = jax.lax.sort((nc, ps), dimension=1, num_keys=2)
        while nb % 2 == 0 and nb > 1:
            nb //= 2
            a_c, a_p = nc[0::2], ps[0::2]
            b_c, b_p = nc[1::2, ::-1], ps[1::2, ::-1]
            take_a = (a_c < b_c) | ((a_c == b_c) & (a_p < b_p))
            nc = jnp.where(take_a, a_c, b_c)
            ps = jnp.where(take_a, a_p, b_p)
            nc, ps = jax.lax.sort((nc, ps), dimension=1, num_keys=2)
        ncf, psf = jax.lax.sort(
            (nc.reshape(-1), ps.reshape(-1)), dimension=0, num_keys=2
        )
        vals = -ncf[:K]
        return vals, jnp.where(vals > 0, psf[:K], 0)

    if z_sorted is None:
        # ONE fragment-charge plane (the reference's open benchmark
        # regime, max_fragment_charge=1): every run's count is its full
        # LENGTH, independent of the query row — the precursor range
        # [i0, i1) keeps or drops whole runs (all entries of a run share
        # one peptide). Run lengths are computed ONCE per pseudo-row;
        # each query row is just a range mask + reduce + top-K, with no
        # per-row scans (the cumsum+cummax pair was ~2x the whole count
        # phase at proteome scale).
        pos = jnp.arange(Fax, dtype=jnp.int32)[None, :]
        base_pos = jax.lax.cummax(
            jnp.where(run_start, pos, 0), axis=1
        )
        rl_end = jnp.where(
            run_end & (pep_sorted >= 0), pos - base_pos + 1, 0
        )  # [BN, Fax] run length at run ends, 0 elsewhere

        def per_row(spec, i0, i1, maxz):
            p = pep_sorted[spec]
            cnt = jnp.where((p >= i0) & (p < i1), rl_end[spec], 0)
            matched_total = jnp.sum(cnt)
            scored = jnp.sum((cnt > 0).astype(jnp.int32))
            vals, idx = _topk_counts(cnt)
            cand = jnp.where(vals > 0, p[idx], np.int32(0))
            return vals, cand, matched_total, scored
    else:
        def per_row(spec, i0, i1, maxz):
            p = pep_sorted[spec]
            ok = (p >= i0) & (p < i1)
            ok &= z_sorted[spec] < maxz
            cs = jnp.cumsum(ok.astype(jnp.int32))
            cs0 = jnp.concatenate([jnp.zeros(1, jnp.int32), cs[:-1]])
            # masked count at each run's start, propagated to the run
            # end: cs0 is non-decreasing, so a plain cummax over
            # (run_start ? cs0 : 0) carries the latest run-start value
            # forward — no random per-element gather (which costs ~10x
            # the cummax here)
            base = jax.lax.cummax(jnp.where(run_start[spec], cs0, 0))
            cnt = jnp.where(run_end[spec] & (p >= 0), cs - base, 0)
            matched_total = jnp.sum(ok & (p >= 0))
            scored = jnp.sum((cnt > 0).astype(jnp.int32))
            vals, idx = _topk_counts(cnt)
            cand = jnp.where(vals > 0, p[idx], np.int32(0))
            return vals, cand, matched_total, scored

    if nbcov == 1:
        return jax.vmap(per_row)(row_spec, row_i0, row_i1, row_maxz)

    # band-major: count per (query row, covered band slot), then merge
    # the per-band winners. Padding rows (row_spec = sentinel >= B)
    # index past BN; the gather clamps to the last pseudo-row and the
    # zero [i0, i1) range masks every count to 0, exactly like the
    # nbcov == 1 sentinel behavior.
    slots = jnp.arange(nbcov, dtype=row_spec.dtype)
    rb_spec = (row_spec[:, None] * nbcov + slots[None, :]).reshape(-1)
    vals, cand, mtot, scored = jax.vmap(per_row)(
        rb_spec,
        jnp.repeat(row_i0, nbcov),
        jnp.repeat(row_i1, nbcov),
        jnp.repeat(row_maxz, nbcov),
    )
    vals = vals.reshape(R, nbcov * K)
    cand = cand.reshape(R, nbcov * K)
    # exact global top-K: (count desc, peptide desc) over the union of
    # per-band top-Ks — every global winner survives its band's top-K
    # (fewer than K candidates beat it anywhere, so fewer in-band)
    sv, sp = jax.lax.sort((-vals, -cand), dimension=1, num_keys=2)
    vals_m = -sv[:, :K]
    cand_m = jnp.where(vals_m > 0, -sp[:, :K], np.int32(0))
    return (
        vals_m, cand_m,
        mtot.reshape(R, nbcov).sum(axis=1),
        scored.reshape(R, nbcov).sum(axis=1),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "F", "Wc", "Pk", "Z", "K", "R", "chunked", "nbcov", "psort"
    ),
)
def _device_open_count(
    frag_pep8, starts, lens, row_spec, row_i0, row_i1, row_maxz,
    *, F, Wc, Pk, Z, K, R, chunked, nbcov=1, psort=False,
):
    vals, cand, mtot, scored = _open_count_core(
        frag_pep8, starts, lens, row_spec, row_i0, row_i1, row_maxz,
        F=F, Wc=Wc, Pk=Pk, Z=Z, K=K, R=R, chunked=chunked,
        nbcov=nbcov, psort=psort,
    )
    return jnp.concatenate(
        [vals, cand, mtot[:, None], scored[:, None]], axis=1
    )


class OpenSearcher:
    """Peak-major preliminary counts against the flat sorted fragment
    index. Constructed per Scorer; stateless between batches apart from
    the device-resident peptide-id array."""

    def _auto_bands(self, db, precursor_tol) -> int:
        """Band count for the (band, m/z)-sorted layout. The fragment
        array is re-sorted by (peptide-mass band, m/z) so a precursor
        window — a contiguous peptide-index range — covers only
        ~frac*NB + 2 bands, and the gather/sort/count phases touch ~frac
        of the entries a single m/z-sorted array would (a -500/+100 Da
        window on a tryptic human proteome spans ~13% of peptides -> ~4x
        less work at NB=32). Counting masks by exact [i0, i1) per row
        either way, so banding never changes results.

        The cost is that each (peak, band) window is ~bands_covered x
        shorter, and short windows pay per-window slack (gather row
        alignment, marks bookkeeping, the host range searches) — at
        ~20M fragments banding measurably LOSES to one flat array. Pick
        the largest pow2 NB that keeps the expected banded window length
        >= 128 entries; 1 means unbanded."""
        mono = db.table.mono
        span = float(mono[-1] - mono[0]) if len(db) > 1 else 1.0
        if precursor_tol is not None and span > 0:
            mid = float(mono[len(db) // 2])
            lo, hi = precursor_tol.bounds(np.float32(mid))
            frac = min(max((float(hi) - float(lo)) / span, 0.01), 1.0)
        else:
            frac = 1.0
        t = self.frag_tol
        if t.kind == "ppm":
            wfrac = (float(t.hi) - float(t.lo)) * 1e-6
        else:  # Da/pct: window width as a fraction of a ~1000 m/z range
            lo, hi = t.bounds(np.float32(1000.0))
            wfrac = (float(hi) - float(lo)) / 1000.0
        est_len = db.num_fragments * wfrac
        # measured optimum (-500/+100 Da, 10 ppm, 19M frags, two-stage
        # top-K count): NB=16 at 11.3k sp/s device-only vs 6.9k at NB=4
        # and 4.9k at NB=64 — i.e. banded window length ~24, NB ~=
        # est_len / 32 rounded up to a power of two
        target = max(est_len / 32.0, 1.0)
        nb = 1
        while nb < 64 and nb < target:
            nb *= 2
        # banding only pays when it actually skips entries: at
        # frac + 2/NB near 1 the per-window slack outweighs the skip
        if frac + 2.0 / nb >= 0.7:
            nb = 1
        return nb

    def __init__(self, db, frag_tol, Z: int, K: int = 50,
                 precursor_tol=None):
        assert db.fragment_mz_flat is not None
        self.frag_tol = frag_tol
        n = db.fragment_pep_flat.shape[0]
        n_pep = len(db)
        self.n_pep = n_pep
        env = os.environ.get("SAGE_TPU_OPEN_BANDS")
        nb = int(env) if env else self._auto_bands(db, precursor_tol)
        nb = max(min(nb, max(n_pep, 1)), 1)
        self.n_bands = nb
        self.band_w = max(-(-n_pep // nb), 1)
        pep_flat = db.fragment_pep_flat.astype(np.int32)
        if nb > 1:
            band = pep_flat // np.int32(self.band_w)
            # stable sort by band keeps the m/z order within each band
            order = np.argsort(band, kind="stable")
            self.frag_mz = db.fragment_mz_flat[order]
            pep_b = pep_flat[order]
            counts = np.bincount(band, minlength=nb)
            self.band_off = np.concatenate(
                [[0], np.cumsum(counts)]
            ).astype(np.int64)
        else:
            self.frag_mz = db.fragment_mz_flat
            pep_b = pep_flat
            self.band_off = np.array([0, n], np.int64)
        n_pad = max(((n + V_ROW - 1) // V_ROW) * V_ROW, 2 * V_ROW)
        pep_pad = np.full(n_pad, -1, np.int32)
        pep_pad[:n] = pep_b
        # [N/V, V] view for the aligned wide-row gather
        self.frag_pep8_dev = jnp.asarray(pep_pad.reshape(-1, V_ROW))
        self.Z = Z
        self.K = K
        self._dev_rng = None  # lazy device-ranges tables
        self._sticky_shapes = None  # learned static shapes (see below)

    def _qoct_F(self, v: int) -> int:
        F = _quarter_octave(int(v) + 64)
        return ((max(F, self.K, 128) + 127) // 128) * 128

    def note_shapes(self, chunked: bool, Wc: int, max_total: int,
                    slot_sizes=None, slot_ests=None, slot_valid=None,
                    slot_rows=None):
        """Record quarter-octave STICKY static shapes from a host-
        planned batch, enabling the device-planned fast path (no host
        searchsorted, no ranges upload) for every later batch. A 1.25x
        margin over the observed maxima absorbs batch-to-batch
        variation; violations are detected on device and grown.

        With the slot matrices (per-(spectrum, covered band) true entry
        totals / gather-row totals from the teaching batch's geometry,
        plus the density-histogram estimates), up to 3 SLOT SIZE
        CLASSES are recorded instead of one batch-wide shape: slot
        entry totals vary ~10x both across spectra and across one
        spectrum's bands, so padding every slot to the batch max wastes
        most of the sort/count work (measured pad_ratio ~5). Later
        batches dispatch each (spectrum, band) slot as its own
        pseudo-row in the class fitting alpha*est (alpha calibrated
        here, grown on violation); per-class shape violations are
        detected on device and grown per class."""
        Wc_s = _quarter_octave(max(int(Wc * 1.25), 8))
        F_top = self._qoct_F(int(max_total * 1.25))
        classes = [{"Wc": Wc_s, "F": F_top}]
        alpha = None
        if slot_sizes is not None and slot_valid is not None:
            sv = slot_sizes[slot_valid].astype(np.float64)
            ev = (
                slot_ests[slot_valid].astype(np.float64)
                if slot_ests is not None else None
            )
            rv = (
                slot_rows[slot_valid].astype(np.float64)
                if slot_rows is not None else None
            )
            if sv.size >= 64 and ev is not None and np.all(ev > 0):
                F_max = self._qoct_F(int(sv.max(initial=0) * 1.25))
                s50 = self._qoct_F(int(np.percentile(sv, 50) * 1.25))
                s85 = self._qoct_F(int(np.percentile(sv, 85) * 1.25))
                cl = []
                for F_c in (s50, s85, F_max):
                    if cl and F_c <= cl[-1]["F"]:
                        continue
                    if rv is not None and rv.size:
                        in_c = sv * 1.25 <= F_c
                        wc_c = _quarter_octave(max(
                            int(rv[in_c].max(initial=8) * 1.25), 8
                        ))
                    else:
                        wc_c = Wc_s
                    cl.append({"Wc": min(wc_c, Wc_s), "F": F_c})
                if len(cl) > 1:
                    classes = cl
                    # alpha maps est -> slot size with a high quantile
                    # so most mispredictions err UPWARD (a too-big
                    # class wastes a little padding; a too-small one
                    # costs a device-detected redo)
                    alpha = float(np.percentile(sv / ev, 95))
        self._sticky_shapes = {
            "chunked": bool(chunked),
            "classes": classes,
            "alpha": alpha,
            # back-compat single-shape view (top class)
            "Wc": classes[-1]["Wc"],
            "F": classes[-1]["F"],
        }

    def grow_shapes(self, tot_e: int, tot_r: int, ci: int = -1):
        """Grow class ``ci``'s sticky shapes after a device-detected
        violation, and bump alpha so borderline spectra move up a
        class. Growth never shrinks any class."""
        st = self._sticky_shapes
        if st is None:  # pragma: no cover - defensive
            return
        cl = st["classes"][ci]
        cl["F"] = max(self._qoct_F(int(tot_e * 1.25)), cl["F"])
        cl["Wc"] = max(
            _quarter_octave(max(int(tot_r * 1.25), 8)), cl["Wc"]
        )
        if st.get("alpha"):
            st["alpha"] *= 1.15
        st["Wc"] = max(st["Wc"], st["classes"][-1]["Wc"])
        st["F"] = max(st["F"], st["classes"][-1]["F"])

    _est_hist = None

    def est_sizes(self, masses: np.ndarray, u0, u1) -> np.ndarray:
        """Cheap host proxy for each spectrum's per-(spectrum, densest
        band) entry maximum — the unit the size classes pad to: a
        PER-BAND 1-Da fragment-density histogram times the tolerance
        width, summed over real peaks per covered band, maxed over the
        spectrum's covered bands. (A whole-spectrum estimate ranks
        poorly: which band is densest varies per spectrum, and the
        p95-calibrated alpha then over-predicts the typical spectrum
        ~5x, collapsing every class into the top one.) Used ONLY for
        size-class membership — exact per-class capacity is enforced on
        device (_range_stats) with a grow-and-redo fallback, so a bad
        estimate costs time, never correctness."""
        est_band, valid = self.est_band_sizes(masses, u0, u1)
        est = np.where(valid, est_band, 0.0).max(axis=1)
        return np.maximum(est, 1.0)

    def est_band_sizes(self, masses: np.ndarray, u0, u1):
        """Per-(spectrum, covered band slot) entry-total estimate
        ([B, nbcov] f64) plus the live-slot mask, from the per-band
        density histogram. Slot layout matches covered_bands /
        _geometry's tot_sb columns."""
        nb = self.n_bands
        if self._est_hist is None:
            mz = self.frag_mz
            hi = int(min(float(mz[-1] if mz.size else 1.0), 39000.0)) + 2
            H2 = np.zeros((nb, hi + 1), np.float32)
            off = self.band_off
            for b in range(nb):
                seg = self.frag_mz[off[b]: off[b + 1]]
                if seg.size:
                    H2[b] = np.bincount(
                        np.clip(seg.astype(np.int64), 0, hi),
                        minlength=hi + 1,
                    )
            self._est_hist = H2
        H2 = self._est_hist
        B, Pk = masses.shape
        m = np.where(np.isfinite(masses), masses, 0.0)
        idx = np.clip(m.astype(np.int64), 0, H2.shape[1] - 1)
        t = self.frag_tol
        if t.kind == "ppm":
            width = m * np.float64((float(t.hi) - float(t.lo)) * 1e-6)
        else:
            width = np.full((B, Pk), float(t.hi) - float(t.lo))
        b0, b1, nbcov = covered_bands(u0, u1, self.band_w, nb, B)
        bands = np.clip(
            b0[:, None] + np.arange(nbcov)[None, :], 0, nb - 1
        )  # [B, nbcov]
        valid = (b0[:, None] + np.arange(nbcov)[None, :]) <= b1[:, None]
        dens = H2[bands[:, :, None], idx[:, None, :]]  # [B, nbcov, Pk]
        est_band = (
            (dens * np.maximum(width, 0.0)[:, None, :]).sum(axis=2)
        ).astype(np.float64)
        return np.maximum(est_band, 1.0), valid

    def assign_classes(self, ests: np.ndarray):
        """Class index per slot (any array shape) under the sticky
        classes: smallest class whose F covers alpha*est. Returns None
        when the sticky state has a single class (or no calibration)."""
        st = self._sticky_shapes
        if not st or len(st.get("classes", ())) <= 1 or not st.get("alpha"):
            return None
        # 1.25x assignment margin on top of the p95-calibrated alpha:
        # ratio outliers above p95 land one class up instead of
        # overflowing their class (a device-detected overflow costs a
        # grow + full-batch redo; one class of extra padding is cheap)
        pred = st["alpha"] * ests * 1.25
        ci = np.zeros(ests.shape, np.int64)
        for c, cl in enumerate(st["classes"][:-1]):
            ci[pred > cl["F"]] = c + 1
        return ci

    def _dev_ranges_tables(self):
        """Device tables for the decimated-rank range probe: a band-
        aligned 64-lane copy of the sorted masses, the per-band
        decimation (every 64th value), and per-band row offsets/lengths.
        Built once (~N*4 bytes of HBM, plus N/64 for the decimation)."""
        if self._dev_rng is not None:
            return self._dev_rng
        nb = self.n_bands
        off = self.band_off
        lens_b = np.diff(off)
        rows_b = -(-lens_b // 64)
        row_off = np.concatenate([[0], np.cumsum(rows_b)]).astype(np.int64)
        R64 = int(row_off[-1]) + 1  # +1 all-inf guard row
        mz64 = np.full((R64, 64), np.inf, np.float32)
        dec_n = max(int(rows_b.max(initial=1)), 1)
        dec = np.full((nb, dec_n), np.inf, np.float32)
        for b in range(nb):
            seg = self.frag_mz[off[b] : off[b + 1]]
            r0, r1 = row_off[b], row_off[b + 1]
            flat = mz64[r0:r1].reshape(-1)
            flat[: seg.size] = seg
            mz64[r0:r1] = flat.reshape(-1, 64)
            dec[b, : rows_b[b]] = mz64[r0:r1, 63]
        bfirst = np.full(nb, np.inf, np.float32)
        blast = np.full(nb, -np.inf, np.float32)
        ne = lens_b > 0
        bfirst[ne] = self.frag_mz[off[:-1][ne]]
        blast[ne] = self.frag_mz[off[1:][ne] - 1]
        self._dev_rng = (
            jnp.asarray(mz64),
            jnp.asarray(dec),
            jnp.asarray(row_off[:-1].astype(np.int32)),
            jnp.asarray(lens_b.astype(np.int32)),
            jnp.asarray(off[:-1].astype(np.int32)),
            jnp.asarray(bfirst),
            jnp.asarray(blast),
        )
        return self._dev_rng

    def ranges_device(self, peaks_dev, u0, u1, Zb: int):
        """Device-computed (starts, lens) — bit-identical to ranges()
        (property-tested) with NO host searchsorted and NO [B, Zb*Pk*
        nbcov] upload (~2.6 MiB/batch at 16 bands, ~100 ms of tunnel
        latency per transfer on high-latency links). Each bound's rank
        in its band segment comes from a dense compare against the
        band's 64x-decimated masses (the coarse row) plus ONE aligned
        64-lane row gather (the exact refinement) — data-independent
        and exact, duplicates included. Returns device arrays laid out
        exactly like ranges(), plus nbcov."""
        B = int(peaks_dev.shape[1])
        nb = self.n_bands
        b0, b1, nbcov = covered_bands(u0, u1, self.band_w, nb, B)
        bands = b0[:, None] + np.arange(nbcov)[None, :]
        valid = bands <= b1[:, None]
        bands_c = np.clip(bands, 0, nb - 1).astype(np.int32)
        tabs = self._dev_ranges_tables()
        t = self.frag_tol
        st, ln = _device_ranges(
            *tabs, peaks_dev, jnp.asarray(bands_c), jnp.asarray(valid),
            Zb=Zb, nbcov=nbcov,
            tol=(t.kind, float(t.lo), float(t.hi)),
        )
        return st, ln, nbcov

    def ranges_device_slots(
        self, peaks_dev, slot_spec, slot_band, slot_valid, Zb: int
    ):
        """Slot-major device ranges for an explicit live-slot list —
        see _device_ranges_flat. slot_spec/slot_band/slot_valid may be
        host arrays; padded rows pass slot_valid False and come back
        all-zero."""
        tabs = self._dev_ranges_tables()
        t = self.frag_tol
        return _device_ranges_flat(
            *tabs, peaks_dev,
            jnp.asarray(np.asarray(slot_spec, np.int32)),
            jnp.asarray(np.asarray(slot_band, np.int32)),
            jnp.asarray(np.asarray(slot_valid, bool)),
            Zb=Zb, tol=(t.kind, float(t.lo), float(t.hi)),
        )

    def ranges(
        self, masses: np.ndarray, Zb: int,
        u0: np.ndarray = None, u1: np.ndarray = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host: [B, Zb*Pk*NBcov] range starts/lengths for every
        (z, peak, covered-band) window over the band-segmented sorted
        fragment m/z array. ``u0``/``u1`` are each spectrum's union
        [u0, u1) of precursor peptide-index windows (None = whole table);
        only bands intersecting it are searched/emitted. +inf-padded
        peaks give NaN/inf bounds -> empty ranges."""
        B, Pk = masses.shape
        nb = self.n_bands
        b0, b1, nbcov = covered_bands(u0, u1, self.band_w, nb, B)
        starts = np.zeros((B, Zb * Pk * nbcov), np.int32)
        lens = np.zeros((B, Zb * Pk * nbcov), np.int32)
        off = self.band_off
        for zi in range(Zb):
            q = (masses * F32(zi + 1)).astype(np.float32)
            with np.errstate(invalid="ignore"):
                # +inf padding peaks produce inf*ppm = NaN bounds; they
                # are zeroed below
                lo, hi = self.frag_tol.bounds(q)
            bad = ~np.isfinite(lo) | ~np.isfinite(hi)
            for b in range(nb):
                sel = np.flatnonzero((b0 <= b) & (b <= b1))
                if sel.size == 0:
                    continue
                seg = self.frag_mz[off[b] : off[b + 1]]
                if seg.size == 0:
                    continue
                # only windows overlapping the band's m/z span need a
                # binary search (a fragment is lighter than its peptide,
                # so low-mass bands are empty for high-m/z peaks — most
                # (peak, band) windows die on this compare)
                glo = lo[sel]
                ghi = hi[sel]
                hit = (
                    ~bad[sel] & (ghi >= seg[0]) & (glo <= seg[-1])
                )  # [|sel|, Pk]
                s = np.zeros(glo.shape, np.int64)
                e = np.zeros(glo.shape, np.int64)
                if hit.any():
                    s[hit] = np.searchsorted(seg, glo[hit], side="left")
                    e[hit] = np.searchsorted(seg, ghi[hit], side="right")
                    s[hit] += off[b]
                    e[hit] += off[b]
                # window column: z-major, then band slot, then peak
                j = (b - b0[sel]).astype(np.int64)
                col = (zi * nbcov + j[:, None]) * Pk + np.arange(Pk)
                starts[sel[:, None], col] = s.astype(np.int32)
                lens[sel[:, None], col] = np.maximum(e - s, 0).astype(
                    np.int32
                )
        return starts, lens

    # device-memory budget for the [B, F] entry matrices; batches whose
    # (spectra x max-entries) footprint exceeds it are split (deep open
    # searches on large proteomes can reach 10^5 entries per spectrum).
    # 128M i32 elements = 512 MB per buffer — comfortable on a 16 GB
    # chip, and measured faster than splitting (one dispatch's fixed
    # costs beat two half-size dispatches at these shapes)
    MAX_ELEMENTS = 128 << 20

    def _geometry(self, masses, rows, Zb, _ranges):
        """Shared host planning for the open-search device programs:
        band-aware window ranges, gather layout, and the static padded
        shapes (see preliminary_packed's docstrings for the policies).
        All shape units are PER (spectrum, covered band) — the count
        core combines band-major. Returns
        (starts, lens, Pk, chunked, size, Wc, F, nbcov)."""
        B, Pk = masses.shape
        if _ranges is None:
            # per-spectrum union of precursor windows -> covered bands
            u0, u1 = spectrum_window_union(rows, B)
            starts, lens = self.ranges(masses, Zb, u0, u1)
        else:
            starts, lens = _ranges
        nbcov = starts.shape[1] // max(Zb * Pk, 1)
        # entry layout: aligned wide-row gather when windows are long
        # (the per-window <=2-row alignment padding is cheaper than
        # per-element gather descriptors), ragged flat gather otherwise
        n_win = max(int((lens > 0).sum()), 1)
        env_ch = os.environ.get("SAGE_TPU_OPEN_CHUNKED")
        if env_ch is not None:
            chunked = env_ch != "0"
        else:
            chunked = float(lens.sum()) / n_win >= 48.0
        ends = starts + lens
        rows_w = np.where(
            lens > 0, (ends + (V_ROW - 1)) // V_ROW - starts // V_ROW, 0
        )
        # per-(spectrum, band) totals: window axis layout (z, band, pk)
        tc_sb = rows_w.reshape(B, Zb, nbcov, Pk).sum(axis=(1, 3))
        tot_sb = lens.reshape(B, Zb, nbcov, Pk).sum(axis=(1, 3))
        # per-spectrum densest band (drives F; the split peels on it)
        size = (tc_sb * V_ROW if chunked else tot_sb).max(axis=1)
        # Wr row slots cover the densest (spectrum, band); quarter-
        # octave padding (like F below) bounds recompiles while keeping
        # the sort axis (proportional to Wr) within 12% of minimal
        Wc = _quarter_octave(max(int(tc_sb.max()), 8)) if chunked else 8
        # F strictly greater than any (spectrum, band)'s true entry
        # count (the row-layout sort axis Wr*V is cut down to F before
        # counting; the flat layout uses F as the entry axis directly);
        # at least K so the per-row top_k never exceeds the axis.
        # Quarter-octave padding: F is a static shape, and exact padding
        # would compile a fresh executable per batch (seconds each on
        # tunneled links) for <= 12% extra count-phase work saved.
        F = _quarter_octave(int(max(tot_sb.max(), 1)) + 1)
        F = ((max(F, self.K, 128) + 127) // 128) * 128
        if chunked:
            F = min(F, Wc * V_ROW)
        return starts, lens, Pk, chunked, size, Wc, F, nbcov

    def _find_split(self, B, size, nbcov=1):
        """Sub-batch split mask, or None: halve over the element budget;
        otherwise peel the light size class off a heavily skewed batch
        (the sort axis pads every spectrum to the densest one — a p75
        class a factor under the max saves ~25-50% of sort+count work
        for one extra dispatch)."""
        if B <= 1:
            return None
        F_est = int(size.max()) + 1
        if B * nbcov * F_est > self.MAX_ELEMENTS:
            return np.arange(B) < B // 2
        if B >= 128 and os.environ.get("SAGE_TPU_OPEN_SPLIT") != "0":
            p75 = _quarter_octave(max(int(np.percentile(size, 75)), 1))
            if _quarter_octave(F_est) > 2 * p75:
                split = size <= p75
                if 0 < split.sum() < B:
                    return split
        return None

    @staticmethod
    def _sub_batches(split, rows, maxz, extra=()):
        """Iterate the two sides of a split: yields (spec_ids, rsel,
        sub_rows, mz_sub, R_sub, extras_subset) with spectrum indices
        remapped order-preservingly."""
        si = rows["si"]
        n_rows = si.size
        maxz_rows = maxz[:n_rows]
        B = split.shape[0]
        for sel in (split, ~split):
            spec_ids = np.flatnonzero(sel)
            remap = np.full(B, -1, np.int64)
            remap[spec_ids] = np.arange(spec_ids.size)
            rsel = sel[si]
            sub_rows = {
                k: (
                    remap[v[rsel]].astype(v.dtype) if k == "si" else v[rsel]
                )
                for k, v in rows.items()
            }
            n_sub = int(rsel.sum())
            # pow2 padding: exact 8-multiples would compile a new
            # executable per distinct sub-batch row count
            R_sub = 8
            while R_sub < n_sub:
                R_sub *= 2
            mz_sub = np.full(R_sub, 2, np.int32)
            mz_sub[:n_sub] = maxz_rows[rsel]
            yield spec_ids, rsel, sub_rows, mz_sub, R_sub, n_sub

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
        starts, lens, Pk_eff, chunked, size, Wc, F, nbcov = self._geometry(
            masses, rows, Zb, _ranges
        )
        split = self._find_split(B, size, nbcov)
        if split is not None:
            out = np.zeros((R, 2 * self.K + 2), np.int32)
            for spec_ids, rsel, sub_rows, mz_sub, R_sub, n_sub in (
                self._sub_batches(split, rows, maxz)
            ):
                sub = np.asarray(
                    jax.device_get(
                        self.preliminary_packed(
                            masses[spec_ids], sub_rows, mz_sub, R_sub, Zb,
                            _ranges=(starts[spec_ids], lens[spec_ids]),
                        )
                    )
                )
                out[np.flatnonzero(rsel)] = sub[:n_sub]
            return out
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
            F=F, Wc=Wc, Pk=Pk_eff, Z=Zb, K=self.K, R=R,
            chunked=chunked, nbcov=nbcov,
            psort=use_pallas_sort(F, self.n_pep),
        )
        out.copy_to_host_async()
        return out  # device handle; caller device_gets at finalize time
