"""The search engine: batched spectrum scoring on TPU.

TPU-first redesign of the reference's two-pass scorer
(/root/reference/crates/sage/src/scoring.rs:249-767):

* The reference walks a bucketed fragment-mass index peak-by-peak with
  binary searches and scatter-increments (scoring.rs:335-382,
  database.rs:480-536). That access pattern is hostile to a vector
  machine, so stage 1 here is *candidate-major*: the precursor window is
  a contiguous slice of the mass-sorted peptide table, each candidate's
  ion ladder is regenerated on the fly with a sequential-f32 scan
  (bit-identical to the index entries), and matches are counted with a
  rank-difference trick — ``count = #(lo_q <= f) - #(hi_q < f)`` over the
  per-charge query-window bounds — which needs only broadcast compares +
  reductions (pure VPU work, no gathers/scatters, fixed shapes).
  The result is exactly the number of (peak x charge x index-fragment)
  pairs the reference counts, because window membership is evaluated with
  the same f32 arithmetic on both sides.

* Stage 2 re-scores the top-K candidates with full ladders: for every
  (fragment, charge) it picks the most intense in-window peak (ties to
  the later index, spectrum.rs:134-159) as a dense masked argmax over
  the padded peak array.

Stage shapes are static per (window-size, peak-count) bucket; compiled
executables are cached. Integer/structural outputs return to the host,
where exact f32/f64 feature math lives (sage_tpu.ops.features).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..chem.mass import NEUTRON, PROTON, Tolerance
from ..index.builder import IndexedDatabase, next_power_of_two
from ..native import seq_f32_sum_rows
from ..spectrum.processor import ProcessedSpectrum
from .features import (
    SAGE_HYPERSCORE,
    Feature,
    FeatureTable,
    Fragments,
    hyperscore_vec,
    log10_poisson_vec,
)

log = logging.getLogger("sage_tpu")

F32 = np.float32

# Cumulative wall time spent blocked on device->host fetches (the axon
# tunnel tax). bench.py reads/reset this to split device+transfer time
# from host compute in its report.
_FETCH_WAIT = [0.0]


def _dget(x):
    import time as _time

    t0 = _time.perf_counter()
    out = jax.device_get(x)
    _FETCH_WAIT[0] += _time.perf_counter() - t0
    return out


def reset_fetch_wait() -> None:
    _FETCH_WAIT[0] = 0.0


def get_fetch_wait() -> float:
    return _FETCH_WAIT[0]

# Ion-series seeds, computed in f32 exactly as ion_series.rs:37-53.
_C = F32(12.0)
_O = F32(15.994914)
_H = F32(1.007825)
_PRO = F32(1.0072764)
_N = F32(14.003074)
_NH3 = F32(F32(_N + F32(_H * F32(2.0))) + _PRO)

_SERIES_SEED = {
    "a": -F32(_C + _O),
    "b": F32(0.0),
    "c": _NH3,
    "x": F32(F32(F32(F32(_C + _O) - _NH3) + _N) + _H),
    "y": F32(0.0),
    "z": -_NH3,
}
_SERIES_NTERM = {"a": True, "b": True, "c": True, "x": False, "y": False, "z": False}


def max_fragment_charge(cfg: Optional[int], precursor_charge: int) -> int:
    """Exclusive upper bound of the fragment-charge sweep (scoring.rs:234-247)."""
    cap = (cfg + 1) if cfg is not None else precursor_charge
    return max(min(precursor_charge, cap), 2)


def merge_prescore_candidates(m, pp, ss, zz, ii, K):
    """Host merge of flattened per-row candidates into the per-spectrum
    top-K with the PreScore ordering (matched desc, peptide desc, charge
    desc, isotope desc within each spectrum — scoring.rs:43-49 +
    trim_hits). Returns the selected indices into the flat arrays, in
    merged order. THE single definition of the tie rule shared by the
    single-device and sharded scorers."""
    keep = m > 0
    order = np.lexsort((-ii[keep], -zz[keep], -pp[keep], -m[keep], ss[keep]))
    sel = np.flatnonzero(keep)[order]
    ssel = ss[sel]
    if ssel.size:
        starts = np.r_[0, np.flatnonzero(np.diff(ssel)) + 1]
        group_start = np.repeat(starts, np.diff(np.r_[starts, ssel.size]))
        rank = np.arange(ssel.size) - group_start
        sel = sel[rank < K]
    return sel


def _pad_count(n: int) -> int:
    """Batch-axis padding: powers of two up to 2048, then multiples of
    2048. Bounds both the number of compiled executables (a few dozen at
    most) and the padding waste (next_power_of_two alone wastes up to 2x
    at large batch sizes — directly visible in stage-2 exec time)."""
    n = max(n, 8)
    if n <= 2048:
        return next_power_of_two(n)
    return ((n + 2047) // 2048) * 2048


def _pad_rows(n: int) -> int:
    """Stage-1 row-axis padding: powers of two up to 1024, then 512
    multiples — finer than :func:`_pad_count` because the (W, Lc) row
    buckets split a batch into middling row counts where pow2 padding
    wastes up to 40% of stage-1 compute."""
    n = max(n, 8)
    if n <= 1024:
        return next_power_of_two(n)
    return ((n + 511) // 512) * 512


# Ladder-length classes for stage-1 row bucketing: a fixed value grid
# (not data-derived) so the set of compiled (W, Lc) executables stays
# small and stable across batches.
_LC_GRID = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def _lc_class(need: int, L: int) -> int:
    for g in _LC_GRID:
        if g >= need and g <= L:
            return g
    return L


_LNEED_BLK = 64


def _lens_blockmax(lens: np.ndarray) -> np.ndarray:
    """[ceil(P/64)] max peptide length per 64-wide block of the
    mass-sorted table (precomputed once per database)."""
    P = lens.shape[0]
    nb = -(-max(P, 1) // _LNEED_BLK)
    pad = np.zeros(nb * _LNEED_BLK, np.int64)
    pad[:P] = lens
    return pad.reshape(nb, _LNEED_BLK).max(axis=1)


def _window_lneed(lens: np.ndarray, i0: np.ndarray, i1: np.ndarray,
                  blkmax: Optional[np.ndarray] = None):
    """Per-row UPPER BOUND of max(len) - 1 over the window [i0, i1) of
    the mass-sorted peptide table (0 for empty windows): the max of the
    64-wide blocks covering the window, edge blocks included whole.
    Sound for ladder-length CLASS assignment — a class covering the
    bound always covers the true need — and O(window/64) vector passes
    per batch where an exact `np.maximum.reduceat` formulation was
    measured at ~200 ms/batch (reduceat also reduces the huge discarded
    spans BETWEEN consecutive windows)."""
    n = i0.size
    if n == 0:
        return np.zeros(0, np.int64)
    if blkmax is None:
        blkmax = _lens_blockmax(lens)
    nbk = blkmax.shape[0]
    a = i0.astype(np.int64) // _LNEED_BLK
    b = (np.maximum(i1.astype(np.int64), i0 + 1) - 1) // _LNEED_BLK
    m = np.zeros(n, np.int64)
    for j in range(int((b - a).max(initial=0)) + 1):
        bj = np.minimum(a + j, nbk - 1)
        m = np.maximum(m, np.where(a + j <= b, blkmax[bj], 0))
    return np.where(i1 > i0, np.maximum(m - 1, 0), 0)


@dataclasses.dataclass
class SearchParams:
    """Scorer configuration (scoring.rs:210-232)."""

    precursor_tol: Tolerance
    fragment_tol: Tolerance
    min_matched_peaks: int = 4
    min_isotope_err: int = 0
    max_isotope_err: int = 0
    min_precursor_charge: int = 2
    max_precursor_charge: int = 4
    override_precursor_charge: bool = False
    max_fragment_charge: Optional[int] = None
    chimera: bool = False
    report_psms: int = 1
    wide_window: bool = False
    annotate_matches: bool = False
    score_type: str = SAGE_HYPERSCORE


def tol_bounds_static(kind: str, lo: float, hi: float, center):
    """Tolerance.bounds as traced f32 ops with the reference's op order
    (mass.rs:21-35). The single traced implementation shared by the XLA
    stages and both Pallas kernels, so the bit-identical guarantee has
    one definition."""
    lo = np.float32(lo)
    hi = np.float32(hi)
    if kind == "ppm":
        s = np.float32(1e6)
        return center + (center * lo) / s, center + (center * hi) / s
    if kind == "pct":
        s = np.float32(100.0)
        return center + (center * lo) / s, center + (center * hi) / s
    return center + lo, center + hi


def _tol_bounds_jnp(tol: Tolerance, center):
    return tol_bounds_static(tol.kind, tol.lo, tol.hi, center)


def ion_ladders(res, ntm, mono, series):
    """Sequential-f32 cumulative ion ladders for the configured series.

    res: [..., L] per-residue masses (monoisotopic + mod); ntm/mono: [...]
    N-term mod and full monoisotopic mass. Returns f32 [S, ..., L] neutral
    fragment masses; ion i is valid for i < len - 1 (ion_series.rs:63-86).
    The scan accumulates strictly left-to-right, matching the reference's
    scalar f32 running sums bit-for-bit."""
    n_series = len(series)
    inits = []
    signs = []
    for kind in series:
        seed = np.float32(_SERIES_SEED[kind])
        if _SERIES_NTERM[kind]:
            inits.append(ntm + seed)
            signs.append(np.float32(1.0))
        else:
            inits.append((mono - ntm) + seed)
            signs.append(np.float32(-1.0))
    init = jnp.stack(inits, axis=0)  # [S, ...]
    sign = jnp.stack(signs, axis=0).reshape((n_series,) + (1,) * (res.ndim - 1))

    def step(carry, x):
        new = carry + sign * x[None]
        return new, new

    xs = jnp.moveaxis(res, -1, 0)  # [L, ...]
    _, lad = jax.lax.scan(step, init, xs)  # [L, S, ...]
    return jnp.moveaxis(lad, 0, -1)  # [S, ..., L]


def series_valid_mask(lens, L, series, min_ion_index):
    """[S, ..., L] bool: is ion i of each series stored in the index
    (database.rs:281-291) — drops the first min_ion_index ions from the
    relevant terminus plus ions beyond len - 1."""
    ion_idx = jnp.arange(L, dtype=jnp.int32)
    n_ions = jnp.maximum(lens - 1, 0)[..., None]  # [..., 1]
    masks = []
    for kind in series:
        if _SERIES_NTERM[kind]:
            m = (ion_idx + 1 > min_ion_index) & (ion_idx < n_ions)
        else:
            m = ((n_ions - ion_idx) > min_ion_index) & (ion_idx < n_ions)
        masks.append(m)
    return jnp.stack(masks, axis=0)


def rescore_candidate(f, fvalid, pkm, pki, maxz, *, series, frag_tol, Z):
    """The full score_candidate computation for ONE candidate
    (scoring.rs:675-767): per-(fragment, charge) most-intense-peak match,
    strictly sequential f32 intensity/ppm accumulation in the reference's
    fragments-iterator order (series, ion, charge), matched counts and
    longest-run automata.

    f: [S, L] neutral ladders (invalid slots -inf when fvalid is None);
    pkm/pki: [Pk] peak masses/intensities; maxz: scalar exclusive
    fragment-charge bound. Returns (mb, my, summed_b, summed_y, ppm_sum,
    longest_b, longest_y). Shared by the single-device stage 2 and the
    model-sharded rescore (parallel/sharding.py)."""
    n_series, L = f.shape
    is_nterm = np.array([_SERIES_NTERM[k] for k in series], dtype=bool)
    ion_idx = jnp.arange(L, dtype=jnp.int32)

    matched_l, pkm_l, pki_l, mzs = [], [], [], []
    for zi in range(Z):
        z = np.float32(zi + 1)
        mzc = f / z  # [S, L]
        lo, hi = _tol_bounds_jnp(frag_tol, mzc)
        z_ok = (zi + 1) < maxz
        inwin = (pkm[None, None, :] >= lo[..., None]) & (
            pkm[None, None, :] <= hi[..., None]
        )  # [S, L, Pk]
        qual = inwin & (pki[None, None, :] >= 0) & z_ok
        if fvalid is not None:
            qual = qual & fvalid[..., None]
        val = jnp.where(qual, pki[None, None, :], np.float32(-1.0))
        # Most intense in-window peak: a plain lane max gives the
        # intensity; the matched peak's mass is the max mass among
        # peaks attaining it — masses ascend with index, so this
        # reproduces the ties-to-the-LATER-index rule
        # (spectrum.rs:150-157) without argmax/gather.
        best = jnp.max(val, axis=-1)  # [S, L]
        bmass = jnp.max(
            jnp.where(val == best[..., None], pkm[None, None, :],
                      np.float32(-np.inf)),
            axis=-1,
        )
        m = best >= 0
        matched_l.append(m)
        pki_l.append(jnp.where(m, best, np.float32(0.0)))
        pkm_l.append(jnp.where(m, bmass, np.float32(0.0)))
        mzs.append(mzc)
    matched = jnp.stack(matched_l, axis=-1)  # [S, L, Z]
    pk_i = jnp.stack(pki_l, axis=-1)
    pk_m = jnp.stack(pkm_l, axis=-1)
    mz_c = jnp.stack(mzs, axis=-1)  # [S, L, Z]

    # Per-fragment ppm term, f32 in the reference op order
    # (scoring.rs:719-720).
    d = jnp.abs(mz_c - pk_m)
    denom = mz_c + pk_m
    ppm_t = jnp.where(
        matched,
        ((pk_i * d) * np.float32(2e6))
        / jnp.where(denom == 0, np.float32(1.0), denom),
        np.float32(0.0),
    )

    bm3 = is_nterm[:, None, None]
    mb = jnp.sum((matched & bm3).astype(jnp.int32))
    my = jnp.sum((matched & ~bm3).astype(jnp.int32))

    # Strictly-sequential f32 sums in fragments-iterator order
    # (series, ion, charge). Adding 0.0f is exact, so unmatched
    # slots can stay in the chain. The chain is FULLY unrolled into
    # T dependent adds: identical op order to the reference's
    # iterator (and to the previous lax.scan form), but fused by XLA
    # into one loop-free kernel — the scan's per-step overhead was
    # ~8 ms per 459k vmapped candidates, the unrolled chain ~1 ms.
    b_int = jnp.where(bm3, pk_i, 0.0).reshape(-1)
    y_int = jnp.where(~bm3, pk_i, 0.0).reshape(-1)
    terms = jnp.stack([b_int, y_int, ppm_t.reshape(-1)], axis=-1)  # [T, 3]

    sums = jnp.zeros(3, jnp.float32)
    for i in range(terms.shape[0]):
        sums = sums + terms[i]

    # Longest-run automata (scoring.rs:771-793) — all N-term series
    # feed one run in series order, all C-term series the other,
    # reproducing the reference's shared-Run quirks including the
    # initial last == 0 swallowing ion index 0.
    m_any = matched.any(axis=-1)  # [S, L]

    ion_l = jnp.broadcast_to(ion_idx[None, :], (n_series, L))
    n_b = int(is_nterm.sum())
    n_y = int((~is_nterm).sum())
    if n_b == 1:
        lb = longest_run_vec(m_any[is_nterm][0], ion_idx)
    elif n_b:
        lb = longest_run_scan(
            (m_any[is_nterm].reshape(-1), ion_l[is_nterm].reshape(-1))
        )
    else:
        lb = np.int32(0)
    if n_y == 1:
        ly = longest_run_vec(m_any[~is_nterm][0], ion_idx)
    elif n_y:
        ly = longest_run_scan(
            (m_any[~is_nterm].reshape(-1), ion_l[~is_nterm].reshape(-1))
        )
    else:
        ly = np.int32(0)

    return mb, my, sums[0], sums[1], sums[2], lb, ly


def longest_run_scan(flags_and_idx):
    """The reference's Run automaton verbatim (scoring.rs:771-793) as a
    sequential scan over (matched, ion_index) pairs — the general form
    that handles several series feeding one terminus's Run."""
    def step(state, fi):
        start, length, last, longest = state
        m, l = fi
        skip = m & (last == l)
        extend = m & ~skip & (start + length == l)
        restart = m & ~skip & ~extend
        length = jnp.where(extend, length + 1, jnp.where(restart, 1, length))
        start = jnp.where(restart, l, start)
        longest = jnp.where(
            extend | restart, jnp.maximum(longest, length), longest
        )
        last = jnp.where(m & ~skip, l, last)
        return (start, length, last, longest), None

    z0 = (np.int32(0), np.int32(0), np.int32(0), np.int32(0))
    (_, _, _, longest), _ = jax.lax.scan(
        step, z0, flags_and_idx, unroll=8
    )
    return longest


def longest_run_vec(flags, ion_idx):
    """Single-series terminus: the Run automaton reduces to "longest run
    of consecutive matched ion indices with index 0 swallowed" (``last``
    inits to 0, so the first visit of l=0 always takes the skip branch;
    every later l is strictly greater than any recorded ``last``). That
    is exactly computable in parallel with an integer cumulative max —
    bit-exact because every op is integral:
    run_len[l] = l - (last unmatched index <= l). Equivalence to
    ``longest_run_scan`` is property-tested (test_search_golden.py)."""
    m1 = flags & (ion_idx > 0)
    nf = jnp.where(m1, np.int32(-1), ion_idx)
    prev_nf = jax.lax.cummax(nf)
    return jnp.max(jnp.where(m1, ion_idx - prev_nf, 0))


def pipeline_stream(batches, admit, advance, finish):
    """Generic pipelined batch driver shared by the single-device and
    sharded scorers (the TPU equivalent of the reference's rayon
    pipeline over spectra, runner.rs:311-324).

    Three phases per batch: ``admit`` (host prep + async device
    dispatch), ``advance`` (the blocking device fetch, plus any follow-up
    dispatch), ``finish`` (host finalize -> FeatureTable). JAX dispatch
    is asynchronous, so keeping up to two batches in flight overlaps
    batch i's fetch/host work with the device's execution of batch i+1.
    Yields one FeatureTable per input batch, in order; empty input
    batches yield empty tables.

    The threaded mode (default on >= 4-core hosts; the worker runs
    ``advance`` while the feeder admits and the consumer finishes)
    overlaps the blocking fetch round trips with host compute —
    device_get releases the GIL. On single-core hosts the thread
    contends with the main thread's numpy work and loses ~40%, so the
    fallback is a sliding dispatch window on one thread."""
    import os

    from .features import FeatureTable

    threads_default = "1" if (os.cpu_count() or 1) >= 4 else "0"
    if os.environ.get("SAGE_TPU_STREAM_THREADS", threads_default) != "0":
        import queue as _q
        from concurrent.futures import ThreadPoolExecutor

        q1: "_q.Queue" = _q.Queue(maxsize=2)
        # q2 unbounded so the worker can never block on put (in-flight
        # work is bounded by q1's maxsize); a blocked worker would
        # deadlock executor shutdown if the consumer exits early.
        q2: "_q.Queue" = _q.Queue()
        _END = object()

        def worker_advance():
            while True:
                e = q1.get()
                if e is _END:
                    q2.put(_END)
                    return
                try:
                    q2.put(e if e.get("empty") else advance(e))
                except BaseException as exc:  # propagate to consumer
                    q2.put(exc)
                    q2.put(_END)  # so the consumer's drain terminates
                    return

        with ThreadPoolExecutor(max_workers=1) as ex:
            ex.submit(worker_advance)
            it = iter(batches)
            done_feeding = False
            try:
                while True:
                    # feed admits until q1 is full or input exhausted
                    while not done_feeding and not q1.full():
                        try:
                            batch = next(it)
                        except StopIteration:
                            done_feeding = True
                            q1.put(_END)
                            break
                        q1.put(
                            {"empty": True} if not batch else admit(batch)
                        )
                    e = q2.get()
                    if e is _END:
                        break
                    if isinstance(e, BaseException):
                        raise e
                    yield FeatureTable.empty() if e.get("empty") else finish(e)
            finally:
                # On ANY early exit (consumer exception, GeneratorExit
                # from an abandoned generator) the worker must be
                # released or executor shutdown hangs. The worker posts
                # _END after normal completion AND after posting an
                # exception, so draining q2 always terminates; q1 may
                # be full with a dead worker, hence put_nowait retries
                # interleaved with q2 drains.
                if not done_feeding:
                    done_feeding = True
                    ended = False
                    while True:
                        try:
                            q1.put_nowait(_END)
                            break
                        except _q.Full:
                            try:
                                if q2.get(timeout=0.2) is _END:
                                    ended = True
                                    break
                            except _q.Empty:
                                continue
                    while not ended:
                        if q2.get() is _END:
                            ended = True
        return

    # single-threaded fallback: sliding window of depth A. Empty
    # batches flow through `pend` as markers so results stay in
    # 1:1 input order.
    from collections import deque

    def finish_any(e):
        return FeatureTable.empty() if e.get("empty") else finish(e)

    def advance_once(e):
        if not e.get("empty") and not e.get("_advanced"):
            e["_advanced"] = True
            advance(e)

    pend = deque()
    A = int(os.environ.get("SAGE_TPU_PIPELINE_DEPTH", "2"))
    for batch in batches:
        pend.append({"empty": True} if not batch else admit(batch))
        if len(pend) >= A + 1:
            advance_once(pend[-(A + 1)])  # oldest un-advanced entry
        if len(pend) >= A + 2:
            yield finish_any(pend.popleft())
    for e in pend:
        advance_once(e)
    while pend:
        yield finish_any(pend.popleft())


@partial(jax.jit, static_argnames=("Pk",))
def _unpack_peaks(flat, offs, *, Pk):
    """Re-pad ragged peaks on device: flat [2, T_pad] (masses row 0,
    intensities row 1, tail prefilled with the pad values), offs [B+1]
    i32. Returns [2, B, Pk] bit-identical to uploading _pad_peaks'
    padded arrays (pads: masses +inf, intensities -1)."""
    j = jnp.arange(Pk, dtype=jnp.int32)

    def per(o0, o1):
        sl = jax.lax.dynamic_slice(flat, (0, o0), (2, Pk))
        valid = j < (o1 - o0)
        m = jnp.where(valid, sl[0], np.float32(np.inf))
        i = jnp.where(valid, sl[1], np.float32(-1.0))
        return m, i

    m, i = jax.vmap(per)(offs[:-1], offs[1:])
    return jnp.stack([m, i])


def count_fragment_matches(f, fvalid, peaks, frag_tol, maxz, Z):
    """Per-candidate matched-peak counts via the rank-difference trick.

    f: [S, W, L] neutral fragment ladders; fvalid: [S, W, L] bool, or None
    when invalid slots of ``f`` already hold -inf (which falls in no window:
    ppm/pct bounds of -inf are NaN/-inf, da bounds -inf — every peak fails
    ``>= lo`` or ``<= hi``); peaks: [Pk] neutral peak masses padded with
    +inf; maxz: scalar i32 exclusive fragment-charge bound. Counts every
    in-window (peak × charge × fragment) pair, exactly the reference's
    preliminary matched count (scoring.rs:335-382). Returns i32 [W]."""
    W = f.shape[1]
    Pk = peaks.shape[0]
    # Reduction order matters for SPEED, not value (integer adds
    # commute): summing the (series, ion) axes FIRST leaves ONE
    # cross-lane reduce over the peak axis per candidate, where reducing
    # peaks innermost costs a cross-lane reduce per (series, candidate,
    # ion) — measured 3.6x slower in XLA on v5e.
    acc = jnp.zeros((W, Pk), dtype=jnp.int32)
    for zi in range(Z):
        z = np.float32(zi + 1)
        q = peaks * z  # [Pk]
        lo_q, hi_q = _tol_bounds_jnp(frag_tol, q)
        z_ok = (zi + 1) < maxz
        # Masked charge planes must contribute 0 to both the prefix count
        # (lo <= f) and the strict count (hi < f): +inf fails both
        # comparisons for any finite fragment.
        lo_q = jnp.where(z_ok, lo_q, np.float32(np.inf))
        hi_q = jnp.where(z_ok, hi_q, np.float32(np.inf))
        x = (
            (f[..., None] >= lo_q[None, None, None, :]).astype(jnp.int32)
            - (f[..., None] > hi_q[None, None, None, :]).astype(jnp.int32)
        )
        if fvalid is not None:
            x = jnp.where(fvalid[..., None], x, 0)
        acc = acc + jnp.sum(x, axis=(0, 2))
    return jnp.sum(acc, axis=-1)


class _DeviceTables:
    """HBM-resident peptide table, padded to a power-of-two row count so any
    precursor-window slice of width W <= P_pad stays in bounds.

    When the footprint allows (default cap 4 GiB, override with
    SAGE_TPU_PRECOMP_LADDERS=0/1), two precomputed fragment-ladder tables
    are also kept in HBM so the hot loops slice instead of re-scanning:

    * ``lad_index`` [P_pad, S, L]: ladders with the index's min_ion_index
      filter applied (database.rs:281-291); filtered/invalid slots hold
      -inf so they can never fall inside a query window. Stage 1 reads it.
    * ``lad_full``  [P_pad, S, L]: complete ladders (only the ion < len-1
      validity applied) for the full rescore, which ignores min_ion_index
      (scoring.rs:675-767). Stage 2 reads it.

    Values are produced by the same ``ion_ladders`` scan as the on-the-fly
    path, so both paths are bit-identical."""

    def __init__(self, db: IndexedDatabase, series, min_ion_index):
        import os

        t = db.table
        P = len(t)
        self.P_real = P
        # 2048-multiples, not powers of two: at proteome scale (millions
        # of peptides) pow2 padding wastes up to 2x of every ladder table
        self.P_pad = max(((P + 2047) // 2048) * 2048, 128)
        L = t.max_len
        pad = self.P_pad - P
        self.resmass = jnp.asarray(
            np.pad(t.resmass, ((0, pad), (0, 0))), dtype=jnp.float32
        )
        self.nterm = jnp.asarray(np.pad(t.nterm, (0, pad)), dtype=jnp.float32)
        self.mono = jnp.asarray(
            np.pad(t.mono, (0, pad), constant_values=np.inf), dtype=jnp.float32
        )
        self.lens = jnp.asarray(np.pad(t.lens, (0, pad)), dtype=jnp.int32)
        self.L = L

        S = len(series)
        SL = S * L
        SLp2 = ((SL + 127) // 128) * 128
        bytes_3d = 2 * self.P_pad * SL * 4        # lad_index + lad_full
        bytes_2d = 2 * self.P_pad * SLp2 * 4      # lane-padded 2D views
        env = os.environ.get("SAGE_TPU_PRECOMP_LADDERS")
        if env is not None:
            precomp = precomp_2d = env != "0"
        else:
            # the 3D tables drive the XLA stage-1/stage-2 paths; the 2D
            # views only feed the (optional) Pallas kernels — drop them
            # first when the total would crowd HBM at proteome scale
            precomp = bytes_3d <= (4 << 30)
            precomp_2d = bytes_3d + bytes_2d <= (4 << 30)
        self.lad_index = None
        self.lad_full = None
        self.lad2d_index = None
        self.lad2d_full = None
        self.SLp = 0
        if precomp:
            # numpy scalar, NOT jnp: a jnp scalar is a device array that
            # becomes a jaxpr constvar, and embedding it at lowering time
            # blocks on a device fetch behind whatever the queue holds
            neg_inf = np.float32(-np.inf)

            # NOTE: device arrays are passed as ARGUMENTS, never closed
            # over — a closure would embed them as HLO constants, which
            # round-trips the whole table through the host at lowering
            # time (pathological on tunneled links + persistent cache).
            # The 3D tables come out of ONE jitted program and the 2D
            # views out of a second (reshape+pad of the finished 3D
            # arrays): a single four-output program would double the
            # transient peak, which is what OOMs first at proteome scale.
            P_pad = self.P_pad

            @jax.jit
            def build(resmass, nterm, mono, lens):
                lad = ion_ladders(resmass, nterm, mono, series)
                idx_valid = series_valid_mask(lens, L, series, min_ion_index)
                ion_idx = jnp.arange(L, dtype=jnp.int32)
                n_ions = jnp.maximum(lens - 1, 0)[:, None]
                full_valid = ion_idx[None, :] < n_ions  # [P, L]
                lad_index = jnp.where(idx_valid, lad, neg_inf)
                lad_full = jnp.where(full_valid[None], lad, neg_inf)
                # [S, P, L] -> [P, S, L] so per-candidate slices are contiguous
                lad_index = jnp.transpose(lad_index, (1, 0, 2))
                lad_full = jnp.transpose(lad_full, (1, 0, 2))
                return lad_index, lad_full

            @jax.jit
            def to2d(lad3d):
                # flat 2D view for the Pallas kernels: [P_pad, SLp]
                # (lanes padded to 128) with -inf in all padding
                return jnp.pad(
                    lad3d.reshape(P_pad, SL), ((0, 0), (0, SLp2 - SL)),
                    constant_values=-np.inf,
                )

            try:
                self.lad_index, self.lad_full = build(
                    self.resmass, self.nterm, self.mono, self.lens
                )
                if precomp_2d:
                    self.SLp = SLp2
                    self.lad2d_index = to2d(self.lad_index)
                    self.lad2d_full = to2d(self.lad_full)
            except Exception as e:  # RESOURCE_EXHAUSTED and kin
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                logging.getLogger("sage_tpu").warning(
                    "HBM exhausted precomputing ladder tables (%s peptides"
                    "); falling back to on-the-fly ladders", P
                )
                self.lad_index = None
                self.lad_full = None
                self.lad2d_index = None
                self.lad2d_full = None
                self.SLp = 0


class Scorer:
    """Score ProcessedSpectrum batches against an IndexedDatabase."""

    def __init__(self, db: IndexedDatabase, params: SearchParams,
                 build_device_tables: bool = True):
        """``build_device_tables=False`` constructs only the host-side
        machinery (row expansion, PreScore merge, feature assembly) —
        the form `parallel.sharding.ShardedScorer` embeds, where device
        work goes through the mesh instead of `_DeviceTables`."""
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.db = db
        self.params = params
        self.series = tuple(db.ion_kinds)
        self.n_series = len(self.series)
        self.min_ion_index = db.min_ion_index
        self.tables = (
            _DeviceTables(db, self.series, self.min_ion_index)
            if build_device_tables else None
        )
        # Global fragment-charge axis: 1..Zmax where Zmax is the largest
        # exclusive bound any precursor charge can produce.
        zmax = max(
            max_fragment_charge(params.max_fragment_charge, z)
            for z in range(1, params.max_precursor_charge + 1)
        )
        self.Z = max(zmax - 1, 1)
        # trim_hits K-select bound (scoring.rs:311-329): top-50 by matched
        # count, widened to 2x report_psms when more PSMs are requested
        self.K = max(50, params.report_psms * 2)
        self._stage1_cache: Dict[Tuple[int, int, int], object] = {}
        self._stage2_cache: Dict[Tuple[int, int], object] = {}
        self._plan_sticky: Dict[Tuple[int, int], tuple] = {}
        self._psm_counter = 1

    # ------------------------------------------------------------------
    # Device programs
    # ------------------------------------------------------------------

    def _ladders(self, res, ntm, mono_c, L):
        return ion_ladders(res, ntm, mono_c, self.series)

    def _series_valid_mask(self, lens_c, L):
        return series_valid_mask(lens_c, L, self.series, self.min_ion_index)

    def _build_stage1(self, W: int, Pk: int, R: int, Z: int,
                      Lc: Optional[int] = None):
        tables = self.tables
        # Lc caps the ladder axis for this executable: rows are bucketed
        # so every candidate in the window has len-1 <= Lc (window mass
        # correlates with peptide length, so most buckets need a fraction
        # of the global max — stage-1 compute is proportional to W*Lc).
        L = tables.L if Lc is None else min(Lc, tables.L)
        K = self.K
        frag_tol = self.params.fragment_tol
        n_series = self.n_series
        # When the whole precursor window fits in the K-select budget there
        # is nothing to select: return the raw counts (a 6x smaller
        # transfer than (vals, pep) at K=50) and let the host derive the
        # candidate indices. This is the common narrow-search shape.
        counts_only = W <= K

        precomp = tables.lad_index is not None
        # The table arrays are jit ARGUMENTS (never closure constants —
        # see _DeviceTables.build).
        tbl_args = (
            (tables.lad_index,)
            if precomp
            else (tables.resmass, tables.nterm, tables.mono, tables.lens)
        )

        def row_counts(tbl, peaks, p0, i0, i1, maxz):
            # peaks: [Pk] padded with +inf
            if precomp:
                (lad_index,) = tbl
                f = jax.lax.dynamic_slice(
                    lad_index, (p0, 0, 0), (W, n_series, L)
                )  # [W, S, L]
                f = jnp.transpose(f, (1, 0, 2))  # [S, W, L]
                fvalid = None
            else:
                resmass, nterm, mono, lens = tbl
                res = jax.lax.dynamic_slice(resmass, (p0, 0), (W, L))
                ntm = jax.lax.dynamic_slice(nterm, (p0,), (W,))
                mono_c = jax.lax.dynamic_slice(mono, (p0,), (W,))
                lens_c = jax.lax.dynamic_slice(lens, (p0,), (W,))
                f = self._ladders(res, ntm, mono_c, L)  # [S, W, L]
                fvalid = self._series_valid_mask(lens_c, L)  # [S, W, L]
            gidx = p0 + jnp.arange(W, dtype=jnp.int32)
            cand_valid = (gidx >= i0) & (gidx < i1)

            counts = count_fragment_matches(f, fvalid, peaks, frag_tol, maxz, Z)
            counts = jnp.where(cand_valid, counts, 0)
            matched_total = jnp.sum(counts)
            scored = jnp.sum((counts > 0).astype(jnp.int32))
            return counts, matched_total, scored

        # count<<23 | peptide packing halves the dominant fetch on
        # tunneled links; needs the peptide index to fit 23 bits and is
        # saturation-guarded (counts clamp at 511 for the top-K ORDER
        # only — the raw row max is fetched alongside so the host can
        # detect a clamp and redo the batch unpacked; see _prelim_part)
        bitpack = not counts_only and tables.P_pad < (1 << 23)

        def per_row(tbl, peaks, p0, i0, i1, maxz, pack):
            counts, matched_total, scored = row_counts(
                tbl, peaks, p0, i0, i1, maxz
            )
            if counts_only:
                return counts, matched_total, scored
            if pack:
                # top_k over (count, peptide) packed keys picks count
                # desc then peptide desc — exactly PreScore Ord
                # (scoring.rs:43-49) — in one fetchable i32
                pepw = p0 + jnp.arange(W, dtype=jnp.int32)
                key = (
                    jnp.minimum(counts, np.int32(511)) << 23
                ) | pepw
                vals, _ = jax.lax.top_k(key, K)
                return vals, jnp.max(counts), matched_total, scored
            # Top-K by (count, peptide index) descending: reversing the
            # candidate axis makes top_k's lowest-index tie rule pick the
            # highest peptide index first (PreScore Ord, scoring.rs:43-49).
            rev = counts[::-1]
            vals, ridx = jax.lax.top_k(rev, K)
            pep = p0 + (W - 1 - ridx)
            return vals, pep, matched_total, scored

        def run_inner(tbl, peaks_all, ints, pack=False):
            # ints: [5, R] i32 (spec_idx, p0, i0, i1, maxz) — one upload.
            spec_idx, p0, i0, i1, maxz = (ints[j] for j in range(5))
            pk = peaks_all[0][spec_idx]  # [R, Pk]
            out = jax.vmap(
                lambda *a: per_row(tbl, *a, pack)
            )(pk, p0, i0, i1, maxz)
            # Pack into ONE i32 array so the host pays a single fetch
            # round-trip on tunneled links.
            if counts_only:
                counts, mtot, scored = out
                return jnp.concatenate(
                    [counts, mtot[:, None], scored[:, None]], axis=1
                )
            if pack:
                keys, rawmax, mtot, scored = out
                return jnp.concatenate(
                    [keys, rawmax[:, None], mtot[:, None], scored[:, None]],
                    axis=1,
                )  # [R, K+3]
            vals, pep, mtot, scored = out
            return jnp.concatenate(
                [vals, pep, mtot[:, None], scored[:, None]], axis=1
            )

        jitted = jax.jit(run_inner, static_argnames=("pack",))

        def run(peaks_all, ints):
            return jitted(tbl_args, peaks_all, ints, pack=bitpack)

        def run_unpacked(peaks_all, ints):
            return jitted(tbl_args, peaks_all, ints, pack=False)

        # expose the traceable + table args so the fused program can
        # inline stage 1 without re-capturing the tables as constants
        run._traceable = run_inner
        run._tbl = tbl_args
        run._packed = bitpack
        run._unpacked = run_unpacked
        return run, counts_only

    def _build_stage2_compact(self, Pk: int, N: int, Z: Optional[int] = None):
        """Full-rescore stage returning compact per-item features — the
        entire score_candidate computation (scoring.rs:675-767) stays on
        device: per-(fragment, charge) most-intense-peak match, strictly
        sequential f32 intensity/ppm accumulation in the reference's
        fragments-iterator order (series, ion, charge), matched counts and
        longest-run automata. Only 7 scalars per item return to the host,
        which matters on links where a device->host fetch costs ~100 ms."""
        tables = self.tables
        L = tables.L
        if Z is None:
            Z = self.Z
        frag_tol = self.params.fragment_tol
        n_series = self.n_series
        series = self.series
        is_nterm = np.array([_SERIES_NTERM[k] for k in series], dtype=bool)

        precomp = tables.lad_full is not None
        # Prefer the lane-padded 2D ladder view: gathering [SLp=128-lane]
        # rows is near-free (one descriptor per contiguous 512B row) where
        # the [S, L] 3D gather lowers to a far slower elementwise form —
        # measured 45 ms vs ~0 ms for 86k candidates on v5e.
        use_2d = tables.lad2d_full is not None
        SL = n_series * L
        tbl_args = (
            (tables.lad2d_full,)
            if use_2d
            else (tables.lad_full,)
            if precomp
            else (tables.resmass, tables.nterm, tables.mono, tables.lens)
        )

        def per_item(tbl, pkm, pki, pep, maxz):
            if use_2d:
                f = tbl[0][pep][:SL].reshape(n_series, L)
                fvalid = None
            elif precomp:
                f = tbl[0][pep]  # [S, L]; invalid slots are -inf
                fvalid = None
            else:
                resmass, nterm, mono, lens = tbl
                res = resmass[pep]  # [L]
                ntm = nterm[pep]
                mono_c = mono[pep]
                lens_c = lens[pep]
                f = ion_ladders(res[None, :], ntm[None], mono_c[None], series)[:, 0, :]
                n_ions = jnp.maximum(lens_c - 1, 0)
                ion_idx = jnp.arange(L, dtype=jnp.int32)
                fvalid = jnp.broadcast_to(ion_idx[None, :] < n_ions, (n_series, L))
            return rescore_candidate(
                f, fvalid, pkm, pki, maxz,
                series=series, frag_tol=frag_tol, Z=Z,
            )

        def run_inner(tbl, peaks_dev, ints):
            # peaks_dev: [2, S, Pk] (masses, intensities); ints: [3, N] i32
            # (spec_idx, pep, maxz). Outputs pack into ONE f32 [N, 7] array
            # (integer columns are small counts, exact in f32) so the host
            # pays a single fetch round-trip.
            spec_idx, pep, maxz = ints[0], ints[1], ints[2]
            pkm = peaks_dev[0][spec_idx]
            pki = peaks_dev[1][spec_idx]
            mb, my, sb, sy, pp, lb, ly = jax.vmap(
                lambda *a: per_item(tbl, *a)
            )(pkm, pki, pep, maxz)
            return jnp.stack(
                [
                    mb.astype(jnp.float32), my.astype(jnp.float32),
                    sb, sy, pp,
                    lb.astype(jnp.float32), ly.astype(jnp.float32),
                ],
                axis=1,
            )

        jitted = jax.jit(run_inner)

        def run(peaks_dev, ints):
            return jitted(tbl_args, peaks_dev, ints)

        return run

    def _open_path(self, W: int) -> bool:
        """Use the peak-major open-search path when the candidate window
        is wide enough that per-row ladder scans dominate."""
        import os

        if self.db.fragment_mz_flat is None:
            return False
        thresh = int(os.environ.get("SAGE_TPU_OPEN_THRESHOLD", "8192"))
        return W >= thresh

    def _open_searcher(self):
        if getattr(self, "_open", None) is None:
            from .open_search import OpenSearcher

            self._open = OpenSearcher(
                self.db, self.params.fragment_tol, self.Z, K=self.K,
                precursor_tol=self.params.precursor_tol,
            )
        return self._open

    def _use_pallas(self, available: bool) -> bool:
        import os

        if not available or self.tables.lad2d_index is None:
            return False
        env = os.environ.get("SAGE_TPU_PALLAS")
        if env is not None:
            return env != "0"
        return jax.default_backend() != "cpu"

    def _build_stage1_pallas(self, W: int, Pk: int, R: int, Z: int):
        from .pallas_stage1 import stage1_counts_pallas

        tables = self.tables
        tol = self.params.fragment_tol
        tol_s = (tol.kind, float(tol.lo), float(tol.hi))
        lad2d = tables.lad2d_index
        SLp = tables.SLp
        counts_only = W <= self.K
        K = self.K

        def traceable(tbl, peaks_dev, ints5):
            counts = stage1_counts_pallas(
                tbl[0], peaks_dev, ints5[0], ints5[1], ints5[2], ints5[3],
                ints5[4], W=W, SLp=SLp, Pk=Pk, Z=Z, R=R, tol=tol_s,
            )  # packed i32 [R, W+2]
            if counts_only:
                return counts
            # wide windows: per-row top-K in XLA on the kernel's counts
            # (device-side intermediate, never fetched at width W)
            c = counts[:, :W]
            mtot = counts[:, W]
            scored = counts[:, W + 1]

            def per_row(cnt, p0):
                rev = cnt[::-1]
                vals, ridx = jax.lax.top_k(rev, K)
                pep = p0 + (W - 1 - ridx)
                return vals, pep

            vals, pep = jax.vmap(per_row)(c, ints5[1])
            return jnp.concatenate(
                [vals, pep, mtot[:, None], scored[:, None]], axis=1
            )

        def run(peaks_dev, ints):
            return traceable((lad2d,), peaks_dev, ints)

        run._traceable = traceable
        run._tbl = (lad2d,)
        return run, counts_only

    def _stage1(self, W, Pk, R, Z, Lc=None):
        key = (W, Pk, R, Z, Lc)
        if key not in self._stage1_cache:
            # Pallas stage-1 wins at narrow windows (one fused program,
            # VMEM-resident) but its per-candidate loop loses to XLA's
            # fully-vectorized compare at wide windows (measured ~0.6x at
            # W=256 on v5e) — so it engages only for W <= K, subject to
            # the 8 MiB VMEM cap on its double-buffered [2, G=8, W, SLp]
            # window scratch.
            SLp = self.tables.SLp
            fits = (
                W <= self.K
                and SLp > 0
                and 2 * 8 * W * SLp * 4 <= (8 << 20)
            )
            if self._use_pallas(fits):
                self._stage1_cache[key] = self._build_stage1_pallas(W, Pk, R, Z)
            else:
                self._stage1_cache[key] = self._build_stage1(W, Pk, R, Z, Lc)
        return self._stage1_cache[key]

    def _stage2_compact(self, Pk, N, Z):
        # A stage-2 Pallas kernel existed through round 2 but never beat
        # the fused XLA program on the real chip (thin per-item ops
        # dominate; measured ~0.85x at 889k peptides) — removed rather
        # than kept as a dead opt-in.
        key = ("c", Pk, N, Z)
        if key not in self._stage2_cache:
            self._stage2_cache[key] = self._build_stage2_compact(Pk, N, Z)
        return self._stage2_cache[key]

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------

    def _expand_rows(self, spectra: Sequence[ProcessedSpectrum]):
        """initial_hits charge/isotope expansion (scoring.rs:384-462): one
        query row per (spectrum, precursor charge, isotope error).

        Vectorized: all precursor-window bounds and peptide-table binary
        searches run as whole-array numpy f32 ops (elementwise identical to
        the reference's scalar f32 math). Returns a dict of row arrays
        {si, z, iso, i0, i1}."""
        p = self.params
        mono = self.db.table.mono
        n = len(spectra)
        prec_mz = np.empty(n, np.float32)
        prec_z = np.zeros(n, np.int32)
        for si, spec in enumerate(spectra):
            if not spec.precursors:
                raise ValueError(f"missing MS1 precursor for {spec.id}")
            prec = spec.precursors[0]
            prec_mz[si] = F32(prec.mz)
            if prec.charge is not None:
                prec_z[si] = prec.charge
        mz = prec_mz - F32(PROTON)

        if p.min_isotope_err != p.max_isotope_err:
            iso_list = np.arange(
                p.min_isotope_err, p.max_isotope_err + 1, dtype=np.int32
            )
        else:
            iso_list = np.zeros(1, dtype=np.int32)
        n_iso = iso_list.size
        zmin, zmax = p.min_precursor_charge, p.max_precursor_charge
        z_sweep = np.arange(zmin, zmax + 1, dtype=np.int32)
        nz = z_sweep.size

        if p.wide_window:
            # Per-spectrum isolation windows differ and the scaled-tolerance
            # bounds must keep the reference's scalar f32 op order, so this
            # (rarer) mode stays a scalar loop.
            si_l, z_l, iso_l, lo_l, hi_l = [], [], [], [], []
            for si, spec in enumerate(spectra):
                base = spec.precursors[0].isolation_window or Tolerance(
                    "da", -2.4, 2.4
                )
                for z in z_sweep:
                    tol = base * float(z)
                    pm = F32(mz[si] * F32(z))
                    for iso in iso_list:
                        qm = F32(pm - F32(F32(iso) * NEUTRON))
                        lo, hi = tol.bounds(qm)
                        si_l.append(si)
                        z_l.append(int(z))
                        iso_l.append(int(iso))
                        lo_l.append(lo)
                        hi_l.append(hi)
            si_rows = np.asarray(si_l, np.int32)
            z_rows = np.asarray(z_l, np.int32)
            iso_rows = np.asarray(iso_l, np.int32)
            lo_all = np.asarray(lo_l, np.float32)
            hi_all = np.asarray(hi_l, np.float32)
        else:
            ann = (prec_z > 0) & (not p.override_precursor_charge)
            ann_idx = np.flatnonzero(ann)
            sw_idx = np.flatnonzero(~ann)
            si_a = np.repeat(ann_idx.astype(np.int32), n_iso)
            z_a = np.repeat(prec_z[ann_idx], n_iso)
            iso_a = np.tile(iso_list, ann_idx.size)
            si_s = np.repeat(sw_idx.astype(np.int32), nz * n_iso)
            z_s = np.tile(np.repeat(z_sweep, n_iso), sw_idx.size)
            iso_s = np.tile(iso_list, nz * sw_idx.size)
            si_rows = np.concatenate([si_a, si_s])
            z_rows = np.concatenate([z_a, z_s])
            iso_rows = np.concatenate([iso_a, iso_s])
            order = np.argsort(si_rows, kind="stable")
            si_rows, z_rows, iso_rows = (
                si_rows[order], z_rows[order], iso_rows[order],
            )
            pm = (mz[si_rows] * z_rows.astype(np.float32)).astype(np.float32)
            qm = pm - (iso_rows.astype(np.float32) * F32(NEUTRON))
            lo_all, hi_all = p.precursor_tol.bounds(qm)

        i0 = np.searchsorted(mono, lo_all, side="left").astype(np.int32)
        i1 = np.searchsorted(mono, hi_all, side="right").astype(np.int32)
        return {
            "si": si_rows.astype(np.int32),
            "z": z_rows.astype(np.int32),
            "iso": iso_rows.astype(np.int32),
            "i0": i0,
            "i1": i1,
        }

    def _peaks_device(self, spectra, masses, intens, Pk):
        """Device-resident packed peaks [2, B, Pk]. By default ships the
        RAGGED peaks (mean fill ~60% of the padded grid in practice) and
        re-pads on device — bit-identical to uploading the padded
        arrays, ~40% less upload on bandwidth-limited links. Falls back
        to the padded upload when the grid is nearly full or via
        SAGE_TPU_RAGGED_UPLOAD=0."""
        import os

        S = len(spectra)
        lens = np.fromiter((len(s) for s in spectra), np.int64, count=S)
        T = int(lens.sum())
        if (
            os.environ.get("SAGE_TPU_RAGGED_UPLOAD", "1") == "0"
            or S == 0
            or T >= 0.9 * S * Pk
        ):
            return jnp.asarray(np.stack([masses, intens]))
        from .open_search import _quarter_octave

        T_pad = _quarter_octave(max(T + Pk, 8))
        flat = np.empty((2, T_pad), np.float32)
        flat[0] = np.inf
        flat[1] = -1.0
        flat[0, :T] = np.concatenate([s.masses for s in spectra])
        flat[1, :T] = np.concatenate([s.intensities for s in spectra])
        offs = np.zeros(S + 1, np.int32)
        offs[1:] = np.cumsum(lens)
        return _unpack_peaks(jnp.asarray(flat), jnp.asarray(offs), Pk=Pk)

    def _pad_peaks(self, spectra: Sequence[ProcessedSpectrum]):
        S = len(spectra)
        lens = np.fromiter(
            (len(s) for s in spectra), dtype=np.int64, count=S
        )
        Pk = int(max(lens.max() if S else 1, 1))
        Pk = int(np.ceil(Pk / 32) * 32)
        # Avoid 128-multiples: when the compare grids' peak axis is an
        # exact lane multiple, XLA lays the grid out with Pk on lanes and
        # reduces ACROSS lanes — measured 3x slower on v5e than the
        # Pk-on-sublanes layout it picks for any other width. Burning up
        # to 32 pad columns (all +inf masses, matching nothing) buys a
        # ~3x faster stage-1/rescore; values are bit-identical because
        # +inf peaks fall in no tolerance window.
        if Pk % 128 == 0:
            Pk += 32
        masses = np.full((S, Pk), np.inf, dtype=np.float32)
        intens = np.full((S, Pk), -1.0, dtype=np.float32)
        if S:
            rows = np.repeat(np.arange(S), lens)
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
            cols = np.arange(int(lens.sum())) - np.repeat(offs, lens)
            masses[rows, cols] = np.concatenate([s.masses for s in spectra])
            intens[rows, cols] = np.concatenate(
                [s.intensities for s in spectra]
            )
        return masses, intens, Pk

    def score(self, spectra: Sequence[ProcessedSpectrum]) -> List[Feature]:
        """Score a batch of MS2 spectra; returns Feature objects (tests /
        small batches). Production callers use :meth:`score_table`."""
        return self.score_table(spectra).to_features()

    def score_table(self, spectra: Sequence[ProcessedSpectrum]) -> FeatureTable:
        """Score a batch of MS2 spectra into a columnar FeatureTable
        (report_psms per spectrum), reference score_standard semantics."""
        if not spectra:
            return FeatureTable.empty()
        if self.params.chimera:
            return self._score_chimera(spectra)
        masses, intens, Pk = self._pad_peaks(spectra)
        # One peak upload per batch, packed as [2, S, Pk] and shipped
        # ragged (uploads dominate on tunneled links); both stages
        # reuse it.
        peaks_dev = self._peaks_device(spectra, masses, intens, Pk)
        rows = self._expand_rows(spectra)
        fd = self._fused_dispatch(
            spectra, masses, intens, Pk, peaks_dev, rows=rows
        )
        if fd is not None:
            t = self._fused_finalize(spectra, fd, masses, intens, Pk)
            if t is not None:
                return t
            self.fused_reruns = getattr(self, "fused_reruns", 0) + 1
            log.warning(
                "banded entry-capacity overflow; re-running batch via the "
                "two-dispatch path"
            )
        prelim = self._prelim_finalize(
            self._prelim_dispatch(
                spectra, masses=masses, peaks_dev=peaks_dev, rows=rows
            )
        )
        return self._features_table(
            spectra, prelim, masses, intens, Pk, self.params.report_psms,
            peaks_dev=peaks_dev,
        )

    def score_stream(self, batches) -> "List[FeatureTable]":
        """Pipelined scoring over an iterable of spectrum batches.

        JAX dispatch is asynchronous, so the only blocking points are the
        two device_get fetches per batch. This keeps up to two batches in
        flight: while the host waits on batch i's stage-1 counts, the
        device is already executing batch i+1's stage 1 (and batch i-1's
        stage 2), hiding transfer latency behind compute — the TPU
        equivalent of the reference's rayon pipeline over spectra
        (runner.rs:311-324). Yields one FeatureTable per input batch, in
        order."""
        if self.params.chimera:
            for batch in batches:
                yield self.score_table(batch)
            return

        import os

        def admit(batch):
            masses, intens, Pk = self._pad_peaks(batch)
            peaks_dev = self._peaks_device(batch, masses, intens, Pk)
            e = {
                "batch": batch, "masses": masses, "intens": intens, "Pk": Pk,
                "peaks_dev": peaks_dev,
                "d1": None, "prelim": None, "d2": None, "fd": None,
            }
            rows = self._expand_rows(batch)
            e["fd"] = self._fused_dispatch(
                batch, masses, intens, Pk, peaks_dev, rows=rows
            )
            if e["fd"] is None:
                e["d1"] = self._prelim_dispatch(
                    batch, masses=masses, peaks_dev=peaks_dev, rows=rows
                )
            return e

        def advance(e):
            # stage-1 fetch + host merge + stage-2 dispatch; for the
            # fused single-dispatch path, the packed-result fetch AND
            # the whole host finalize (including any select-guard
            # fallback round trip) — device_get releases the GIL and the
            # finalize is numpy, so in threaded mode the main thread
            # only admits batches while this overlaps with it
            if e["fd"] is None:
                e["prelim"] = self._prelim_finalize(e["d1"])
                e["d2"] = self._stage2_dispatch(
                    e["prelim"], e["intens"], e["Pk"], peaks_dev=e["peaks_dev"],
                )
            else:
                packed_np = np.asarray(_dget(e["fd"]["fused"]))
                e["table"] = self._fused_finalize(
                    e["batch"], e["fd"], e["masses"], e["intens"],
                    e["Pk"], packed=packed_np,
                )
            return e

        def finish(e):
            if e["fd"] is not None:
                t = e.get("table")
                if t is not None:
                    return t
                self.fused_reruns = getattr(self, "fused_reruns", 0) + 1
                log.warning(
                    "fused capacity overflow (banded entries or open "
                    "sticky shapes); re-running batch via the "
                    "two-dispatch path"
                )
                prelim = self._preliminary(
                    e["batch"], masses=e["masses"], peaks_dev=e["peaks_dev"]
                )
                return self._features_table(
                    e["batch"], prelim, e["masses"], e["intens"], e["Pk"],
                    self.params.report_psms, peaks_dev=e["peaks_dev"],
                )
            return self._stage2_finalize(
                e["batch"], e["prelim"], e["d2"], self.params.report_psms,
                None, e["masses"], e["Pk"],
            )

        yield from pipeline_stream(batches, admit, advance, finish)

    def _preliminary(self, spectra, masses=None, peaks_dev=None):
        return self._prelim_finalize(
            self._prelim_dispatch(spectra, masses=masses, peaks_dev=peaks_dev)
        )

    # ------------------------------------------------------------------
    # Fused single-dispatch path (stage 1 + merge + stage 2 on device)
    # ------------------------------------------------------------------

    def _build_fused(self, plan, Pk, S_pad, G_eff, Zb, Ksel):
        """One device program covering the whole per-batch search:
        SEGMENTED stage-1 window counts (each (window-width Wb,
        ladder-length Lcb, padded-rows Rb) class runs at its own static
        shape — the 2D bucketing that recovers 2-4x of stage-1 compute,
        here inside one program), a GATHER into the per-spectrum merge
        grid by a host-computed slot permutation (device scatters run at
        ~80 M elem/s on this part where 64-lane row gathers run ~30x
        faster — measured), the PreScore merge (4-key sort by matched/
        peptide/charge/isotope desc — scoring.rs:43-49 + trim_hits), the
        full stage-2 rescore ON the static [S_pad, K] merge grid (no
        compaction: rescoring the <=35% dead slots costs less than the
        compaction scatter + per-item spectrum gathers it replaces, and
        the stage-2 candidate budget + overflow-redo machinery disappear
        entirely), and a per-spectrum SELECTION of the top-Ksel
        candidates by an f32 hyperscore order key (the reference's
        score_standard sort, scoring.rs:495). Only the selected rows
        (plus per-spectrum statistics) return to the host — the fetch
        shrinks from O(candidates) to O(spectra x Ksel), and the
        host-side PreScore merge + candidate ranking disappear entirely.

        The f32 order key can misorder candidates whose f64 hyperscores
        differ by less than f32 rounding, so the program also returns the
        best UNSELECTED key per spectrum (`b32`); the host verifies the
        selection against it with exact f64 arithmetic and falls back to
        the untruncated candidate list (kept on device) for the rare
        spectrum that trips the guard — results stay byte-identical to
        the two-dispatch path (see _fused_finalize).

        ``plan``: tuple of (Wb, Lcb, Rb) segments; rows are assigned on
        the host (see _fused_dispatch) and carry their (spectrum, slot)
        coordinates, so rows-per-spectrum may be ragged up to G_eff.

        The per-segment stage-1 programs are dispatched SEPARATELY (their
        device-resident outputs feed this program as inputs): inlining
        them into one XLA program was measured 3.3x slower than the same
        segments as standalone executables — XLA's fusion/layout choices
        degrade across the segment boundaries — and the split costs only
        one extra async dispatch, not an extra fetch."""
        K = self.K
        K0 = K  # the merge keeps at most K candidates per spectrum
        Ksel = min(Ksel, K0)
        tables = self.tables
        series = self.series
        frag_tol = self.params.fragment_tol
        L = tables.L
        cfg = self.params.max_fragment_charge
        Zcap = self.Z
        min_matched = self.params.min_matched_peaks
        openms = self.params.score_type != SAGE_HYPERSCORE
        # f32 lnfact table for the device-side hyperscore ORDER key (the
        # exact f64 value is recomputed on host for the fetched rows)
        from .features import lnfact_vec

        lnf32 = jnp.asarray(
            lnfact_vec(np.arange(self.n_series * L * max(Zcap, 1) + 2))
            .astype(np.float32)
        )
        seg_meta = []
        off = 0
        for entry in plan:
            if entry[0] == "banded":
                # one pseudo-segment: the peak-major banded stage 1
                # already produced the [R, 2K+2] top-K layout for every
                # row in original order
                seg_meta.append((False, 1 << 30, entry[1], off))
                off += entry[1]
            else:
                Wb, Lcb, Rb = entry[0], entry[1], entry[2]
                seg_meta.append((Wb <= K, Wb, Rb, off))
                off += Rb
        # ladder rows for the rescore: the lane-padded 2D view gathers
        # ~50x faster than the 3D [S, L] form (see _build_stage2_compact)
        use_2d = tables.lad2d_full is not None
        n_series_f = len(series)

        def run_inner(lad_full, lnf, peaks_dev, ints, perm, tail_extra,
                      *seg_outs):
            # ints: [8, R_tot] i32 (spec, p0, i0, i1, maxz, z, iso, slot)
            # with spec == S_pad marking padding rows; perm: i32
            # [S_pad * G_eff] spectrum-major slot -> global stage-1 row
            # (host-computed; empty slots point at the all-zero sentinel
            # row R_tot); seg_outs: the stage-1 programs' packed outputs,
            # one per plan segment.
            canon = []
            for (co_b, Wb, Rb, o), packed in zip(seg_meta, seg_outs):
                if co_b:  # [Rb, Wb+2] raw window counts -> top-K layout
                    seg = jax.lax.slice_in_dim(ints, o, o + Rb, axis=1)
                    vals_b = packed[:, :Wb]
                    pep_b = seg[1][:, None] + jnp.arange(
                        Wb, dtype=jnp.int32
                    )[None, :]
                    if Wb < K:
                        vals_b = jnp.pad(vals_b, ((0, 0), (0, K - Wb)))
                        pep_b = jnp.pad(
                            pep_b, ((0, 0), (0, K - Wb)),
                            constant_values=-1,
                        )
                    canon.append(jnp.concatenate(
                        [vals_b, pep_b, packed[:, Wb : Wb + 2]], axis=1
                    ))
                else:  # [Rb, 2K+2] per-row top-K (vals, pep, mtot, scored)
                    canon.append(packed[:, : 2 * K + 2])
            sent = jnp.zeros((1, 2 * K + 2), jnp.int32).at[0, K : 2 * K]\
                .set(-1)
            allp = jnp.concatenate(canon + [sent], axis=0)
            g = allp[perm].reshape(S_pad, G_eff, 2 * K + 2)  # row gather
            mtot_s = jnp.sum(g[:, :, 2 * K], axis=1).astype(jnp.float32)
            scored_s = jnp.sum(
                g[:, :, 2 * K + 1], axis=1
            ).astype(jnp.float32)
            # per-slot charge/isotope straight from the row table
            z_cols = jnp.concatenate([ints[5], jnp.zeros(1, jnp.int32)])
            iso_cols = jnp.concatenate([ints[6], jnp.zeros(1, jnp.int32)])
            z_g = z_cols[perm].reshape(S_pad, G_eff)
            iso_g = iso_cols[perm].reshape(S_pad, G_eff)
            GK = G_eff * K
            counts2 = g[:, :, :K].reshape(S_pad, GK)
            pep2 = g[:, :, K : 2 * K].reshape(S_pad, GK)
            z2 = jnp.broadcast_to(
                z_g[:, :, None], (S_pad, G_eff, K)
            ).reshape(S_pad, GK)
            iso2 = jnp.broadcast_to(
                iso_g[:, :, None], (S_pad, G_eff, K)
            ).reshape(S_pad, GK)

            m_s, pep_s, z_s, iso_s = jax.lax.sort(
                (-counts2, -pep2, -z2, -iso2), dimension=1, num_keys=4,
            )
            m_s = -m_s[:, :K0]
            pep_s = -pep_s[:, :K0]
            z_s = -z_s[:, :K0]
            iso_s = -iso_s[:, :K0]

            mask = m_s > 0  # sorted desc: a prefix per spectrum
            cnt_s = jnp.sum(mask.astype(jnp.int32), axis=1)
            total = jnp.sum(cnt_s)
            # fallback slice bounds: spectrum s's items live at the fixed
            # stride rows [s*K0, s*K0 + cnt_s) of the flattened grid
            offs = jnp.arange(S_pad, dtype=jnp.int32) * np.int32(K0)

            # stage 2 directly on the [S_pad, K0] merge grid: no
            # compaction scatter, no per-item spectrum gathers (peaks
            # broadcast per spectrum), no candidate budget to overflow
            cap = jnp.minimum(z_s, cfg + 1) if cfg is not None else z_s
            c_maxz = jnp.clip(jnp.maximum(cap, 2), 2, Zcap + 1)
            pep_i2 = jnp.maximum(pep_s, 0)  # dead slots rescore garbage,
            # masked out of every consumer below

            def per_item(pkm, pki, pep_i, mz_i):
                if use_2d:
                    f = lad_full[pep_i][: n_series_f * L].reshape(
                        n_series_f, L
                    )
                else:
                    f = lad_full[pep_i]
                return rescore_candidate(
                    f, None, pkm, pki, mz_i,
                    series=series, frag_tol=frag_tol, Z=Zb,
                )

            def per_spec(pkm, pki, peps, mzs):
                return jax.vmap(per_item, in_axes=(None, None, 0, 0))(
                    pkm, pki, peps, mzs
                )

            B_pk = peaks_dev.shape[1]
            if B_pk < S_pad:
                pkm_all = jnp.pad(
                    peaks_dev[0], ((0, S_pad - B_pk), (0, 0)),
                    constant_values=np.float32(np.inf),
                )
                pki_all = jnp.pad(
                    peaks_dev[1], ((0, S_pad - B_pk), (0, 0)),
                    constant_values=np.float32(-1.0),
                )
            else:
                pkm_all = peaks_dev[0][:S_pad]
                pki_all = peaks_dev[1][:S_pad]
            mb, my, sb, sy, pp, lb, ly = jax.vmap(per_spec)(
                pkm_all, pki_all, pep_i2, c_maxz
            )  # each [S_pad, K0]

            # ---- per-spectrum selection by the f32 hyperscore order key.
            # hs32 tracks hyperscore_vec's f64 arithmetic term-for-term
            # (scoring.rs:179-201); only its ORDER is consumed, and the
            # host guard bounds the f32/f64 divergence (see EPS in
            # _select_finalize).
            if openms:
                hs32 = jnp.log1p(sb + sy) + lnf[mb] + lnf[my]
            else:
                hs32 = (
                    jnp.log(sb + np.float32(1.0))
                    + jnp.log(sy + np.float32(1.0))
                    + lnf[mb] + lnf[my]
                )
            hs32 = jnp.where(jnp.isfinite(hs32), hs32, np.float32(255.0))
            # selection sort key is (ok desc, hs32 desc, rank asc) — the
            # rank tiebreak reproduces the host lexsort's stability.
            # Every selected column rides the sort as a PAYLOAD operand:
            # a 12-operand variadic sort costs ~1 ms where the previous
            # (key, col) sort + 10 take_along_axis gathers cost ~16 ms
            # (TPU per-element gathers run ~90 M elem/s).
            ok = mask & ((mb + my) >= min_matched)
            col = jnp.arange(K0, dtype=jnp.int32)[None, :]
            key = jnp.where(ok, hs32, np.float32(-np.inf))
            (skey, scol, s_mb, s_my, s_lb, s_ly, s_z, s_iso, s_pep,
             s_sb, s_sy, s_pp) = jax.lax.sort(
                (-key, jnp.broadcast_to(col, (S_pad, K0)),
                 mb, my, lb, ly, z_s, iso_s, pep_s, sb, sy, pp),
                dimension=1, num_keys=2,
            )
            sel_col = scol[:, :Ksel]                      # [S_pad, Ksel]
            n_ok = jnp.sum(ok.astype(jnp.int32), axis=1)
            # best UNSELECTED key per spectrum: the host-side safety bound
            b32 = (
                -skey[:, Ksel] if Ksel < K0
                else jnp.full((S_pad,), -np.inf, jnp.float32)
            )
            c_z = z_s
            c_iso = iso_s
            c_pep = pep_s

            # ---- packed small output: Ksel selected rows per spectrum,
            # one stats row per spectrum, one tail row. Integer fields
            # bit-pack into f32-exact 24-bit lanes (preconditions
            # enforced in _fused_dispatch: pep < 2^24, mb/my < 2^12,
            # lb/ly < 2^6, rank < 2^6, z < 2^5, |iso| <= 15):
            #   col0 mb*4096+my   col1 lb<<13 | ly<<7 | rank
            #   col2 z<<5 | iso+16  col3 pep  col4 sb  col5 sy  col6 ppm
            cA = (s_mb[:, :Ksel] * 4096 + s_my[:, :Ksel]).astype(jnp.float32)
            cB = (
                s_lb[:, :Ksel] * (1 << 13) + s_ly[:, :Ksel] * (1 << 7)
                + sel_col
            ).astype(jnp.float32)
            cC = (s_z[:, :Ksel] * (1 << 5) + (s_iso[:, :Ksel] + 16)).astype(
                jnp.float32
            )
            rows7 = jnp.stack(
                [cA, cB, cC, s_pep[:, :Ksel].astype(jnp.float32),
                 s_sb[:, :Ksel], s_sy[:, :Ksel], s_pp[:, :Ksel]],
                axis=-1,
            ).reshape(S_pad * Ksel, 7)
            # per-spectrum stats: b32, n_ok, matched_total, scored,
            # compact offset/count (the fallback's slice bounds)
            stats = jnp.stack(
                [
                    b32, n_ok.astype(jnp.float32), mtot_s, scored_s,
                    offs.astype(jnp.float32), cnt_s.astype(jnp.float32),
                    jnp.zeros(S_pad, jnp.float32),
                ],
                axis=1,
            )  # [S_pad, 7]
            tail = (
                jnp.zeros((1, 7), jnp.float32)
                .at[0, 0].set(total.astype(jnp.float32))
            )
            # up to 6 extra device-computed scalars ride the tail row
            # (e.g. one (entries, rows) overflow pair per open size
            # class); the shape is static per trace
            for j in range(min(int(tail_extra.shape[0]), 6)):
                tail = tail.at[0, 1 + j].set(
                    tail_extra[j].astype(jnp.float32)
                )
            small = jnp.concatenate([rows7, stats, tail], axis=0)

            # ---- untruncated per-item arrays, kept ON DEVICE for the
            # guard-failure fallback (fetched only when a spectrum trips);
            # flattened so spectrum s's items are rows s*K0 .. s*K0+cnt_s
            spec_ids = jnp.broadcast_to(
                jnp.arange(S_pad, dtype=jnp.int32)[:, None], (S_pad, K0)
            )
            items7 = jnp.stack(
                [mb.reshape(-1).astype(jnp.float32),
                 my.reshape(-1).astype(jnp.float32),
                 sb.reshape(-1), sy.reshape(-1), pp.reshape(-1),
                 lb.reshape(-1).astype(jnp.float32),
                 ly.reshape(-1).astype(jnp.float32)],
                axis=1,
            )  # [S_pad*K0, 7]
            meta = jnp.stack(
                [c_pep.reshape(-1), c_z.reshape(-1), c_iso.reshape(-1),
                 spec_ids.reshape(-1)],
                axis=1,
            )  # [S_pad*K0, 4]
            return small, items7, meta

        jitted = jax.jit(run_inner)
        _zero_tail = jnp.zeros(1, jnp.int32)

        def run(peaks_dev, ints, perm, seg_outs, tail_extra=None):
            return jitted(
                tables.lad2d_full if use_2d else tables.lad_full,
                lnf32, peaks_dev, ints, perm,
                _zero_tail if tail_extra is None else tail_extra,
                *seg_outs,
            )

        return run

    def _fused(self, plan, Pk, S_pad, G_eff, Zb, Ksel):
        key = ("f", plan, Pk, S_pad, G_eff, Zb, Ksel)
        if key not in self._stage1_cache:
            self._stage1_cache[key] = self._build_fused(
                plan, Pk, S_pad, G_eff, Zb, Ksel
            )
        return self._stage1_cache[key]

    def _sticky_classes(self, rows, n_rows, W):
        """(Wb, Lcb) stage-1 classes for the fused plan, STICKY per
        (W, L): derived from `_row_buckets` on the first batch and
        reused verbatim afterwards, so the fused program's compiled
        shape set stays stable across batches (only the pow2 per-class
        row counts vary). The top class is widened to (W, L) as a
        catch-all so any later row fits."""
        L = self.tables.L
        key = (W, L)
        cls = self._plan_sticky.get(key)
        if cls is None:
            buckets = self._row_buckets(rows, n_rows, W)
            cls = (
                sorted({(int(b[0]), int(b[1] if b[1] is not None else L))
                        for b in buckets})
                if buckets else []
            )
            if (W, L) not in cls:
                cls.append((W, L))
            cls = tuple(sorted(cls))
            # only a SUBSTANTIAL batch may pin the sticky set: a tiny
            # or trailing first batch would degenerate to the (W, L)
            # catch-all and permanently forfeit the 2D bucketing win
            if n_rows >= 1024:
                self._plan_sticky[key] = cls
        return cls

    def _lens_blk(self):
        if getattr(self, "_lens_blk_cache", None) is None:
            self._lens_blk_cache = _lens_blockmax(self.db.table.lens)
        return self._lens_blk_cache

    def _narrow_banded_maybe(self, W: int):
        """The peak-major banded stage 1 (ops/narrow_banded.py), when it
        pays: wide-enough candidate windows on a large-enough fragment
        index (the candidate-major compare is cheaper below that)."""
        import os

        env = os.environ.get("SAGE_TPU_NARROW_BANDED", "")
        if env == "0" or self.db.fragment_mz_flat is None:
            return None
        # Auto gate: the device binary search over the banded fragment
        # index is HBM-gather-bound (~10-20 ns per probe), so on v5e the
        # dense candidate-major segments WIN until the window is so wide
        # that their O(W x L x Pk) compare volume dwarfs the ~2M fixed
        # probes — measured crossover is far beyond proteome-narrow
        # shapes. "1" forces (tests / wide-mass regimes).
        if env != "1" and (
            W < 4096 or self.db.num_fragments < (1 << 19)
        ):
            return None
        if getattr(self, "_nb", None) is None:
            from .narrow_banded import NarrowBanded

            self._nb = NarrowBanded(self.db, self.K)
        return self._nb

    def _ksel(self) -> int:
        """Selected rows fetched per spectrum: the reported PSMs, the
        runner-up delta_next needs, plus headroom for isotope-error
        twins (the same peptide re-queried at shifted windows produces
        EXACTLY equal hyperscores, which cluster at the selection
        boundary) and for f32 near-ties."""
        import os

        env = os.environ.get("SAGE_TPU_KSEL")
        if env:
            return max(int(env), self.params.report_psms + 1)
        p = self.params
        n_iso = max(p.max_isotope_err - p.min_isotope_err + 1, 1)
        # +14 headroom: tie clusters (I/L-identical peptides score
        # EXACTLY equal) straddling a shallower boundary tripped the
        # guard on ~0.2% of spectra, costing one extra fetch round trip
        # per batch; at this depth zero fallbacks were observed across
        # 164k synthetic-bench spectra, and the deeper fetch rides the
        # downlink concurrently with the next batch's upload
        return p.report_psms + n_iso + 14

    def _ksel_open(self) -> int:
        """Open-search selection depth: wide windows yield dense
        near-tie clusters at the boundary (hundreds of co-matching
        candidates), so a deeper fetch sharply cuts guard fallbacks."""
        import os

        env = os.environ.get("SAGE_TPU_KSEL_OPEN")
        if env:
            return max(int(env), self.params.report_psms + 1)
        return self._ksel() + 5

    def _fused_dispatch(self, spectra, masses, intens, Pk, peaks_dev,
                        rows=None, timings=None, capture=None):
        """Try the fused path; returns None when its preconditions don't
        hold (non-uniform row counts, open-search window, huge table).
        ``rows`` may be passed in so a fallback to the classic path
        doesn't re-expand.

        ``timings``: optional dict; when given, blocking scalar fetches
        are inserted after the stage-1 segments and after the merge
        program, accumulating wall seconds into ``host_prep_s``,
        ``s1_device_s`` and ``merge_device_s``. NOTE these phase terms
        each include a device fetch, which on tunneled links costs 2-3x
        the nominal RTT — they bound latency, not device execution; for
        true execution time use ``capture`` + devprof.chained_exec_s.
        Zero overhead when None.

        ``capture``: optional dict; when given (and the batch used the
        2D-class narrow plan), filled with the device-resident pieces of
        this batch's programs — ``segs`` [(run_b, ints_seg_dev), ...],
        ``fn``, ``ints_dev``, ``peaks_dev``, ``seg_outs`` — so a profiler
        can re-execute them in a data-dependent chain."""
        import os
        import time as _time

        _t0 = _time.perf_counter() if timings is not None else 0.0

        # bit-packing preconditions (see _build_fused's output layout)
        if (
            self.tables.lad_full is None
            or len(self.db) >= (1 << 24)
            or self.tables.L >= 64
            or self.K >= 128  # merge rank must fit its 7-bit lane
            or self.params.max_precursor_charge >= 32
            or self.params.min_isotope_err < -16
            or self.params.max_isotope_err > 15
        ):
            return None
        if os.environ.get("SAGE_TPU_FUSED", "1") == "0":
            return None
        if rows is None:
            rows = self._expand_rows(spectra)
        # file-annotated precursor charges bypass max_precursor_charge, so
        # the 5-bit charge lane must be checked against the actual rows
        if rows["z"].size and int(rows["z"].max()) >= 32:
            return None
        n_rows = rows["si"].size
        n_spec = len(spectra)
        if n_rows == 0:
            return None
        max_win = int((rows["i1"] - rows["i0"]).max())
        W = min(next_power_of_two(max(max_win, 8)), self.tables.P_pad)
        open_regime = self._open_path(W)
        if open_regime and os.environ.get("SAGE_TPU_OPEN_SELECT", "1") == "0":
            return None

        S_pad = _pad_count(n_spec)
        si = rows["si"]
        # within-spectrum row ordinal (rows are spectrum-grouped); the
        # merge grid slot coordinate — rows per spectrum may be ragged
        starts = np.r_[0, np.flatnonzero(np.diff(si)) + 1]
        counts_r = np.diff(np.r_[starts, n_rows])
        slot = (np.arange(n_rows) - np.repeat(starts, counts_r)).astype(
            np.int32
        )
        G_eff = next_power_of_two(max(int(slot.max()) + 1, 1))

        cfg = self.params.max_fragment_charge
        cap = np.minimum(rows["z"], cfg + 1) if cfg is not None else rows["z"]
        maxz = np.maximum(cap, 2)
        Zb = min(max(int(maxz.max()) - 1, 1), self.Z)
        width = (rows["i1"] - rows["i0"]).astype(np.int64)

        open_geom = None
        open_sticky = None
        if open_regime:
            # open regime: the peak-major open stage 1 produces the same
            # [R, 2K+2] pseudo-segment layout — device count + merge/
            # rescore/select exactly as narrow. Range planning has two
            # modes: the first (or any split/oversized) batch plans on
            # the host (searchsorted ranges; measured ~96 ms per
            # 512-spectrum batch at 16 bands, plus a ~4 MiB upload) and
            # records quarter-octave STICKY static shapes; every later
            # batch computes its ranges ON DEVICE (ranges_device, bit-
            # identical) under the sticky shapes, with a device-computed
            # overflow check that falls back + grows on violation.
            from .open_search import covered_bands, spectrum_window_union

            os_ = self._open_searcher()
            stk = getattr(os_, "_sticky_shapes", None)
            u0_d, u1_d = spectrum_window_union(rows, n_spec)
            b0_u, _b1, nbcov_u = covered_bands(
                u0_d, u1_d, os_.band_w, os_.n_bands, n_spec
            )
            sticky_ok = False
            ci_pred = None
            valid_pred = None
            if (
                os.environ.get("SAGE_TPU_OPEN_DEV_RANGES", "1") != "0"
                and stk is not None
            ):
                # class-aware element budget: each live (spectrum,
                # band) SLOT rides its own size class, so the footprint
                # is the per-slot sum, not n_spec x nbcov x the top
                # class's F
                classes_s = stk.get("classes") or [{"F": stk["F"]}]
                eb_pred, valid_pred = os_.est_band_sizes(
                    masses, u0_d, u1_d
                )
                ci_pred = os_.assign_classes(eb_pred)
                if ci_pred is None or len(classes_s) == 1:
                    elems = n_spec * nbcov_u * stk["F"]
                else:
                    cif = ci_pred[valid_pred]
                    elems = sum(
                        int((cif == c).sum()) * classes_s[c]["F"]
                        for c in range(len(classes_s))
                    )
                sticky_ok = elems <= os_.MAX_ELEMENTS
            if sticky_ok:
                open_sticky = dict(stk)
                open_sticky["ci"] = ci_pred
                open_sticky["ci_valid"] = valid_pred
            else:
                geom = os_._geometry(masses, rows, Zb, None)
                (g_starts, g_lens, Pk_eff, chunked, size, Wc, F_open,
                 nbcov_g) = geom
                split = os_._find_split(n_spec, size, nbcov_g)
                if split is not None:
                    # one split level is expressible as two pseudo-
                    # segments; deeper recursion goes classic
                    for s_ids in (np.flatnonzero(split),
                                  np.flatnonzero(~split)):
                        if s_ids.size and (
                            s_ids.size * nbcov_g
                            * (int(size[s_ids].max()) + 1)
                            > os_.MAX_ELEMENTS
                        ):
                            return None
                open_geom = (
                    os_, g_starts, g_lens, Pk_eff, chunked, Wc, F_open,
                    split, size, nbcov_g,
                )

        nb_obj = None if open_regime else self._narrow_banded_maybe(W)
        open_segs = None
        if open_sticky is not None:
            from .open_search import (
                V_ROW as V_ROW_OS,
                _quarter_octave as _qoct_os,
                _range_stats,
            )

            nbc = nbcov_u
            Pk_eff = int(masses.shape[1])
            chunked = open_sticky["chunked"]
            classes = open_sticky.get("classes") or [
                {"Wc": open_sticky["Wc"], "F": open_sticky["F"]}
            ]
            # SLOT SIZE-CLASS membership by the host density proxy:
            # padding every (spectrum, band) slot's entry axis to the
            # batch max measured ~5x the true sort/count work (slot
            # totals vary ~10x across spectra AND across one spectrum's
            # bands). Each live slot becomes its own pseudo-row in the
            # class fitting its estimate; the outer merge program
            # recombines a spectrum's slots exactly (its 4-key PreScore
            # sort and stat sums are the same union the in-core
            # band-major merge computed). Membership is only a
            # prediction — each class's capacity is device-checked
            # below and grown on violation.
            ci = open_sticky.get("ci")
            valid_b = open_sticky.get("ci_valid")
            if ci is None:
                eb_s, valid_b = os_.est_band_sizes(masses, u0_d, u1_d)
                ci = os_.assign_classes(eb_s)
            if ci is not None and (
                ci.ndim != 2 or ci.shape != (n_spec, nbc)
            ):
                ci = None  # defensive: slot layout mismatch
            if ci is None or len(classes) == 1:
                # single-class whole-batch layout (band-major core,
                # grid range probe)
                st_dev, ln_dev, nbc = os_.ranges_device(
                    peaks_dev, u0_d, u1_d, Zb
                )
                if capture is not None:
                    # the range probe is real device time: the bench's
                    # open exec split chains it ahead of the counts
                    capture["open_ranges"] = (os_, u0_d, u1_d, Zb)
                Pk_eff = int(st_dev.shape[1]) // max(Zb * nbc, 1)
                cl = classes[-1]
                Wc_b, F_b = cl["Wc"], cl["F"]
                if chunked:
                    F_b = min(F_b, Wc_b * V_ROW_OS)
                R_b = next_power_of_two(max(n_rows, 8))
                lspec = np.full(R_b, n_spec, np.int32)
                li0 = np.zeros(R_b, np.int32)
                li1 = np.zeros(R_b, np.int32)
                lmz = np.full(R_b, 2, np.int32)
                lspec[:n_rows] = si
                li0[:n_rows] = rows["i0"]
                li1[:n_rows] = rows["i1"]
                lmz[:n_rows] = maxz
                open_segs = [{
                    "os": os_, "spec_ids": np.arange(n_spec),
                    "rows_idx": np.arange(n_rows),
                    "R_b": R_b, "F_b": F_b, "Wc_b": Wc_b,
                    "chunked": chunked, "Pk_eff": Pk_eff, "nbcov": nbc,
                    "starts": st_dev, "lens": ln_dev,
                    "lspec": lspec, "li0": li0, "li1": li1, "lmz": lmz,
                }]
                plan = (("banded", R_b),)
                ints = np.zeros((8, R_b), dtype=np.int32)
                ints[0] = S_pad
                ints[4] = 2
                ints[0, :n_rows] = si
                ints[2, :n_rows] = rows["i0"]
                ints[3, :n_rows] = rows["i1"]
                ints[4, :n_rows] = maxz
                ints[5, :n_rows] = rows["z"]
                ints[6, :n_rows] = rows["iso"]
                ints[7, :n_rows] = slot
                open_sticky["stats"] = _range_stats(
                    st_dev, ln_dev, nbcov=nbc, Zb=Zb, Pk=Pk_eff
                )
                open_sticky["cls_of_side"] = [len(classes) - 1]
                open_sticky["F_effs"] = [F_b]
                open_sticky["Wcs"] = [Wc_b]
            else:
                # the range probe itself runs SLOT-MAJOR per class
                # (ranges_device_slots): only live slots are probed —
                # the [B, nbcov] grid probe also paid gathers for every
                # dead covered-band padding slot (~1/3 of the grid) and
                # its descriptor-bound gathers were half the open-search
                # device time
                ci_flat = ci.reshape(-1)
                live = valid_b.reshape(-1)
                open_segs = []
                plan_l = []
                stats_l = []
                F_effs = []
                Wcs = []
                cls_of_side = []
                ints_cols = []
                for c in range(len(classes)):
                    slot_ids = np.flatnonzero(live & (ci_flat == c))
                    if slot_ids.size == 0:
                        continue
                    cl = classes[c]
                    Wc_b, F_b = cl["Wc"], cl["F"]
                    if chunked:
                        F_b = min(F_b, Wc_b * V_ROW_OS)
                    s_arr = slot_ids // nbc
                    k_arr = slot_ids % nbc
                    # quarter-octave-padded slot axis; padded rows are
                    # invalid and probe to all-zero ranges
                    n_sl = slot_ids.size
                    NS_pad = _qoct_os(max(n_sl, 8))
                    spec_p = np.zeros(NS_pad, np.int32)
                    band_p = np.zeros(NS_pad, np.int32)
                    valid_p = np.zeros(NS_pad, bool)
                    spec_p[:n_sl] = s_arr
                    band_p[:n_sl] = np.clip(
                        b0_u[s_arr] + k_arr, 0, os_.n_bands - 1
                    )
                    valid_p[:n_sl] = True
                    # pseudo-rows: every query row of each slot's
                    # spectrum, one per (row, band slot)
                    cnts = counts_r[s_arr]
                    n_ps = int(cnts.sum())
                    ps_local = np.repeat(
                        np.arange(slot_ids.size), cnts
                    )  # local slot index per pseudo-row
                    cum0 = np.concatenate([[0], np.cumsum(cnts)[:-1]])
                    r_idx = (
                        np.repeat(starts[s_arr], cnts)
                        + (np.arange(n_ps) - np.repeat(cum0, cnts))
                    ).astype(np.int64)
                    R_b = next_power_of_two(max(n_ps, 8))
                    lspec = np.full(R_b, slot_ids.size, np.int32)
                    li0 = np.zeros(R_b, np.int32)
                    li1 = np.zeros(R_b, np.int32)
                    lmz = np.full(R_b, 2, np.int32)
                    lspec[:n_ps] = ps_local
                    li0[:n_ps] = rows["i0"][r_idx]
                    li1[:n_ps] = rows["i1"][r_idx]
                    lmz[:n_ps] = maxz[r_idx]
                    st_c, ln_c = os_.ranges_device_slots(
                        peaks_dev, spec_p, band_p, valid_p, Zb
                    )
                    open_segs.append({
                        "os": os_, "spec_ids": None,
                        "slot_ids": slot_ids, "rows_idx": r_idx,
                        "R_b": R_b, "F_b": F_b, "Wc_b": Wc_b,
                        "chunked": chunked, "Pk_eff": Pk_eff,
                        "nbcov": 1,
                        "starts": st_c, "lens": ln_c,
                        "rng": (os_, spec_p, band_p, valid_p, Zb),
                        "lspec": lspec, "li0": li0, "li1": li1,
                        "lmz": lmz,
                    })
                    plan_l.append(("banded", R_b))
                    stats_l.append(_range_stats(
                        st_c, ln_c, nbcov=1, Zb=Zb, Pk=Pk_eff
                    ))
                    F_effs.append(F_b)
                    Wcs.append(Wc_b)
                    cls_of_side.append(c)
                    # merge coordinates: one slot per (query row, band)
                    cols = np.zeros((8, R_b), np.int32)
                    cols[0] = S_pad
                    cols[4] = 2
                    cols[0, :n_ps] = si[r_idx]
                    cols[2, :n_ps] = rows["i0"][r_idx]
                    cols[3, :n_ps] = rows["i1"][r_idx]
                    cols[4, :n_ps] = maxz[r_idx]
                    cols[5, :n_ps] = rows["z"][r_idx]
                    cols[6, :n_ps] = rows["iso"][r_idx]
                    cols[7, :n_ps] = (
                        slot[r_idx] * nbc + np.repeat(k_arr, cnts)
                    ).astype(np.int32)
                    ints_cols.append(cols)
                plan = tuple(plan_l)
                ints = np.concatenate(ints_cols, axis=1)
                # merge-grid slots are (query row, band) pairs now
                G_eff = next_power_of_two(
                    max((int(slot.max(initial=0)) + 1) * nbc, 1)
                )
                open_sticky["stats"] = jnp.concatenate(stats_l)
                open_sticky["cls_of_side"] = cls_of_side
                open_sticky["F_effs"] = F_effs
                open_sticky["Wcs"] = Wcs
            open_sticky["os"] = os_
        elif open_geom is not None:
            from .open_search import V_ROW as V_ROW_OS
            from .open_search import _quarter_octave

            (os_, g_starts, g_lens, Pk_eff, chunked, Wc, F_all, split,
             size, nbcov_g) = open_geom
            # per-spectrum max over covered bands of that band's entry
            # count — the unit the band-major count core pads F to
            tot_sb = g_lens.reshape(
                n_spec, Zb, nbcov_g, Pk_eff
            ).sum(axis=(1, 3))                       # [B, nbcov] slots
            totals = tot_sb.max(axis=1)
            g_ends = g_starts + g_lens
            rows_sb = np.where(
                g_lens > 0,
                (g_ends + (V_ROW_OS - 1)) // V_ROW_OS
                - g_starts // V_ROW_OS,
                0,
            ).reshape(n_spec, Zb, nbcov_g, Pk_eff).sum(axis=(1, 3))
            eb_t, valid_t = os_.est_band_sizes(masses, u0_d, u1_d)
            # record sticky shapes WITH slot size classes: the host-
            # planned batch knows every (spectrum, band) slot's true
            # entry totals, so it both sizes the classes and calibrates
            # the est->size scale the device-planned batches assign
            # membership with
            os_.note_shapes(
                chunked, Wc, int(totals.max(initial=0)),
                slot_sizes=tot_sb.astype(np.float64),
                slot_ests=(
                    eb_t if eb_t.shape == tot_sb.shape else None
                ),
                slot_valid=valid_t
                if valid_t.shape == tot_sb.shape else None,
                slot_rows=rows_sb.astype(np.float64),
            )
            sides = (
                [np.arange(n_spec)] if split is None
                else [np.flatnonzero(split), np.flatnonzero(~split)]
            )
            open_segs = []
            plan_l = []
            parts = []
            whole = len(sides) == 1
            for spec_ids in sides:
                rows_idx = (
                    np.arange(n_rows)
                    if whole
                    else np.flatnonzero(np.isin(si, spec_ids))
                )
                R_b = next_power_of_two(max(rows_idx.size, 8))
                if chunked:
                    tc_b = size[spec_ids] // max(V_ROW_OS, 1)
                    Wc_b = _quarter_octave(max(int(tc_b.max(initial=8)), 8))
                else:
                    Wc_b = 8
                F_b = _quarter_octave(
                    int(totals[spec_ids].max(initial=0)) + 1
                )
                F_b = ((max(F_b, self.K, 128) + 127) // 128) * 128
                if chunked:
                    F_b = min(F_b, Wc_b * V_ROW_OS)
                lspec = np.full(R_b, spec_ids.size, np.int32)  # sentinel
                li0 = np.zeros(R_b, np.int32)
                li1 = np.zeros(R_b, np.int32)
                lmz = np.full(R_b, 2, np.int32)
                nb_r = rows_idx.size
                if whole:
                    lspec[:nb_r] = si
                else:
                    remap = np.full(n_spec, -1, np.int64)
                    remap[spec_ids] = np.arange(spec_ids.size)
                    lspec[:nb_r] = remap[si[rows_idx]]
                li0[:nb_r] = rows["i0"][rows_idx]
                li1[:nb_r] = rows["i1"][rows_idx]
                lmz[:nb_r] = maxz[rows_idx]
                open_segs.append({
                    "os": os_, "spec_ids": spec_ids, "rows_idx": rows_idx,
                    "R_b": R_b, "F_b": F_b, "Wc_b": Wc_b,
                    "chunked": chunked, "Pk_eff": Pk_eff,
                    "nbcov": nbcov_g,
                    "starts": g_starts if whole else g_starts[spec_ids],
                    "lens": g_lens if whole else g_lens[spec_ids],
                    "lspec": lspec, "li0": li0, "li1": li1, "lmz": lmz,
                })
                plan_l.append(("banded", R_b))
                parts.append(rows_idx)
            plan = tuple(plan_l)
            R_tot = sum(p[1] for p in plan)
            ints = np.zeros((8, R_tot), dtype=np.int32)
            ints[0] = S_pad
            ints[4] = 2
            off = 0
            for seg, rows_idx in zip(open_segs, parts):
                nb_r = rows_idx.size
                sl = slice(off, off + nb_r)
                ints[0, sl] = si[rows_idx]
                ints[2, sl] = rows["i0"][rows_idx]
                ints[3, sl] = rows["i1"][rows_idx]
                ints[4, sl] = maxz[rows_idx]
                ints[5, sl] = rows["z"][rows_idx]
                ints[6, sl] = rows["iso"][rows_idx]
                ints[7, sl] = slot[rows_idx]
                off += seg["R_b"]
        elif nb_obj is not None:
            # peak-major banded stage 1: one pseudo-segment covering all
            # rows in original order (see ops/narrow_banded.py)
            R_pad = next_power_of_two(max(n_rows, 8))
            plan = (("banded", R_pad),)
            ints = np.zeros((8, R_pad), dtype=np.int32)
            ints[0] = S_pad
            ints[4] = 2
            ints[0, :n_rows] = si
            ints[2, :n_rows] = rows["i0"]
            ints[3, :n_rows] = rows["i1"]
            ints[4, :n_rows] = maxz
            ints[5, :n_rows] = rows["z"]
            ints[6, :n_rows] = rows["iso"]
            ints[7, :n_rows] = slot
        else:
            # 2D (width, ladder-length) class plan: sticky classes, pow2
            # per-class row counts — the fused program recompiles only
            # when a class's row count crosses a pow2 boundary
            lneed = _window_lneed(
                self.db.table.lens, rows["i0"], rows["i1"],
                blkmax=self._lens_blk(),
            )
            classes = self._sticky_classes(rows, n_rows, W)
            assign = np.full(n_rows, -1, np.int64)
            for ci, (Wb, Lcb) in enumerate(classes):
                m = (assign < 0) & (width <= Wb) & (lneed <= Lcb)
                assign[m] = ci

            plan = []
            segs = []
            for ci, (Wb, Lcb) in enumerate(classes):
                idx = np.flatnonzero(assign == ci)
                if Zb > 1:
                    # z-split: rows whose fragment-charge bound is 2
                    # (charge-2 precursors) never populate the z>=2
                    # compare planes — give them a Zc=1 program and skip
                    # ~half their stage-1 work. Both sub-segments always
                    # exist (a missing side is an 8-row stub) so the
                    # plan's shape set stays stable across batches.
                    z1 = idx[maxz[idx] <= 2]
                    z2 = idx[maxz[idx] > 2]
                    parts2 = [(z1, 1), (z2, Zb)]
                else:
                    parts2 = [(idx, Zb)]
                from .open_search import _quarter_octave as _qoct

                for idx_p, Zc in parts2:
                    # quarter-octave row padding: pow2 wasted up to 2x
                    # of a segment's rows (1533 -> 2048); {1, 1.25, 1.5,
                    # 1.75} x 2^k keeps it under 12.5%
                    plan.append((
                        Wb, Lcb, _qoct(max(idx_p.size, 8)), Zc,
                    ))
                    segs.append(idx_p)
            plan = tuple(plan)
            R_tot = sum(p[2] for p in plan)
            ints = np.zeros((8, R_tot), dtype=np.int32)
            ints[0] = S_pad  # padding sentinel: scatters to the dump row
            ints[4] = 2
            off = 0
            for (Wb, Lcb, Rb, _Zc), idx in zip(plan, segs):
                nb = idx.size
                sl = slice(off, off + nb)
                ints[0, sl] = si[idx]
                ints[1, sl] = np.minimum(
                    rows["i0"][idx], self.tables.P_pad - Wb
                )
                ints[2, sl] = rows["i0"][idx]
                ints[3, sl] = rows["i1"][idx]
                ints[4, sl] = maxz[idx]
                ints[5, sl] = rows["z"][idx]
                ints[6, sl] = rows["iso"][idx]
                ints[7, sl] = slot[idx]
                off += Rb

        # clamped HERE so the finalize unpacks exactly what the program
        # emitted (the builder applies the same clamp)
        k_row = self.K  # merge keeps at most K per spectrum either way
        Ksel = min(
            self._ksel_open() if open_regime else self._ksel(), k_row
        )

        fn = self._fused(plan, Pk, S_pad, G_eff, Zb, Ksel)
        # spectrum-major slot -> global stage-1 row permutation: the
        # merge program GATHERS rows into its [S_pad, G_eff] grid
        # (device scatters measured ~30x slower than row gathers here);
        # empty slots point at the program's all-zero sentinel row
        R_tot_rows = ints.shape[1]
        perm = np.full(S_pad * G_eff, R_tot_rows, np.int64)
        live_r = ints[0] < S_pad
        perm[
            ints[0, live_r].astype(np.int64) * G_eff + ints[7, live_r]
        ] = np.flatnonzero(live_r)
        perm_dev = jnp.asarray(perm.astype(np.int32))
        # dispatch each stage-1 segment as its own (cached) executable —
        # measured 3.3x faster than inlining them into the merge program
        # — with outputs left on device; the merge/rescore/select program
        # consumes them and only its small output is fetched
        ints_dev = jnp.asarray(ints)
        if timings is not None:
            timings["host_prep_s"] = (
                timings.get("host_prep_s", 0.0)
                + _time.perf_counter() - _t0
            )
            _t0 = _time.perf_counter()
        tail_extra = None
        nb_F = None
        if open_segs is not None:
            from .open_search import _device_open_count
            from .pallas_sort import use_pallas_sort

            if open_sticky is not None:
                tail_extra = open_sticky.pop("stats")
            seg_outs = []
            for seg in open_segs:
                sd = (
                    seg["os"].frag_pep8_dev,
                    jnp.asarray(seg["starts"]), jnp.asarray(seg["lens"]),
                    jnp.asarray(seg["lspec"]), jnp.asarray(seg["li0"]),
                    jnp.asarray(seg["li1"]), jnp.asarray(seg["lmz"]),
                )
                kw = dict(
                    F=seg["F_b"], Wc=seg["Wc_b"], Pk=seg["Pk_eff"],
                    Z=Zb, K=self.K, R=seg["R_b"], chunked=seg["chunked"],
                    nbcov=seg.get("nbcov", 1),
                    psort=use_pallas_sort(seg["F_b"], seg["os"].n_pep),
                )
                seg_outs.append(_device_open_count(*sd, **kw))
                if capture is not None:
                    ids = seg.get("spec_ids")
                    if seg.get("rng") is not None:
                        tag = ("slotflat", seg["rng"])
                    elif ids is None or ids.size == n_spec:
                        tag = None
                    else:
                        tag = ("spec", np.asarray(ids))
                    capture.setdefault("open_segs", []).append(
                        (sd, kw, tag)
                    )
        elif nb_obj is not None:
            packed_b, totmax, nb_F = nb_obj.dispatch(
                peaks_dev, rows, ints_dev, plan[0][1], Zb,
                self.params.fragment_tol, Pk,
            )
            seg_outs = [packed_b]
            tail_extra = totmax
        else:
            seg_outs = []
            off = 0
            for entry, idx_p in zip(plan, segs):
                Wb, Lcb, Rb = entry[0], entry[1], entry[2]
                Zc = entry[3] if len(entry) > 3 else Zb
                if idx_p.size == 0:
                    # empty segment (e.g. the sticky catch-all class, or
                    # a z-split side with no rows this batch): per-
                    # program launch costs ~1.3 ms on this link, so
                    # substitute a cached zero output — the merge's perm
                    # never references its rows
                    co_e = Wb <= self.K
                    cols = (Wb + 2) if co_e else (2 * self.K + 2)
                    zkey = ("zeros", Rb, cols)
                    if zkey not in self._stage1_cache:
                        self._stage1_cache[zkey] = jnp.zeros(
                            (Rb, cols), jnp.int32
                        )
                    seg_outs.append(self._stage1_cache[zkey])
                    off += Rb
                    continue
                fnb, _co = self._stage1(Wb, Pk, Rb, Zc, Lcb)
                run_b = (
                    fnb._unpacked if getattr(fnb, "_packed", False) else fnb
                )
                # host-side slice + tiny upload: an eager device-slice op
                # per segment pays a full dispatch round trip on
                # tunneled links (~10 ms each, measured in host_prep)
                ints_seg = jnp.asarray(ints[:5, off : off + Rb])
                seg_outs.append(run_b(peaks_dev, ints_seg))
                if capture is not None:
                    capture.setdefault("segs", []).append(
                        (run_b, ints_seg)
                    )
                off += Rb
        if capture is not None:
            capture.update(
                fn=fn, ints_dev=ints_dev, peaks_dev=peaks_dev,
                seg_outs=seg_outs, perm_dev=perm_dev,
                plan=plan, Pk=Pk, Zb=Zb, S_pad=S_pad, Ksel=Ksel,
                n_series=self.n_series, L=self.tables.L, K=self.K,
            )
        if timings is not None:
            import jax as _jax

            # ONE jitted combiner per arity: eager per-array sums would
            # each pay a full dispatch round trip on tunneled links,
            # swamping the phase being measured
            comb = self._stage2_cache.setdefault(
                ("comb", len(seg_outs)),
                _jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs)),
            )
            _jax.device_get(comb(*seg_outs))
            timings["s1_device_s"] = (
                timings.get("s1_device_s", 0.0)
                + _time.perf_counter() - _t0
            )
            timings["n_dispatches"] = timings.get("n_dispatches", 0) + 1
            _t0 = _time.perf_counter()
        small, items7, meta = fn(
            peaks_dev, ints_dev, perm_dev, seg_outs, tail_extra
        )
        if timings is not None:
            import jax as _jax

            comb1 = self._stage2_cache.setdefault(
                ("comb", 1), _jax.jit(lambda x: jnp.sum(x))
            )
            _jax.device_get(comb1(small))
            timings["merge_device_s"] = (
                timings.get("merge_device_s", 0.0)
                + _time.perf_counter() - _t0
            )
        small.copy_to_host_async()
        return {
            "fused": small, "items7": items7, "meta": meta,
            "n_rows": n_rows, "n_spec": n_spec,
            "Bc": S_pad * self.K, "Ksel": Ksel,
            "S_pad": S_pad, "nb_F": nb_F, "nb_obj": nb_obj,
            "open_sticky": open_sticky,
        }

    # The device's hs32 and the host's f64 hyperscore consume the SAME
    # fetched f32 (mb, my, sb, sy), so their divergence is pure rounding:
    # a 3-4 term sum of log/table values each within ~2 ulps, bounded by
    # ~6 ulps of the result magnitude (|hyperscore| <= ~700 in practice,
    # ulp ~ 6e-5). EPS = 2e-3 is a >10x margin; a spectrum only falls
    # back when distinct candidates straddle the selection boundary
    # within EPS — exact ties at the boundary included, since the guard
    # cannot prove the unfetched twin identical.
    SELECT_EPS = 2e-3

    def _fused_finalize(self, spectra, d, masses, intens, Pk,
                        packed=None):
        """Unpack the fused-select fetch into the final FeatureTable;
        returns None on banded stage-1 entry-capacity overflow (caller
        reruns via the classic path after growing the capacity).

        Exactness: the device selected each spectrum's top-Ksel
        candidates by an f32 hyperscore ORDER key; this host side
        recomputes exact f64 hyperscores for the fetched rows, re-sorts,
        and verifies per spectrum that no unfetched candidate (whose f32
        key is bounded by the fetched ``b32``) could reach the reported
        set. Spectra that trip the guard are recomputed from the
        untruncated on-device candidate arrays — byte-identical output
        to the classic path, always."""
        if packed is None:
            packed = np.asarray(_dget(d["fused"]))
        S_pad, Ksel = d["S_pad"], d["Ksel"]
        n_spec = d["n_spec"]
        p = self.params
        r_psms = p.report_psms
        if d.get("nb_F") is not None:
            totmax = int(packed[-1, 1])
            if totmax >= d["nb_F"]:
                # banded entry capacity overflowed: results may have been
                # truncated — grow F and rerun via the classic path
                d["nb_obj"].grow_F(totmax)
                log.info(
                    "banded narrow stage-1 entry capacity %d exceeded "
                    "(max %d); growing", d["nb_F"], totmax,
                )
                return None
        ost = d.get("open_sticky")
        if ost is not None:
            # device-planned open batch: the device reported each size
            # class's true max per-(spectrum, band) entry/row totals
            # through the tail row — a sticky-shape violation means
            # truncated entries, so grow that class's sticky shapes and
            # rerun this batch via the classic (host-planned) path
            bad = False
            for i, c in enumerate(ost["cls_of_side"]):
                tot_e = int(packed[-1, 1 + 2 * i])
                tot_r = int(packed[-1, 2 + 2 * i])
                if tot_e >= ost["F_effs"][i] or (
                    ost["chunked"] and tot_r > ost["Wcs"][i]
                ):
                    ost["os"].grow_shapes(tot_e, tot_r, ci=c)
                    log.info(
                        "open sticky class %d shapes exceeded (entries "
                        "%d vs F %d, rows %d vs Wc %d); growing",
                        c, tot_e, ost["F_effs"][i], tot_r, ost["Wcs"][i],
                    )
                    bad = True
            if bad:
                return None
        rows7 = packed[: S_pad * Ksel].reshape(S_pad, Ksel, 7)[:n_spec]
        stats = packed[S_pad * Ksel : S_pad * Ksel + S_pad][:n_spec]

        b32 = stats[:, 0]
        n_ok = stats[:, 1].astype(np.int64)
        spec_matched = stats[:, 2].astype(np.int64)
        spec_scored = stats[:, 3].astype(np.int64)
        offs = stats[:, 4].astype(np.int64)
        cnt = stats[:, 5].astype(np.int64)
        # per-spectrum sums were accumulated in f32 on device: past 2^24
        # they lose integer exactness — fall back to the classic path
        # (never observed outside adversarial synthetics)
        if stats[:, 2:4].max(initial=0.0) >= float(1 << 24):
            return None

        # unpack the selected rows (see _build_fused's packed layout)
        cA = rows7[..., 0].astype(np.int64)
        cB = rows7[..., 1].astype(np.int64)
        cC = rows7[..., 2].astype(np.int64)
        mb = (cA // 4096).astype(np.int32)
        my = (cA % 4096).astype(np.int32)
        lb = (cB >> 13).astype(np.int32)
        ly = ((cB >> 7) & 63).astype(np.int32)
        mrank = (cB & 127).astype(np.int32)  # within-spectrum merge rank
        zc = (cC >> 5).astype(np.int32)
        iso = ((cC & 31) - 16).astype(np.int32)
        pep = rows7[..., 3].astype(np.int32)
        sb = rows7[..., 4].astype(np.float32)
        sy = rows7[..., 5].astype(np.float32)
        pps = rows7[..., 6].astype(np.float32)

        n_fetch = np.minimum(n_ok, Ksel)  # valid fetched rows/spectrum
        col = np.arange(Ksel, dtype=np.int64)[None, :]
        valid = col < n_fetch[:, None]

        # exact f64 hyperscore + host re-sort of the fetched rows by
        # (hs desc, merge rank asc) — the classic lexsort's exact order
        hs = hyperscore_vec(p.score_type, mb, my, sb, sy)
        hs = np.where(valid, hs, -np.inf)
        order = np.lexsort(
            (np.where(valid, mrank, 1 << 20), -hs), axis=1
        )
        take = np.take_along_axis

        def srt(x):
            return take(x, order, axis=1)

        hs_s = srt(hs)
        # the guard: every reported row and its delta_next source must
        # beat the best unselected candidate's f32 key by the f32/f64
        # divergence margin (spectra whose candidates were all fetched
        # are exact by construction)
        n_need = np.minimum(n_ok, r_psms + 1)
        last_needed = np.clip(n_need - 1, 0, Ksel - 1)
        need_hs = take(hs_s, last_needed[:, None], axis=1)[:, 0]
        with np.errstate(invalid="ignore"):
            # -inf + inf -> nan when the guard is forced wide open; the
            # nan compares False, i.e. falls back — the safe direction
            safe = (n_ok <= Ksel) | (need_hs > b32 + self.SELECT_EPS)
        failed = np.flatnonzero(~safe & (n_ok > 0))

        n_rep = np.minimum(n_ok, r_psms).astype(np.int64)
        rep_mask = col < n_rep[:, None]
        # delta_next: vs the next candidate in hs order (0 past the end)
        nxt = np.concatenate(
            [hs_s[:, 1:], np.full((hs_s.shape[0], 1), -np.inf)], axis=1
        )
        has_next = col + 1 < n_ok[:, None]
        with np.errstate(invalid="ignore"):
            # invalid slots hold -inf; their nan deltas are never read
            delta_next = hs_s - np.where(has_next, nxt, 0.0)
            delta_best = hs_s[:, :1] - hs_s

        cols = {
            "pep": srt(pep), "z": srt(zc), "iso": srt(iso),
            "mb": srt(mb), "my": srt(my), "sb": srt(sb), "sy": srt(sy),
            "pps": srt(pps), "lb": srt(lb), "ly": srt(ly),
        }

        if failed.size:
            self._select_fallback(
                failed, d, n_ok, r_psms, cols, hs_s, delta_next,
                delta_best, offs=offs, cnt=cnt,
            )

        ri, ci = np.nonzero(rep_mask)
        ssum = (cols["sb"][ri, ci] + cols["sy"][ri, ci]).astype(np.float32)
        ppm_sum = cols["pps"][ri, ci]
        ppm = np.where(
            ssum != 0,
            ppm_sum / np.where(ssum == 0, np.float32(1.0), ssum),
            0.0,
        ).astype(np.float32)
        return self._emit_table(
            spectra,
            s_of=ri.astype(np.int32), pep=cols["pep"][ri, ci],
            z_of=cols["z"][ri, ci], iso_i=cols["iso"][ri, ci],
            mb=cols["mb"][ri, ci], my=cols["my"][ri, ci],
            sb=cols["sb"][ri, ci], sy=cols["sy"][ri, ci], ppm=ppm,
            lb=cols["lb"][ri, ci], ly=cols["ly"][ri, ci],
            hs=hs_s[ri, ci], rank0=ci.astype(np.int32),
            delta_next=delta_next[ri, ci], delta_best=delta_best[ri, ci],
            spec_matched=spec_matched, spec_scored=spec_scored,
            tic_override=None, masses=masses, use_int=intens, Pk=Pk,
        )

    def _select_fallback(
        self, failed, d, n_ok, r_psms, cols, hs_s, delta_next, delta_best,
        offs=None, cnt=None,
    ):
        """Recompute the reported rows of guard-failed spectra from the
        untruncated on-device candidate arrays, overwriting the
        fetched-row views in place. Statistically rare (requires
        candidates within SELECT_EPS of each other straddling the Ksel
        boundary), and cheap when it happens: only the failed spectra's
        compact ranges are gathered on device and fetched in ONE round
        trip, not the whole Bc-sized arrays."""
        log.debug(
            "select guard: %d spectra fall back to the full candidate "
            "list", failed.size,
        )
        self.select_fallback_spectra = (
            getattr(self, "select_fallback_spectra", 0) + int(failed.size)
        )
        p = self.params
        min_m = p.min_matched_peaks
        if offs is not None and cnt is not None:
            # flat item indices of every failed spectrum's compact range
            take_idx = np.concatenate(
                [np.arange(offs[s], offs[s] + cnt[s]) for s in failed]
            ) if failed.size else np.zeros(0, np.int64)
            # floor of 4096 keeps the gather program's compiled shape
            # stable across fallback occurrences
            Np = next_power_of_two(max(int(take_idx.size), 4096))
            idx_pad = np.zeros(Np, np.int64)
            idx_pad[: take_idx.size] = take_idx
            gkey = ("selgather", Np)
            if gkey not in self._stage2_cache:
                self._stage2_cache[gkey] = jax.jit(
                    lambda a, b, i: jnp.concatenate(
                        [a[i], b[i].astype(jnp.float32)], axis=1
                    )
                )
            both = np.asarray(_dget(self._stage2_cache[gkey](
                d["items7"], d["meta"], jnp.asarray(idx_pad)
            )))[: take_idx.size]
            items7 = np.zeros((int(take_idx.max(initial=0)) + 1, 7),
                              np.float32)
            meta = np.zeros((items7.shape[0], 4), np.int32)
            items7[take_idx] = both[:, :7]
            meta[take_idx] = both[:, 7:].astype(np.int32)
        else:  # pragma: no cover - legacy full fetch
            items7 = np.asarray(_dget(d["items7"]))
            meta = np.asarray(_dget(d["meta"]))
        for s in failed:
            sel = (
                np.arange(offs[s], offs[s] + cnt[s])
                if offs is not None
                else np.flatnonzero(meta[:, 3] == s)
            )
            if sel.size == 0:
                continue
            f_mb = items7[sel, 0].astype(np.int32)
            f_my = items7[sel, 1].astype(np.int32)
            f_sb = items7[sel, 2]
            f_sy = items7[sel, 3]
            ok = (f_mb + f_my) >= min_m
            oi = np.flatnonzero(ok)
            f_hs = hyperscore_vec(
                p.score_type, f_mb[oi], f_my[oi], f_sb[oi], f_sy[oi]
            )
            # stable by (hs desc) keeps merge order for ties — `sel` is
            # already in within-spectrum merge-rank order
            o2 = np.argsort(-f_hs, kind="stable")
            src = sel[oi[o2]]
            k = min(src.size, hs_s.shape[1])
            n_ok[s] = oi.size
            for name, src_col in (
                ("mb", 0), ("my", 1), ("sb", 2), ("sy", 3), ("pps", 4),
                ("lb", 5), ("ly", 6),
            ):
                dst = cols[name]
                dst[s, :k] = items7[src[:k], src_col].astype(dst.dtype)
            cols["pep"][s, :k] = meta[src[:k], 0]
            cols["z"][s, :k] = meta[src[:k], 1]
            cols["iso"][s, :k] = meta[src[:k], 2]
            hs_sorted = f_hs[o2]
            hs_s[s, :k] = hs_sorted[:k]
            for j in range(min(k, r_psms)):
                delta_next[s, j] = hs_sorted[j] - (
                    hs_sorted[j + 1] if j + 1 < oi.size else 0.0
                )
                delta_best[s, j] = hs_sorted[0] - hs_sorted[j]

    def _prelim_dispatch(self, spectra, masses=None, peaks_dev=None,
                         rows=None):
        """Stage 1 + vectorized merge: per spectrum, the top-K preliminary
        candidates with the PreScore ordering (matched, peptide, charge,
        isotope — scoring.rs:43-49) plus Poisson statistics. Returns flat
        arrays grouped by spectrum (``spec_of`` ascending)."""
        p = self.params
        if rows is None:
            rows = self._expand_rows(spectra)
        if masses is None:
            masses, intens, Pk = self._pad_peaks(spectra)
            if peaks_dev is None:
                peaks_dev = jnp.asarray(np.stack([masses, intens]))
        else:
            Pk = masses.shape[1]
            if peaks_dev is None:
                peaks_dev = jnp.asarray(
                    np.stack([masses, np.zeros_like(masses)])
                )
        n_rows = rows["si"].size
        n_spec = len(spectra)

        max_win = int((rows["i1"] - rows["i0"]).max()) if n_rows else 1
        W = min(next_power_of_two(max(max_win, 8)), self.tables.P_pad)
        R = _pad_count(n_rows)

        spec_idx = np.zeros(R, dtype=np.int32)
        row_z = np.zeros(R, dtype=np.int32)
        row_iso = np.zeros(R, dtype=np.int32)
        p0 = np.zeros(R, dtype=np.int32)
        i0a = np.zeros(R, dtype=np.int32)
        i1a = np.zeros(R, dtype=np.int32)
        maxz = np.full(R, 2, dtype=np.int32)
        spec_idx[:n_rows] = rows["si"]
        row_z[:n_rows] = rows["z"]
        row_iso[:n_rows] = rows["iso"]
        p0[:n_rows] = np.minimum(rows["i0"], self.tables.P_pad - W)
        i0a[:n_rows] = rows["i0"]
        i1a[:n_rows] = rows["i1"]
        cfg = p.max_fragment_charge
        cap = np.minimum(rows["z"], cfg + 1) if cfg is not None else rows["z"]
        maxz[:n_rows] = np.maximum(cap, 2)
        # Padding rows target an empty window so they contribute nothing
        # (i0a/i1a stay 0 past n_rows).

        # Only compile/compute the charge planes this batch can reach.
        Zb = min(max(int(maxz[:n_rows].max()) - 1, 1), self.Z) if n_rows else 1
        if self._open_path(W):
            # Wide precursor windows (open search): peak-major counting
            # over the flat sorted fragment index instead of scanning a
            # near-table-wide candidate window per row.
            out_dev = self._open_searcher().preliminary_packed(
                masses, rows, maxz, R, Zb
            )
            return {
                "out_dev": out_dev, "counts_only": False,
                "n_rows": n_rows, "n_spec": n_spec, "W": W,
                "p0": p0, "spec_idx": spec_idx, "row_z": row_z,
                "row_iso": row_iso,
            }
        buckets = self._row_buckets(rows, n_rows, W)
        if buckets is not None:
            import os

            if os.environ.get("SAGE_TPU_WIDTH_BUCKETS") == "0":
                buckets = None
        if buckets is not None:
            # Dispatch each (window-width, ladder-length) class at its own
            # padded shape: stage-1 compute is proportional to W x Lc x
            # rows, widths are heavily skewed (p50 ~1/5 of the pow2 max at
            # proteome scale) and window mass anti-correlates width with
            # peptide length, so the 2D split recovers 2-4x of stage-1
            # compute for a few extra async dispatches.
            outs = []
            for Wb, Lcb, idx in buckets:
                nb = idx.size
                Rb = _pad_rows(nb)
                sub = {
                    "spec_idx": np.zeros(Rb, np.int32),
                    "p0": np.zeros(Rb, np.int32),
                    "i0": np.zeros(Rb, np.int32),
                    "i1": np.zeros(Rb, np.int32),
                    "maxz": np.full(Rb, 2, np.int32),
                    "z": np.zeros(Rb, np.int32),
                    "iso": np.zeros(Rb, np.int32),
                }
                sub["spec_idx"][:nb] = spec_idx[idx]
                sub["p0"][:nb] = np.minimum(
                    i0a[idx], self.tables.P_pad - Wb
                )
                sub["i0"][:nb] = i0a[idx]
                sub["i1"][:nb] = i1a[idx]
                sub["maxz"][:nb] = maxz[idx]
                sub["z"][:nb] = row_z[idx]
                sub["iso"][:nb] = row_iso[idx]
                fnb, co_b = self._stage1(Wb, Pk, Rb, Zb, Lcb)
                ints_b = np.stack(
                    [sub["spec_idx"], sub["p0"], sub["i0"], sub["i1"],
                     sub["maxz"]]
                )
                ints_b_dev = jnp.asarray(ints_b)
                out_b = fnb(peaks_dev, ints_b_dev)
                out_b.copy_to_host_async()
                packed_b = getattr(fnb, "_packed", False)
                outs.append({
                    "out_dev": out_b, "counts_only": co_b, "n_rows": nb,
                    "W": Wb, "Lc": Lcb, "p0": sub["p0"],
                    "spec_idx": sub["spec_idx"],
                    "row_z": sub["z"], "row_iso": sub["iso"],
                    "packed": packed_b,
                    "redo": (
                        lambda f=fnb, pd=peaks_dev, iv=ints_b_dev:
                        f._unpacked(pd, iv)
                    ) if packed_b else None,
                })
            return {"buckets": outs, "n_spec": n_spec}
        fn, counts_only = self._stage1(W, Pk, R, Zb)
        ints = np.stack([spec_idx, p0, i0a, i1a, maxz])  # one upload
        ints_dev = jnp.asarray(ints)
        out_dev = fn(peaks_dev, ints_dev)
        # Start the device->host copy as soon as the result is ready; by
        # finalize time the bytes are usually already on the host.
        out_dev.copy_to_host_async()
        packed = getattr(fn, "_packed", False)
        return {
            "out_dev": out_dev, "counts_only": counts_only,
            "n_rows": n_rows, "n_spec": n_spec, "W": W,
            "p0": p0, "spec_idx": spec_idx, "row_z": row_z, "row_iso": row_iso,
            "packed": packed,
            "redo": (
                lambda f=fn, pd=peaks_dev, iv=ints_dev: f._unpacked(pd, iv)
            ) if packed else None,
        }

    def _row_buckets(self, rows, n_rows, W):
        """Split query rows into up to 3 pow2 window-width classes x up
        to 3 ladder-length classes (each row lands in the smallest class
        covering its precursor window and the longest peptide inside it).
        Returns [(Wb, Lcb, row_indices)] largest-W-first, or None when a
        single dispatch is as good (few rows, narrow max width).

        The split is 2D because width and length ANTI-correlate: ppm
        windows narrow toward the mass extremes, so the narrow-width
        class mixes the lightest (shortest) and heaviest (longest)
        peptides — a per-width Lc max would recover nothing."""
        if n_rows < 256 or W < 64:
            return None
        from .open_search import _quarter_octave as _qoct

        widths = (rows["i1"] - rows["i0"]).astype(np.int64)
        # width levels from the batch's REAL max width (not its pow2
        # ceiling W) on a quarter-octave grid, stepping down by ~1/1.5:
        # the measured padded/real compute ratio of pow2 levels was 4.1x;
        # this grid holds width padding near 1.2x
        levels = [_qoct(int(widths.max(initial=8)))]
        while len(levels) < 4:
            nxt = _qoct(max(levels[-1] * 2 // 3, 8))
            if nxt >= levels[-1]:
                nxt = levels[-1] // 2
            if nxt < 16:
                break
            levels.append(nxt)
        lv = np.asarray(sorted(set(levels)), np.int64)     # ascending
        assign = np.searchsorted(lv, widths, side="left")  # smallest fit
        counts = np.bincount(assign, minlength=lv.size)
        # fold sparse classes upward: a class must hold >= 10% of rows
        # (and >= 64 rows) to pay for its extra dispatch
        floor = max(64, n_rows // 10)
        for i in range(lv.size - 1):
            if 0 < counts[i] < floor:
                assign[assign == i] = i + 1
                counts[i + 1] += counts[i]
                counts[i] = 0
        live = [i for i in range(lv.size) if counts[i] > 0]
        L = self.tables.L if self.tables is not None else None
        if len(live) < 2 and (L is None or L <= _LC_GRID[0]):
            return None

        # Length classes within each width class, from the fixed grid so
        # executable shapes stay stable across batches.
        lneed = _window_lneed(
            self.db.table.lens, rows["i0"], rows["i1"],
            blkmax=self._lens_blk(),
        )
        out = []
        for i in sorted(live, reverse=True):
            idx = np.flatnonzero(assign == i)
            if L is None:
                out.append((int(lv[i]), None, idx))
                continue
            lcs = np.asarray(
                [_lc_class(int(v), L) for v in lneed[idx]], np.int64
            )
            grid = sorted({int(v) for v in lcs})
            cnt = {g: int((lcs == g).sum()) for g in grid}
            # fold sparse length classes upward (same floor rule), then
            # cap at 3 classes per width bucket by folding the smallest
            lfloor = max(64, idx.size // 10)
            for j, g in enumerate(grid[:-1]):
                if 0 < cnt[g] < lfloor:
                    nxt = grid[j + 1]
                    lcs[lcs == g] = nxt
                    cnt[nxt] += cnt[g]
                    cnt[g] = 0
            livel = [g for g in grid if cnt[g] > 0]
            while len(livel) > 3:
                # fold the least-populated class into the next above
                # (the largest class absorbs if it was the top)
                j = min(range(len(livel) - 1), key=lambda k: cnt[livel[k]])
                g, nxt = livel[j], livel[j + 1]
                lcs[lcs == g] = nxt
                cnt[nxt] += cnt[g]
                livel.pop(j)
            for g in sorted(livel, reverse=True):
                out.append((int(lv[i]), int(g), idx[lcs == g]))
        if len(out) < 2:
            return None
        return out

    @staticmethod
    def _prelim_part(d, K):
        """Unpack one stage-1 dispatch into flat per-candidate arrays
        (m, pep, spec, z, iso) plus per-row (spec, mtot, scored)."""
        out = _dget(d["out_dev"])  # i32 [R, W+2 | K+3 | 2K+2]
        n_rows, W = d["n_rows"], d["W"]
        p0, spec_idx = d["p0"], d["spec_idx"]
        packed = d.get("packed", False)
        expected = (
            W + 2 if d["counts_only"] else (K + 3 if packed else 2 * K + 2)
        )
        if out.shape[1] != expected:
            raise AssertionError(
                f"stage-1 layout mismatch: out width {out.shape[1]} != "
                f"{expected} (counts_only={d['counts_only']}, "
                f"packed={packed}, W={W}, K={K})"
            )
        if packed and n_rows and int(out[:n_rows, K].max()) > 511:
            # a preliminary count saturated the 9-bit pack (needs >511
            # matched (peak, charge) pairs on one candidate — never seen
            # in practice); redo this dispatch with the unpacked layout
            # so the top-K order is exact
            out = np.asarray(_dget(d["redo"]()))
            packed = False
        if d["counts_only"]:
            counts = out[:n_rows, :W]
            mtot, scored = out[:n_rows, W], out[:n_rows, W + 1]
            # Reconstruct the (vals, pep) layout of the top-k path: the
            # whole window in reversed candidate order (peptide desc).
            vals = counts[:, ::-1]
            pep = p0[:n_rows, None] + (W - 1 - np.arange(W, dtype=np.int32))
        elif packed:
            keys = out[:n_rows, :K]
            vals = keys >> 23
            pep = keys & np.int32((1 << 23) - 1)
            mtot, scored = out[:n_rows, K + 1], out[:n_rows, K + 2]
        else:
            vals = out[:n_rows, :K]
            pep = out[:n_rows, K : 2 * K]
            mtot, scored = out[:n_rows, 2 * K], out[:n_rows, 2 * K + 1]
        k_row = vals.shape[1]
        m = vals.ravel()
        pp = np.broadcast_to(pep, (n_rows, k_row)).ravel()
        ss = np.repeat(spec_idx[:n_rows], k_row)
        zz = np.repeat(d["row_z"][:n_rows], k_row)
        ii = np.repeat(d["row_iso"][:n_rows], k_row)
        return m, pp, ss, zz, ii, spec_idx[:n_rows], mtot, scored

    def _prelim_finalize(self, d):
        K = self.K
        n_spec = d["n_spec"]
        parts = [
            self._prelim_part(b, K) for b in d.get("buckets", (d,))
        ]
        if len(parts) == 1:
            m, pp, ss, zz, ii, rspec, mtot, scored = parts[0]
        else:
            cols = [np.concatenate(c) for c in zip(*parts)]
            m, pp, ss, zz, ii, rspec, mtot, scored = cols

        # Per-spectrum Poisson stats (sum over this spectrum's rows).
        spec_matched = np.bincount(
            rspec, weights=mtot, minlength=n_spec
        ).astype(np.int64)
        spec_scored = np.bincount(
            rspec, weights=scored, minlength=n_spec
        ).astype(np.int64)

        # Rank flattened candidates per spectrum (zero-matched dropped).
        sel = merge_prescore_candidates(m, pp, ss, zz, ii, K)

        return {
            "cand_matched": m[sel].astype(np.int32),
            "cand_pep": pp[sel].astype(np.int32),
            "cand_spec": ss[sel].astype(np.int32),
            "cand_charge": zz[sel].astype(np.int32),
            "cand_iso": ii[sel].astype(np.int32),
            "spec_matched": spec_matched,
            "spec_scored": spec_scored,
        }

    def _features_table(
        self, spectra, prelim, masses, intens, Pk, report_psms,
        removed_masks=None, tic_override=None, peaks_dev=None,
        masses_dev=None, intens_dev=None,
    ) -> FeatureTable:
        """Stage 2 + vectorized host feature assembly (scoring.rs:478-595,
        675-767). The full rescore runs on device (compact per-item
        outputs); the host assembles whole columns — no per-PSM Python."""
        if masses_dev is not None or intens_dev is not None:
            raise TypeError("pass peaks_dev (packed [2, S, Pk]) instead")
        if peaks_dev is None and removed_masks is None:
            peaks_dev = jnp.asarray(np.stack([masses, intens]))
        d2 = self._stage2_dispatch(
            prelim, intens, Pk, removed_masks=removed_masks,
            peaks_dev=peaks_dev, masses=masses,
        )
        return self._stage2_finalize(
            spectra, prelim, d2, report_psms, tic_override, masses, Pk
        )

    def _stage2_dispatch(
        self, prelim, intens, Pk, removed_masks=None, peaks_dev=None,
        masses=None,
    ):
        p = self.params
        spec_i = prelim["cand_spec"]
        pep_i = prelim["cand_pep"]
        chg = prelim["cand_charge"]
        nI = spec_i.shape[0]
        if nI == 0:
            return {"out_dev": None, "nI": 0, "use_int": intens}

        N = _pad_count(nI)
        spec_idx = np.zeros(N, dtype=np.int32)
        pep_idx = np.zeros(N, dtype=np.int32)
        maxz = np.full(N, 2, dtype=np.int32)
        spec_idx[:nI] = spec_i
        pep_idx[:nI] = pep_i
        cap = (
            np.minimum(chg, p.max_fragment_charge + 1)
            if p.max_fragment_charge is not None
            else chg
        )
        maxz[:nI] = np.minimum(np.maximum(cap, 2), self.Z + 1)
        Zb = min(max(int(maxz[:nI].max()) - 1, 1), self.Z)

        if removed_masks is None:
            use_int = intens
        else:
            # Chimera rounds modify intensities (removed peaks -> -1), so
            # re-upload the packed peak pair with the masked intensities.
            use_int = np.where(removed_masks, -1.0, intens).astype(np.float32)
            peaks_dev = jnp.asarray(np.stack([masses, use_int]))
        fn = self._stage2_compact(Pk, N, Zb)
        ints = np.stack([spec_idx, pep_idx, maxz])  # one upload
        out_dev = fn(peaks_dev, jnp.asarray(ints))
        out_dev.copy_to_host_async()
        return {"out_dev": out_dev, "nI": nI, "use_int": use_int}

    def _stage2_finalize(
        self, spectra, prelim, d2, report_psms, tic_override, masses, Pk
    ) -> FeatureTable:
        p = self.params
        spec_i = prelim["cand_spec"]
        pep_i = prelim["cand_pep"]
        chg = prelim["cand_charge"]
        iso = prelim["cand_iso"]
        nI = d2["nI"]
        use_int = d2["use_int"]
        spec_ids = [s.id for s in spectra]
        if nI == 0:
            t = FeatureTable.empty()
            t.spec_ids = spec_ids
            return t
        out = _dget(d2["out_dev"])  # packed f32 [N, 7]
        mb = out[:nI, 0].astype(np.int32)
        my = out[:nI, 1].astype(np.int32)
        sb, sy, ppm_sum = out[:nI, 2], out[:nI, 3], out[:nI, 4]
        lb = out[:nI, 5].astype(np.int32)
        ly = out[:nI, 6].astype(np.int32)

        # Vectorized exact feature math
        hs = hyperscore_vec(p.score_type, mb, my, sb, sy)
        ssum = (sb + sy).astype(np.float32)
        ppm = np.where(
            ssum != 0, ppm_sum / np.where(ssum == 0, np.float32(1.0), ssum), 0.0
        ).astype(np.float32)
        ok = (mb + my) >= p.min_matched_peaks
        if not ok.any():
            t = FeatureTable.empty()
            t.spec_ids = spec_ids
            return t

        # Group candidates by spectrum (cand arrays are spectrum-ascending),
        # stable-sort each group by hyperscore desc (scoring.rs:495).
        idx_all = np.flatnonzero(ok)
        order = np.lexsort((-hs[idx_all], spec_i[idx_all]))
        items = idx_all[order]
        s_srt = spec_i[items]
        hs_srt = hs[items]
        starts = np.r_[0, np.flatnonzero(np.diff(s_srt)) + 1]
        counts = np.diff(np.r_[starts, s_srt.size])
        group_start = np.repeat(starts, counts)
        rank = np.arange(s_srt.size) - group_start

        # delta_next vs the next candidate in the same group (0 past the
        # end); delta_best vs the group's best.
        nxt = np.r_[hs_srt[1:], 0.0]
        same = np.r_[s_srt[1:] == s_srt[:-1], False]
        delta_next = hs_srt - np.where(same, nxt, 0.0)
        delta_best = hs_srt[group_start] - hs_srt

        rep = rank < report_psms
        ri = items[rep]  # original candidate indices of reported PSMs

        return self._emit_table(
            spectra,
            s_of=spec_i[ri], pep=pep_i[ri], z_of=chg[ri], iso_i=iso[ri],
            mb=mb[ri], my=my[ri], sb=sb[ri], sy=sy[ri], ppm=ppm[ri],
            lb=lb[ri], ly=ly[ri], hs=hs[ri], rank0=rank[rep],
            delta_next=delta_next[rep], delta_best=delta_best[rep],
            spec_matched=prelim["spec_matched"],
            spec_scored=prelim["spec_scored"],
            tic_override=tic_override, masses=masses, use_int=use_int,
            Pk=Pk,
        )

    def _emit_table(
        self, spectra, *, s_of, pep, z_of, iso_i, mb, my, sb, sy, ppm,
        lb, ly, hs, rank0, delta_next, delta_best, spec_matched,
        spec_scored, tic_override, masses, use_int, Pk,
    ) -> FeatureTable:
        """Column assembly for the REPORTED rows (scoring.rs:478-595's
        Feature construction): every per-row argument is already
        restricted to reported PSMs in final (spectrum asc, rank asc)
        order; per-spectrum statistics arrive as full [n_spec] arrays.
        Shared by the classic finalize (which selects reported rows on
        host) and the fused-select finalize (which fetches them
        pre-selected from the device)."""
        p = self.params
        n_rep = s_of.size
        spec_ids = [s.id for s in spectra]

        # Per-spectrum metadata columns
        n_spec = len(spectra)
        sp_rt = np.zeros(n_spec, np.float32)
        sp_tic = np.zeros(n_spec, np.float32)
        sp_mz = np.zeros(n_spec, np.float32)
        sp_ims = np.zeros(n_spec, np.float32)
        sp_file = np.zeros(n_spec, np.int32)
        for si, spec in enumerate(spectra):
            prec = spec.precursors[0]
            sp_rt[si] = spec.scan_start_time
            sp_tic[si] = spec.total_ion_current
            sp_mz[si] = F32(F32(prec.mz) - PROTON)
            sp_ims[si] = (
                prec.inverse_ion_mobility
                if prec.inverse_ion_mobility is not None
                else 0.0
            )
            sp_file[si] = spec.file_id
        if tic_override is not None:
            sp_tic = np.asarray(tic_override, np.float32)

        tbl = self.db.table
        pm = (sp_mz[s_of] * z_of.astype(np.float32)).astype(np.float32)
        calc = tbl.mono[pep]
        iso_err = (iso_i.astype(np.float32) * NEUTRON).astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            delta_mass = (
                (((pm - calc).astype(np.float32) - iso_err).astype(np.float32)
                 * np.float32(2e6)).astype(np.float32)
                / ((pm - iso_err).astype(np.float32) + calc).astype(np.float32)
            ).astype(np.float32)
        k_match = (mb + my).astype(np.int32)
        scored_cand = spec_scored[s_of].astype(np.int32)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(
                spec_scored > 0,
                spec_matched / np.maximum(spec_scored, 1),
                0.0,
            )
        poisson = log10_poisson_vec(lam[s_of], k_match)
        msum = (sb + sy).astype(np.float32)
        tic_col = sp_tic[s_of]
        plen = tbl.lens[pep].astype(np.int32)

        t = FeatureTable.empty(n_rep)
        c = t.columns
        c["peptide_idx"][:] = pep
        c["psm_id"][:] = np.arange(
            self._psm_counter, self._psm_counter + n_rep, dtype=np.int64
        )
        self._psm_counter += n_rep
        c["peptide_len"][:] = plen
        c["spec_idx"][:] = s_of
        c["file_id"][:] = sp_file[s_of]
        c["rank"][:] = rank0 + 1
        c["label"][:] = np.where(tbl.decoy[pep], -1, 1)
        c["expmass"][:] = pm
        c["calcmass"][:] = calc
        c["charge"][:] = z_of
        c["rt"][:] = sp_rt[s_of]
        c["aligned_rt"][:] = sp_rt[s_of]
        c["ims"][:] = sp_ims[s_of]
        c["delta_mass"][:] = delta_mass
        c["isotope_error"][:] = iso_err
        c["average_ppm"][:] = ppm
        c["hyperscore"][:] = hs
        c["delta_next"][:] = delta_next
        c["delta_best"][:] = delta_best
        c["matched_peaks"][:] = k_match
        c["longest_b"][:] = lb
        c["longest_y"][:] = ly
        c["longest_y_pct"][:] = (
            ly.astype(np.float32) / plen.astype(np.float32)
        ).astype(np.float32)
        c["missed_cleavages"][:] = tbl.missed_cleavages[pep]
        with np.errstate(divide="ignore", invalid="ignore"):
            c["matched_intensity_pct"][:] = (
                (np.float32(100.0) * msum).astype(np.float32) / tic_col
            ).astype(np.float32)
        c["scored_candidates"][:] = scored_cand
        c["poisson"][:] = poisson
        c["ms2_intensity"][:] = msum
        t.spec_ids = spec_ids

        if p.annotate_matches:
            t.fragments = [
                self._annotate_item(
                    int(pep[i]), int(z_of[i]), int(s_of[i]), masses,
                    use_int, Pk
                )
                for i in range(n_rep)
            ]
        return t

    def _annotate_item(self, pep_i, charge, si, masses, intens, Pk):
        """Matched-fragment annotations for one reported PSM
        (scoring.rs:738-751) — recomputed on host with the exact scalar
        peak-selection semantics; only runs for reported PSMs."""
        from ..spectrum.processor import select_most_intense_peak

        db = self.db
        peptide = db.peptides[pep_i]
        n_ions = len(peptide.sequence) - 1
        lad, _ = _host_ladders(db, [pep_i], self.series)
        mzmax = max_fragment_charge(self.params.max_fragment_charge, charge)
        frags = Fragments()
        sm = masses[si]
        sv = intens[si]
        for s, kind in enumerate(self.series):
            for l in range(n_ions):
                for z in range(1, mzmax):
                    center = F32(lad[0, s, l] / F32(z))
                    # select_most_intense_peak starts its running max at 0,
                    # so removed peaks (intensity -1) can never be chosen —
                    # matching the device's `pki >= 0` qualifier.
                    pk = select_most_intense_peak(
                        sm, sv, center, self.params.fragment_tol
                    )
                    if pk is None:
                        continue
                    calc_mz = F32(center + PROTON)
                    exp_mz = F32(sm[pk] + PROTON)
                    ordinal = l + 1 if _SERIES_NTERM[kind] else n_ions - l
                    frags.kinds.append(kind)
                    frags.charges.append(z)
                    frags.mz_calculated.append(float(calc_mz))
                    frags.mz_experimental.append(float(exp_mz))
                    frags.fragment_ordinals.append(int(ordinal))
                    frags.intensities.append(float(sv[pk]))
        return frags

    # ------------------------------------------------------------------
    # Chimera mode (scoring.rs:598-672)
    # ------------------------------------------------------------------

    def _score_chimera(self, spectra) -> FeatureTable:
        prelim = self._preliminary(spectra)
        masses, intens, Pk = self._pad_peaks(spectra)

        def features_table(removed, tic):
            return self._features_table(
                spectra, prelim, masses, intens, Pk, 1,
                removed_masks=removed, tic_override=tic,
            )

        return chimera_rounds(self, spectra, masses, intens, features_table)

    def _remove_matched(self, si, pep_i, charge, masses, intens, removed):
        """scoring.rs:598-644: mark peaks matched by the PSM's complete
        theoretical ladder (all charges) as removed."""
        from ..spectrum.processor import select_most_intense_peak

        db = self.db
        b_host, _ = _host_ladders(db, [pep_i], self.series)
        n_ions = len(db.peptides[pep_i].sequence) - 1
        mzmax = max_fragment_charge(self.params.max_fragment_charge, charge)
        valid = np.isfinite(masses[si]) & ~removed[si]
        vm = masses[si][valid]
        vi = intens[si][valid]
        vidx = np.nonzero(valid)[0]
        to_remove = set()
        for s in range(self.n_series):
            for l in range(n_ions):
                for z in range(1, mzmax):
                    center = F32(b_host[0, s, l] / F32(z))
                    j = select_most_intense_peak(vm, vi, center, self.params.fragment_tol)
                    if j is not None:
                        to_remove.add((float(vm[j]), float(vi[j])))
        for j0, gi in enumerate(vidx):
            if (float(vm[j0]), float(vi[j0])) in to_remove:
                removed[si][gi] = True


def chimera_rounds(host, spectra, masses, intens, features_table):
    """Shared chimera round loop (scoring.rs:598-672), generic over HOW
    one round's features are produced: ``features_table(removed, tic)``
    returns the round's FeatureTable (single-device stage-2 re-dispatch
    or a mesh rescore — the sharded scorer passes its own). ``host``
    supplies params and the exact host-side peak-removal semantics
    (`_remove_matched`). Each round keeps the best new PSM per still-
    active spectrum, removes its matched peaks, recomputes the TIC with
    the reference's sequential-f32 sum, and re-runs until report_psms
    rounds or no spectrum yields a new hit."""
    from .features import FeatureTable

    p = host.params
    removed = np.zeros_like(intens, dtype=bool)
    tic = np.array([s.total_ion_current for s in spectra], dtype=np.float32)
    rounds: List[FeatureTable] = []
    n_hits = np.zeros(len(spectra), dtype=np.int32)
    active = set(range(len(spectra)))
    for _ in range(p.report_psms):
        if not active:
            break
        t = features_table(removed, tic)
        keep_rows = []
        newly = set()
        for i in range(len(t)):
            si = int(t.columns["spec_idx"][i])
            if si not in active:
                continue
            keep_rows.append(i)
            n_hits[si] += 1
            t.columns["rank"][i] = n_hits[si]
            newly.add(si)
            host._remove_matched(
                si,
                int(t.columns["peptide_idx"][i]),
                int(t.columns["charge"][i]),
                masses,
                intens,
                removed,
            )
            tic[si] = seq_f32_sum_rows(
                np.where(
                    removed[si],
                    0.0,
                    np.where(np.isfinite(masses[si]), intens[si], 0.0),
                )[None, :],
                np.array([intens.shape[1]], dtype=np.int32),
            )[0]
        if not keep_rows:
            break
        rounds.append(t.select(np.asarray(keep_rows, dtype=np.int64)))
        active = {si for si in newly if n_hits[si] < p.report_psms}
    if not rounds:
        out = FeatureTable.empty()
        out.spec_ids = [s.id for s in spectra]
        return out
    # All rounds share the same spec_ids list; concat would re-base
    # spec_idx, so merge manually.
    merged = FeatureTable.empty(sum(len(t) for t in rounds))
    off = 0
    for t in rounds:
        n = len(t)
        for k in merged.columns:
            merged.columns[k][off : off + n] = t.columns[k]
        merged.protein_groups[off : off + n] = t.protein_groups
        merged.fragments[off : off + n] = t.fragments
        off += n
    merged.spec_ids = rounds[0].spec_ids
    return merged


def _host_ladders(db: IndexedDatabase, pep_indices, series) -> Tuple[np.ndarray, np.ndarray]:
    """Exact host-side ion ladders for the given peptides:
    returns ([n, n_series, L] neutral masses, unused)."""
    from ..native import seq_f32_cumsum_rows

    t = db.table
    idx = np.asarray(pep_indices, dtype=np.int64)
    res = t.resmass[idx]
    ntm = t.nterm[idx]
    mono = t.mono[idx]
    lens = np.maximum(t.lens[idx] - 1, 0).astype(np.int32)
    out = []
    for kind in series:
        seed = _SERIES_SEED[kind]
        if _SERIES_NTERM[kind]:
            init = (ntm + seed).astype(np.float32)
            lad = seq_f32_cumsum_rows(res, init, lens)
        else:
            init = ((mono - ntm) + seed).astype(np.float32)
            lad = seq_f32_cumsum_rows(-res, init, lens)
        out.append(lad)
    return np.stack(out, axis=1), None
