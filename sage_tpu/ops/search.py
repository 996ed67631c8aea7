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
    Fragments,
    hyperscore,
    log10_poisson,
)

F32 = np.float32

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


def _tol_bounds_jnp(tol: Tolerance, center):
    """Tolerance.bounds as traced f32 ops with the reference's op order."""
    lo = jnp.float32(tol.lo)
    hi = jnp.float32(tol.hi)
    if tol.kind == "ppm":
        return center + (center * lo) / jnp.float32(1e6), center + (center * hi) / jnp.float32(1e6)
    if tol.kind == "pct":
        return center + (center * lo) / jnp.float32(100.0), center + (center * hi) / jnp.float32(100.0)
    return center + lo, center + hi


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
        seed = jnp.float32(_SERIES_SEED[kind])
        if _SERIES_NTERM[kind]:
            inits.append(ntm + seed)
            signs.append(jnp.float32(1.0))
        else:
            inits.append((mono - ntm) + seed)
            signs.append(jnp.float32(-1.0))
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


def count_fragment_matches(f, fvalid, peaks, frag_tol, maxz, Z):
    """Per-candidate matched-peak counts via the rank-difference trick.

    f: [S, W, L] neutral fragment ladders; fvalid: [S, W, L] bool;
    peaks: [Pk] neutral peak masses padded with +inf; maxz: scalar i32
    exclusive fragment-charge bound. Counts every in-window
    (peak × charge × fragment) pair, exactly the reference's preliminary
    matched count (scoring.rs:335-382). Returns i32 [W]."""
    W = f.shape[1]
    counts = jnp.zeros((W,), dtype=jnp.int32)
    for zi in range(Z):
        z = jnp.float32(zi + 1)
        q = peaks * z  # [Pk]
        lo_q, hi_q = _tol_bounds_jnp(frag_tol, q)
        z_ok = (zi + 1) < maxz
        # Masked charge planes must contribute 0 to both the prefix count
        # (lo <= f) and the strict count (hi < f): +inf fails both
        # comparisons for any finite fragment.
        lo_q = jnp.where(z_ok, lo_q, jnp.float32(np.inf))
        hi_q = jnp.where(z_ok, hi_q, jnp.float32(np.inf))
        a = jnp.sum((f[..., None] >= lo_q[None, None, None, :]), axis=-1, dtype=jnp.int32)
        b = jnp.sum((f[..., None] > hi_q[None, None, None, :]), axis=-1, dtype=jnp.int32)
        cnt = jnp.where(fvalid, a - b, 0)  # [S, W, L]
        counts = counts + jnp.sum(cnt, axis=(0, 2))
    return counts


class _DeviceTables:
    """HBM-resident peptide table, padded to a power-of-two row count so any
    precursor-window slice of width W <= P_pad stays in bounds."""

    def __init__(self, db: IndexedDatabase):
        t = db.table
        P = len(t)
        self.P_real = P
        self.P_pad = max(next_power_of_two(max(P, 1)), 128)
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


class Scorer:
    """Score ProcessedSpectrum batches against an IndexedDatabase."""

    def __init__(self, db: IndexedDatabase, params: SearchParams):
        self.db = db
        self.params = params
        self.tables = _DeviceTables(db)
        self.series = tuple(db.ion_kinds)
        self.n_series = len(self.series)
        self.min_ion_index = db.min_ion_index
        # Global fragment-charge axis: 1..Zmax where Zmax is the largest
        # exclusive bound any precursor charge can produce.
        zmax = max(
            max_fragment_charge(params.max_fragment_charge, z)
            for z in range(1, params.max_precursor_charge + 1)
        )
        self.Z = max(zmax - 1, 1)
        self.K = 50  # trim_hits K-select bound (scoring.rs:322-329)
        self._stage1_cache: Dict[Tuple[int, int, int], object] = {}
        self._stage2_cache: Dict[Tuple[int, int], object] = {}
        self._psm_counter = 1

    # ------------------------------------------------------------------
    # Device programs
    # ------------------------------------------------------------------

    def _ladders(self, res, ntm, mono_c, L):
        return ion_ladders(res, ntm, mono_c, self.series)

    def _series_valid_mask(self, lens_c, L):
        return series_valid_mask(lens_c, L, self.series, self.min_ion_index)

    def _build_stage1(self, W: int, Pk: int, R: int):
        tables = self.tables
        L = tables.L
        Z = self.Z
        K = self.K
        frag_tol = self.params.fragment_tol
        n_series = self.n_series

        def per_row(peaks, p0, i0, i1, maxz):
            # peaks: [Pk] padded with +inf
            res = jax.lax.dynamic_slice(tables.resmass, (p0, 0), (W, L))
            ntm = jax.lax.dynamic_slice(tables.nterm, (p0,), (W,))
            mono_c = jax.lax.dynamic_slice(tables.mono, (p0,), (W,))
            lens_c = jax.lax.dynamic_slice(tables.lens, (p0,), (W,))
            gidx = p0 + jnp.arange(W, dtype=jnp.int32)
            cand_valid = (gidx >= i0) & (gidx < i1)

            f = self._ladders(res, ntm, mono_c, L)  # [S, W, L]
            fvalid = self._series_valid_mask(lens_c, L)  # [S, W, L]

            counts = count_fragment_matches(f, fvalid, peaks, frag_tol, maxz, Z)
            counts = jnp.where(cand_valid, counts, 0)
            matched_total = jnp.sum(counts)
            scored = jnp.sum((counts > 0).astype(jnp.int32))
            # Top-K by (count, peptide index) descending: reversing the
            # candidate axis makes top_k's lowest-index tie rule pick the
            # highest peptide index first (PreScore Ord, scoring.rs:43-49).
            rev = counts[::-1]
            k = min(K, W)
            vals, ridx = jax.lax.top_k(rev, k)
            pep = p0 + (W - 1 - ridx)
            if k < K:  # pad to the static K width
                vals = jnp.pad(vals, (0, K - k))
                pep = jnp.pad(pep, (0, K - k))
            return vals, pep, matched_total, scored

        def run(peaks_all, spec_idx, p0, i0, i1, maxz):
            pk = peaks_all[spec_idx]  # [R, Pk]
            return jax.vmap(per_row)(pk, p0, i0, i1, maxz)

        return jax.jit(run)

    def _build_stage2(self, Pk: int, N: int):
        tables = self.tables
        L = tables.L
        Z = self.Z
        frag_tol = self.params.fragment_tol
        n_series = self.n_series

        def per_item(pkm, pki, pep, maxz):
            res = tables.resmass[pep]  # [L]
            ntm = tables.nterm[pep]
            mono_c = tables.mono[pep]
            lens_c = tables.lens[pep]

            f = self._ladders(res[None, :], ntm[None], mono_c[None], L)[:, 0, :]  # [S, L]
            ion_idx = jnp.arange(L, dtype=jnp.int32)
            n_ions = jnp.maximum(lens_c - 1, 0)
            fvalid = ion_idx[None, :] < n_ions  # [1?, L] -> broadcast [S, L]
            fvalid = jnp.broadcast_to(fvalid, (n_series, L))

            out = []
            for zi in range(Z):
                z = jnp.float32(zi + 1)
                mzc = f / z  # [S, L] theoretical m/z at this charge
                lo, hi = _tol_bounds_jnp(frag_tol, mzc)
                z_ok = (zi + 1) < maxz
                ok = fvalid & z_ok
                inwin = (pkm[None, None, :] >= lo[..., None]) & (
                    pkm[None, None, :] <= hi[..., None]
                )  # [S, L, Pk]
                qual = inwin & (pki[None, None, :] >= 0) & ok[..., None]
                val = jnp.where(qual, pki[None, None, :], jnp.float32(-1.0))
                # most intense, ties to the LATER index (spectrum.rs:150-157)
                rev = val[..., ::-1]
                ridx = jnp.argmax(rev, axis=-1)
                best = jnp.take_along_axis(rev, ridx[..., None], axis=-1)[..., 0]
                idx = (Pk - 1) - ridx
                out.append(jnp.where(best >= 0, idx, -1).astype(jnp.int32))
            return jnp.stack(out, axis=-1)  # [S, L, Z]

        def run(peaks_all, inten_all, spec_idx, pep, maxz):
            pkm = peaks_all[spec_idx]
            pki = inten_all[spec_idx]
            return jax.vmap(per_item)(pkm, pki, pep, maxz)

        return jax.jit(run)

    def _stage1(self, W, Pk, R):
        key = (W, Pk, R)
        if key not in self._stage1_cache:
            self._stage1_cache[key] = self._build_stage1(W, Pk, R)
        return self._stage1_cache[key]

    def _stage2(self, Pk, N):
        key = (Pk, N)
        if key not in self._stage2_cache:
            self._stage2_cache[key] = self._build_stage2(Pk, N)
        return self._stage2_cache[key]

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------

    def _expand_rows(self, spectra: Sequence[ProcessedSpectrum]):
        """initial_hits charge/isotope expansion (scoring.rs:384-462): one
        query row per (spectrum, precursor charge, isotope error)."""
        p = self.params
        mono = self.db.table.mono
        P = self.tables.P_real
        rows = []  # (spec_i, charge, isotope, i0, i1)
        for si, spec in enumerate(spectra):
            if not spec.precursors:
                raise ValueError(f"missing MS1 precursor for {spec.id}")
            prec = spec.precursors[0]
            mz = F32(F32(prec.mz) - PROTON)
            if p.wide_window:
                charge_tols = []
                for z in range(p.min_precursor_charge, p.max_precursor_charge + 1):
                    base = prec.isolation_window or Tolerance("da", -2.4, 2.4)
                    charge_tols.append((z, base * float(z)))
            elif prec.charge is not None and not p.override_precursor_charge:
                charge_tols = [(prec.charge, p.precursor_tol)]
            else:
                charge_tols = [
                    (z, p.precursor_tol)
                    for z in range(p.min_precursor_charge, p.max_precursor_charge + 1)
                ]
            if p.min_isotope_err != p.max_isotope_err:
                isotopes = range(p.min_isotope_err, p.max_isotope_err + 1)
            else:
                isotopes = [0]
            for z, tol in charge_tols:
                pm = F32(mz * F32(z))
                for iso in isotopes:
                    qm = F32(pm - F32(F32(iso) * NEUTRON))
                    lo, hi = tol.bounds(qm)
                    i0 = int(np.searchsorted(mono, lo, side="left"))
                    i1 = int(np.searchsorted(mono, hi, side="right"))
                    rows.append((si, z, iso, i0, i1))
        return rows

    def _pad_peaks(self, spectra: Sequence[ProcessedSpectrum]):
        Pk = max(max((len(s) for s in spectra), default=1), 1)
        Pk = int(np.ceil(Pk / 32) * 32)
        S = len(spectra)
        masses = np.full((S, Pk), np.inf, dtype=np.float32)
        intens = np.full((S, Pk), -1.0, dtype=np.float32)
        for i, s in enumerate(spectra):
            n = len(s)
            masses[i, :n] = s.masses
            intens[i, :n] = s.intensities
        return masses, intens, Pk

    def score(self, spectra: Sequence[ProcessedSpectrum]) -> List[Feature]:
        """Score a batch of MS2 spectra; returns all Features (report_psms
        per spectrum), reference score_standard semantics."""
        if not spectra:
            return []
        if self.params.chimera:
            return self._score_chimera(spectra)
        prelim = self._preliminary(spectra)
        features: List[Feature] = []
        masses, intens, Pk = self._pad_peaks(spectra)
        feats = self._build_features_batch(
            spectra, prelim, masses, intens, Pk, self.params.report_psms
        )
        for fl in feats:
            features.extend(fl)
        return features

    def _preliminary(self, spectra):
        """Stage 1 + merge: per spectrum, the top-K preliminary candidates
        (pep_idx, charge, isotope, matched) plus Poisson statistics."""
        p = self.params
        rows = self._expand_rows(spectra)
        masses, _, Pk = self._pad_peaks(spectra)

        max_win = max((i1 - i0 for _, _, _, i0, i1 in rows), default=1)
        W = min(next_power_of_two(max(max_win, 8)), self.tables.P_pad)
        R = next_power_of_two(max(len(rows), 8))

        spec_idx = np.zeros(R, dtype=np.int32)
        p0 = np.zeros(R, dtype=np.int32)
        i0a = np.zeros(R, dtype=np.int32)
        i1a = np.zeros(R, dtype=np.int32)
        maxz = np.full(R, 2, dtype=np.int32)
        for r, (si, z, iso, i0, i1) in enumerate(rows):
            spec_idx[r] = si
            p0[r] = min(i0, self.tables.P_pad - W)
            i0a[r] = i0
            i1a[r] = i1
            maxz[r] = max_fragment_charge(p.max_fragment_charge, z)

        fn = self._stage1(W, Pk, R)
        vals, pep, mtot, scored = fn(
            jnp.asarray(masses), jnp.asarray(spec_idx), jnp.asarray(p0),
            jnp.asarray(i0a), jnp.asarray(i1a), jnp.asarray(maxz),
        )
        vals = np.asarray(vals)
        pep = np.asarray(pep)
        mtot = np.asarray(mtot)
        scored = np.asarray(scored)

        # Merge rows per spectrum with the PreScore ordering
        # (matched, peptide, charge, isotope) and take the global top-K.
        out = []
        per_spec_rows: List[List[int]] = [[] for _ in spectra]
        for r, (si, *_rest) in enumerate(rows):
            per_spec_rows[si].append(r)
        for si, spec in enumerate(spectra):
            cand = []
            total_matched = 0
            total_scored = 0
            for r in per_spec_rows[si]:
                _, z, iso, _, _ = rows[r]
                total_matched += int(mtot[r])
                total_scored += int(scored[r])
                for k in range(self.K):
                    m = int(vals[r, k])
                    if m > 0:
                        cand.append((m, int(pep[r, k]), z, iso))
            cand.sort(reverse=True)
            out.append(
                {
                    "candidates": cand[: self.K],
                    "matched_peaks": total_matched,
                    "scored_candidates": total_scored,
                }
            )
        return out

    def _build_features_batch(
        self, spectra, prelim, masses, intens, Pk, report_psms,
        removed_masks=None, tic_override=None,
    ) -> List[List[Feature]]:
        """Stage 2 + host feature assembly (scoring.rs:478-595, 675-767)."""
        p = self.params
        items = []  # (spec_i, cand_i, pep, charge, iso, matched)
        for si, pr in enumerate(prelim):
            for (m, pep_i, z, iso) in pr["candidates"]:
                items.append((si, pep_i, z, iso, m))
        if not items:
            return [[] for _ in spectra]

        N = next_power_of_two(max(len(items), 8))
        spec_idx = np.zeros(N, dtype=np.int32)
        pep_idx = np.zeros(N, dtype=np.int32)
        maxz = np.full(N, 2, dtype=np.int32)
        for i, (si, pep_i, z, iso, m) in enumerate(items):
            spec_idx[i] = si
            pep_idx[i] = pep_i
            maxz[i] = max_fragment_charge(p.max_fragment_charge, z)

        use_int = intens if removed_masks is None else np.where(removed_masks, -1.0, intens).astype(np.float32)
        fn = self._stage2(Pk, N)
        midx = np.asarray(
            fn(jnp.asarray(masses), jnp.asarray(use_int), jnp.asarray(spec_idx),
               jnp.asarray(pep_idx), jnp.asarray(maxz))
        )  # [N, S, L, Z]

        return self._assemble(
            spectra, prelim, items, midx, masses, intens, removed_masks,
            report_psms, tic_override,
        )

    def _assemble(
        self, spectra, prelim, items, midx, masses, intens, removed_masks,
        report_psms, tic_override,
    ) -> List[List[Feature]]:
        p = self.params
        db = self.db
        table = db.table
        L = table.max_len
        Z = self.Z
        n_series = self.n_series
        nI = len(items)

        # Theoretical ladders for the involved peptides (host, exact f32)
        b_host, y_host = _host_ladders(db, [it[1] for it in items], self.series)
        # [nI, S, L] neutral masses

        # Gather matched peak masses/intensities
        midx = midx[:nI]  # [nI, S, L, Z]
        matched = midx >= 0
        safe = np.clip(midx, 0, masses.shape[1] - 1)
        si_arr = np.array([it[0] for it in items], dtype=np.int32)
        pk_m = masses[si_arr[:, None, None, None], safe]
        pk_i = intens[si_arr[:, None, None, None], safe]
        pk_m = np.where(matched, pk_m, np.float32(0.0)).astype(np.float32)
        pk_i = np.where(matched, pk_i, np.float32(0.0)).astype(np.float32)

        # Theoretical m/z per (series, ion, charge): ladder / z, f32
        zs = np.arange(1, Z + 1, dtype=np.float32)
        mz_c = (b_host[..., None] / zs).astype(np.float32)  # [nI, S, L, Z]

        # Per-fragment ppm term (f32, reference op order, scoring.rs:719-720)
        d = np.abs(mz_c - pk_m).astype(np.float32)
        denom = (mz_c + pk_m).astype(np.float32)
        ppm_terms = np.where(
            matched,
            ((pk_i * d).astype(np.float32) * np.float32(2e6)).astype(np.float32)
            / np.where(denom == 0, np.float32(1.0), denom),
            np.float32(0.0),
        ).astype(np.float32)

        is_nterm = np.array([_SERIES_NTERM[k] for k in self.series], dtype=bool)

        # Sequential f32 sums in the fragments-iterator order (series-major,
        # then ion index, then charge) — zero-padded entries don't perturb
        # f32 accumulation.
        flat_int = pk_i.reshape(nI, -1)
        lens_flat = np.full(nI, n_series * L * Z, dtype=np.int32)
        b_mask3 = is_nterm[None, :, None, None]
        sb = seq_f32_sum_rows(np.where(b_mask3, pk_i, 0.0).reshape(nI, -1), lens_flat)
        sy = seq_f32_sum_rows(np.where(~b_mask3, pk_i, 0.0).reshape(nI, -1), lens_flat)
        ppm_sum = seq_f32_sum_rows(ppm_terms.reshape(nI, -1), lens_flat)

        mb = (matched & b_mask3).sum(axis=(1, 2, 3))
        my = (matched & ~b_mask3).sum(axis=(1, 2, 3))

        any_z = matched.any(axis=3)  # [nI, S, L]

        out: List[List[Feature]] = [[] for _ in spectra]
        scored_lists: List[List[dict]] = [[] for _ in spectra]

        for i, (si, pep_i, z, iso, _m) in enumerate(items):
            tb = int(mb[i])
            ty = int(my[i])
            if tb + ty < p.min_matched_peaks:
                continue
            peptide = db.peptides[pep_i]
            n_ions = len(peptide.sequence) - 1
            # Exact port of the reference's Run tracker (scoring.rs:771-793),
            # fed in the fragments-iterator order. Note its quirk: `last`
            # starts at 0, so a match at ion index 0 never extends a run.
            b_run = _Run()
            y_run = _Run()
            for s in range(n_series):
                run = b_run if is_nterm[s] else y_run
                for l in range(n_ions):
                    if any_z[i, s, l]:
                        run.matched(l)
            lb = b_run.longest
            ly = y_run.longest
            s_b = F32(sb[i])
            s_y = F32(sy[i])
            hs = hyperscore(p.score_type, tb, ty, s_b, s_y)
            ppm = F32(ppm_sum[i]) / F32(s_b + s_y) if (s_b + s_y) != 0 else F32(0.0)
            scored_lists[si].append(
                dict(
                    pep=pep_i, charge=z, iso=iso, matched_b=tb, matched_y=ty,
                    summed_b=s_b, summed_y=s_y, hyperscore=hs, ppm=F32(ppm),
                    longest_b=lb, longest_y=ly, item=i,
                )
            )

        for si, spec in enumerate(spectra):
            sv = scored_lists[si]
            # stable sort by hyperscore desc (scoring.rs:495)
            sv.sort(key=lambda s: -s["hyperscore"])
            if not sv:
                continue
            pr = prelim[si]
            lam = (
                pr["matched_peaks"] / pr["scored_candidates"]
                if pr["scored_candidates"]
                else 0.0
            )
            prec = spec.precursors[0]
            mz = F32(F32(prec.mz) - PROTON)
            best = sv[0]["hyperscore"]
            tic = tic_override[si] if tic_override is not None else spec.total_ion_current
            for idx in range(min(report_psms, len(sv))):
                s = sv[idx]
                nxt = sv[idx + 1]["hyperscore"] if idx + 1 < len(sv) else 0.0
                feat = self._make_feature(
                    spec, s, idx, lam, mz, best, nxt, tic, pr["scored_candidates"],
                )
                if p.annotate_matches:
                    feat.fragments = self._annotate(
                        s["item"], s["pep"], midx, masses, intens, si, b_host
                    )
                out[si].append(feat)
        return out

    def _make_feature(self, spec, s, idx, lam, mz, best, nxt, tic, scored_candidates):
        db = self.db
        peptide = db.peptides[s["pep"]]
        pm = F32(mz * F32(s["charge"]))
        k = s["matched_b"] + s["matched_y"]
        iso_err = F32(F32(s["iso"]) * NEUTRON)
        calc = peptide.monoisotopic
        delta_mass = (
            F32(F32(F32(pm - calc) - iso_err) * F32(2e6))
            / F32(F32(pm - iso_err) + calc)
        )
        poisson = log10_poisson(lam, k)
        psm_id = self._psm_counter
        self._psm_counter += 1
        ims = spec.precursors[0].inverse_ion_mobility
        return Feature(
            peptide_idx=s["pep"],
            psm_id=psm_id,
            peptide_len=len(peptide.sequence),
            spec_id=spec.id,
            file_id=spec.file_id,
            rank=idx + 1,
            label=peptide.label(),
            expmass=float(pm),
            calcmass=float(calc),
            charge=s["charge"],
            rt=float(spec.scan_start_time),
            aligned_rt=float(spec.scan_start_time),
            ims=float(ims if ims is not None else 0.0),
            delta_mass=float(delta_mass),
            isotope_error=float(iso_err),
            average_ppm=float(s["ppm"]),
            hyperscore=s["hyperscore"],
            delta_next=s["hyperscore"] - nxt,
            delta_best=best - s["hyperscore"],
            matched_peaks=k,
            matched_intensity_pct=float(
                F32(F32(100.0) * F32(s["summed_b"] + s["summed_y"])) / F32(tic)
            ),
            poisson=poisson,
            longest_b=s["longest_b"],
            longest_y=s["longest_y"],
            longest_y_pct=float(F32(s["longest_y"]) / F32(len(peptide.sequence))),
            scored_candidates=scored_candidates,
            missed_cleavages=peptide.missed_cleavages,
            ms2_intensity=float(F32(s["summed_b"] + s["summed_y"])),
        )

    def _annotate(self, item_i, pep_i, midx, masses, intens, si, b_host):
        """Matched-fragment annotations (scoring.rs:738-751)."""
        db = self.db
        L = db.table.max_len
        peptide = db.peptides[pep_i]
        n_ions = len(peptide.sequence) - 1
        frags = Fragments()
        zs = np.arange(1, self.Z + 1, dtype=np.float32)
        for s, kind in enumerate(self.series):
            for l in range(n_ions):
                for zi in range(self.Z):
                    pk = int(midx[item_i, s, l, zi])
                    if pk < 0:
                        continue
                    calc_mz = F32(F32(b_host[item_i, s, l] / zs[zi]) + PROTON)
                    exp_mz = F32(masses[si, pk] + PROTON)
                    ordinal = l + 1 if _SERIES_NTERM[kind] else n_ions - l
                    frags.kinds.append(kind)
                    frags.charges.append(zi + 1)
                    frags.mz_calculated.append(float(calc_mz))
                    frags.mz_experimental.append(float(exp_mz))
                    frags.fragment_ordinals.append(int(ordinal))
                    frags.intensities.append(float(intens[si, pk]))
        return frags

    # ------------------------------------------------------------------
    # Chimera mode (scoring.rs:598-672)
    # ------------------------------------------------------------------

    def _score_chimera(self, spectra) -> List[Feature]:
        p = self.params
        prelim = self._preliminary(spectra)
        masses, intens, Pk = self._pad_peaks(spectra)
        removed = np.zeros_like(intens, dtype=bool)
        tic = np.array([s.total_ion_current for s in spectra], dtype=np.float32)
        results: List[List[Feature]] = [[] for _ in spectra]
        active = set(range(len(spectra)))
        for _ in range(p.report_psms):
            if not active:
                break
            feats = self._build_features_batch(
                spectra, prelim, masses, intens, Pk, 1,
                removed_masks=removed, tic_override=tic,
            )
            newly = set()
            for si in list(active):
                fl = feats[si]
                if not fl:
                    continue
                feat = fl[0]
                feat.rank = len(results[si]) + 1
                results[si].append(feat)
                newly.add(si)
                # Remove peaks matched by this PSM's full ladders
                self._remove_matched(si, feat, masses, intens, removed)
                tic[si] = seq_f32_sum_rows(
                    np.where(removed[si], 0.0, np.where(np.isfinite(masses[si]), intens[si], 0.0))[None, :],
                    np.array([intens.shape[1]], dtype=np.int32),
                )[0]
            active = {si for si in newly if len(results[si]) < p.report_psms}
        out: List[Feature] = []
        for fl in results:
            out.extend(fl)
        return out

    def _remove_matched(self, si, feat, masses, intens, removed):
        """scoring.rs:598-644: mark peaks matched by the PSM's complete
        theoretical ladder (all charges) as removed."""
        from ..spectrum.processor import select_most_intense_peak

        db = self.db
        pep_i = feat.peptide_idx
        b_host, _ = _host_ladders(db, [pep_i], self.series)
        n_ions = len(db.peptides[pep_i].sequence) - 1
        mzmax = max_fragment_charge(self.params.max_fragment_charge, feat.charge)
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


class _Run:
    """The longest-continuous-ion-ladder tracker (scoring.rs:771-793),
    including its initial-state quirk (last == 0 swallows index 0)."""

    __slots__ = ("start", "length", "last", "longest")

    def __init__(self):
        self.start = 0
        self.length = 0
        self.last = 0
        self.longest = 0

    def matched(self, index: int):
        if self.last == index:
            return
        if self.start + self.length == index:
            self.length += 1
            self.longest = max(self.longest, self.length)
        else:
            self.start = index
            self.length = 1
            self.longest = max(self.longest, self.length)
        self.last = index


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
