"""Multi-chip search: device-mesh sharding of the scoring step.

The reference engine's only parallelism is rayon threads on one node
(SURVEY.md §2.4); scale-out here is designed TPU-first instead:

* **Data parallelism** — spectra batches are sharded along the query-row
  axis of a `jax.sharding.Mesh` ("data"). This replaces the reference's
  rayon `par_iter` over MS2 spectra (runner.rs:311-324).

* **Index (model) parallelism** — for open searches the precursor window
  spans most of the peptide table, so the table itself is sharded along
  the peptide axis over the "model" mesh axis; every device scores its
  local peptide shard against every local query row and the per-shard
  top-K candidates merge with an `all_gather` + global top-K. This is the
  TPU analog of the reference's bucketed index walk for ±500 Da windows
  (database.rs:480-536) and the project's "sequence parallelism" axis.

Collectives ride ICI via `shard_map`; there is no host round-trip between
shards. The merged result is bitwise independent of the mesh shape
(counts are integers; ties break on the global peptide index, matching
PreScore Ord, scoring.rs:43-49).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..chem.mass import Tolerance
from ..index.builder import IndexedDatabase, next_power_of_two
from ..ops.search import (
    count_fragment_matches,
    ion_ladders,
    series_valid_mask,
)

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map_mod

    shard_map = _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(n_data: int, n_model: int, devices: Optional[Sequence] = None) -> Mesh:
    """A 2D ("data", "model") mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


@dataclasses.dataclass
class ShardedTables:
    """The peptide table sharded along the peptide axis over "model" and
    replicated over "data". Rows are padded so every model shard has the
    same width; padding rows carry mono = +inf so no precursor window can
    select them."""

    resmass: jax.Array  # f32 [P_pad, L]
    nterm: jax.Array  # f32 [P_pad]
    mono: jax.Array  # f32 [P_pad]
    lens: jax.Array  # i32 [P_pad]
    P_real: int
    P_pad: int
    L: int

    @staticmethod
    def shard(db: IndexedDatabase, mesh: Mesh) -> "ShardedTables":
        t = db.table
        n_pep = len(t)
        n_model = mesh.shape["model"]
        P_pad = max(next_power_of_two(max(n_pep, 1)), 8 * n_model)
        P_pad = ((P_pad + n_model - 1) // n_model) * n_model
        pad = P_pad - n_pep
        L = t.max_len

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        return ShardedTables(
            resmass=put(
                jnp.asarray(np.pad(t.resmass, ((0, pad), (0, 0))), jnp.float32),
                P("model", None),
            ),
            nterm=put(jnp.asarray(np.pad(t.nterm, (0, pad)), jnp.float32), P("model")),
            mono=put(
                jnp.asarray(
                    np.pad(t.mono, (0, pad), constant_values=np.inf), jnp.float32
                ),
                P("model"),
            ),
            lens=put(jnp.asarray(np.pad(t.lens, (0, pad)), jnp.int32), P("model")),
            P_real=n_pep,
            P_pad=P_pad,
            L=L,
        )


class ShardedSearch:
    """Stage-1 preliminary scoring over a 2D device mesh.

    Each call scores `R` query rows (spectrum × charge × isotope
    expansions, R divisible by the "data" axis) against the full peptide
    table (sharded over "model"), returning the global top-K
    (count, peptide index) per row plus the Poisson statistics the
    feature stage needs (total matched peaks, scored candidates)."""

    def __init__(
        self,
        db: IndexedDatabase,
        mesh: Mesh,
        frag_tol: Tolerance,
        Z: int,
        K: int = 50,
        min_ion_index: Optional[int] = None,
    ):
        self.db = db
        self.mesh = mesh
        self.tables = ShardedTables.shard(db, mesh)
        self.series = tuple(db.ion_kinds)
        self.min_ion_index = (
            db.min_ion_index if min_ion_index is None else min_ion_index
        )
        self.frag_tol = frag_tol
        self.Z = Z
        self.K = K
        self._fn_cache = {}

    def _build(self, R: int, Pk: int):
        mesh = self.mesh
        tables = self.tables
        series = self.series
        min_ion_index = self.min_ion_index
        frag_tol = self.frag_tol
        Z = self.Z
        K = self.K
        n_model = mesh.shape["model"]
        P_local = tables.P_pad // n_model
        L = tables.L

        def local_shard(peaks, prec_lo, prec_hi, maxz, resmass, nterm, mono, lens):
            # peaks: [R_l, Pk]; prec_*: [R_l]; tables: local shard [P_l, ...]
            shard_id = jax.lax.axis_index("model")
            base = shard_id.astype(jnp.int32) * P_local

            f = ion_ladders(resmass, nterm, mono, series)  # [S, P_l, L]
            fvalid = series_valid_mask(lens, L, series, min_ion_index)

            def per_row(pk, lo, hi, mz):
                counts = count_fragment_matches(f, fvalid, pk, frag_tol, mz, Z)
                in_window = (mono >= lo) & (mono <= hi)
                counts = jnp.where(in_window, counts, 0)
                matched_total = jnp.sum(counts)
                scored = jnp.sum((counts > 0).astype(jnp.int32))
                # top-K with ties to the HIGHER global peptide index
                # (PreScore Ord, scoring.rs:43-49): reverse the axis so
                # top_k's lowest-index preference picks the highest index.
                rev = counts[::-1]
                k = min(K, P_local)
                vals, ridx = jax.lax.top_k(rev, k)
                pep = base + (P_local - 1 - ridx)
                if k < K:
                    vals = jnp.pad(vals, (0, K - k))
                    pep = jnp.pad(pep, (0, K - k), constant_values=-1)
                return vals, pep, matched_total, scored

            vals, pep, mtot, scored = jax.vmap(per_row)(peaks, prec_lo, prec_hi, maxz)

            # Merge shards: gather per-shard top-K then global top-K, with
            # the same high-peptide-index tie rule.
            allv = jax.lax.all_gather(vals, "model", axis=1, tiled=True)  # [R_l, M*K]
            allp = jax.lax.all_gather(pep, "model", axis=1, tiled=True)
            # Two-key sort (count desc, peptide index desc) — exact for any
            # table size, no packed-key overflow.
            sc, sp = jax.lax.sort((-allv, -allp), dimension=1, num_keys=2)
            gvals = -sc[:, :K]
            gpep = -sp[:, :K]
            mtot = jax.lax.psum(mtot, "model")
            scored = jax.lax.psum(scored, "model")
            return gvals, gpep, mtot, scored

        fn = shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(
                P("data", None),  # peaks [R, Pk]
                P("data"),
                P("data"),
                P("data"),
                P("model", None),  # resmass
                P("model"),
                P("model"),
                P("model"),
            ),
            out_specs=(P("data", None), P("data", None), P("data"), P("data")),
            check_vma=False,
        )

        def run(peaks, prec_lo, prec_hi, maxz):
            return fn(
                peaks,
                prec_lo,
                prec_hi,
                maxz,
                self.tables.resmass,
                self.tables.nterm,
                self.tables.mono,
                self.tables.lens,
            )

        return jax.jit(run)

    def __call__(self, peaks, prec_lo, prec_hi, maxz):
        """peaks f32 [R, Pk] (+inf padded); prec_lo/prec_hi f32 [R] precursor
        mass window; maxz i32 [R] exclusive fragment-charge bound.
        R must be divisible by the data axis. Returns
        (counts [R, K], peptide_idx [R, K], matched_total [R], scored [R])."""
        R, Pk = peaks.shape
        key = (R, Pk)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build(R, Pk)
        return self._fn_cache[key](peaks, prec_lo, prec_hi, maxz)

    # ------------------------------------------------------------------
    # Full sharded search step (stage 1 + stage 2)
    # ------------------------------------------------------------------

    def _build_full(self, R: int, Pk: int):
        """One jitted device program: sharded preliminary scoring, global
        top-K merge, then the full candidate rescore with OWNER-COMPUTES
        sharding — each model shard rescores only the top-K candidates
        whose peptide rows it holds (its ladders are local) and a psum
        over "model" assembles the complete per-candidate features. The
        per-candidate sequential f32 sums run entirely on the owning
        shard, so results are bit-identical to the single-device stage 2
        for any mesh shape."""
        from ..ops.search import rescore_candidate

        mesh = self.mesh
        tables = self.tables
        series = self.series
        frag_tol = self.frag_tol
        Z = self.Z
        K = self.K
        n_model = mesh.shape["model"]
        P_local = tables.P_pad // n_model
        L = tables.L
        stage1 = None  # built inline below to share one shard_map

        def local_shard(
            peaks, intens, prec_lo, prec_hi, maxz,
            resmass, nterm, mono, lens,
        ):
            shard_id = jax.lax.axis_index("model")
            base = shard_id.astype(jnp.int32) * P_local

            f_all = ion_ladders(resmass, nterm, mono, series)  # [S, P_l, L]
            fvalid_idx = series_valid_mask(lens, L, series, self.min_ion_index)

            def per_row(pk, lo, hi, mz):
                counts = count_fragment_matches(
                    f_all, fvalid_idx, pk, frag_tol, mz, Z
                )
                in_window = (mono >= lo) & (mono <= hi)
                counts = jnp.where(in_window, counts, 0)
                matched_total = jnp.sum(counts)
                scored = jnp.sum((counts > 0).astype(jnp.int32))
                rev = counts[::-1]
                k = min(K, P_local)
                vals, ridx = jax.lax.top_k(rev, k)
                pep = base + (P_local - 1 - ridx)
                if k < K:
                    vals = jnp.pad(vals, (0, K - k))
                    pep = jnp.pad(pep, (0, K - k), constant_values=-1)
                return vals, pep, matched_total, scored

            vals, pep, mtot, scored = jax.vmap(per_row)(
                peaks, prec_lo, prec_hi, maxz
            )
            mtot = jax.lax.psum(mtot, "model")
            scored = jax.lax.psum(scored, "model")
            allv = jax.lax.all_gather(vals, "model", axis=1, tiled=True)
            allp = jax.lax.all_gather(pep, "model", axis=1, tiled=True)
            sc, sp = jax.lax.sort((-allv, -allp), dimension=1, num_keys=2)
            gvals = -sc[:, :K]
            gpep = -sp[:, :K]

            # ---- stage 2, owner-computes: full (non-index-filtered)
            # ladders for candidates this shard owns
            ion_idx = jnp.arange(L, dtype=jnp.int32)

            def item(pk, pki_row, pep_g, mz, has):
                owned = (pep_g >= base) & (pep_g < base + P_local) & has
                lp = jnp.clip(pep_g - base, 0, P_local - 1)
                f = ion_ladders(
                    resmass[lp][None, :], nterm[lp][None], mono[lp][None],
                    series,
                )[:, 0, :]
                n_ions = jnp.maximum(lens[lp] - 1, 0)
                fvalid = jnp.broadcast_to(
                    ion_idx[None, :] < n_ions, (len(series), L)
                )
                out = rescore_candidate(
                    f, fvalid, pk, pki_row, mz,
                    series=series, frag_tol=frag_tol, Z=Z,
                )
                return tuple(
                    jnp.where(owned, o.astype(jnp.float32), np.float32(0.0))
                    for o in out
                )

            def row_items(pk, pki_row, peps, mz, vals_row):
                # chunk the K-candidate rescore (scan over chunks) so the
                # [chunk, S, L, Pk] intermediates stay bounded — the
                # sharded demo path rescores all top-K without the fused
                # path's matched>0 compaction
                CH = 10
                KK = peps.shape[0]
                pad = (-KK) % CH
                peps_c = jnp.pad(peps, (0, pad)).reshape(-1, CH)
                vals_c = jnp.pad(vals_row, (0, pad)).reshape(-1, CH)

                def chunk(carry, pv):
                    p, v = pv
                    out = jax.vmap(
                        lambda pg, hv: item(pk, pki_row, pg, mz, hv > 0)
                    )(p, v)
                    return carry, out

                _, outs = jax.lax.scan(chunk, 0, (peps_c, vals_c))
                return tuple(o.reshape(-1)[:KK] for o in outs)

            feats = jax.vmap(row_items)(
                peaks, intens, gpep, maxz, gvals
            )  # tuple of [R_l, K]
            feats = tuple(jax.lax.psum(x, "model") for x in feats)
            return (gvals, gpep) + feats + (mtot, scored)

        fn = shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(
                P("data", None), P("data", None),
                P("data"), P("data"), P("data"),
                P("model", None), P("model"), P("model"), P("model"),
            ),
            out_specs=(P("data", None),) * 9 + (P("data"), P("data")),
            check_vma=False,
        )

        def run(peaks, intens, prec_lo, prec_hi, maxz):
            return fn(
                peaks, intens, prec_lo, prec_hi, maxz,
                self.tables.resmass, self.tables.nterm,
                self.tables.mono, self.tables.lens,
            )

        return jax.jit(run)

    def full_step(self, peaks, intens, prec_lo, prec_hi, maxz):
        """Complete sharded search step. Returns (counts [R, K],
        peptide [R, K], mb, my, summed_b, summed_y, ppm_sum, longest_b,
        longest_y — each f32 [R, K] — plus matched_total [R] and
        scored_candidates [R])."""
        R, Pk = peaks.shape
        key = ("full", R, Pk)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build_full(R, Pk)
        return self._fn_cache[key](peaks, intens, prec_lo, prec_hi, maxz)


class ShardedScorer:
    """User-facing multi-chip scorer: `score_table(spectra)` over a
    ("data", "model") mesh, producing the same columnar FeatureTable as
    the single-device `sage_tpu.Scorer` (bitwise, for any mesh shape).

    Orchestration mirrors the single-device two-pass flow: the host
    expands (spectrum x charge x isotope) query rows, the mesh runs
    `ShardedSearch.full_step` (stage-1 counts sharded over the peptide
    axis, all_gather top-K merge, owner-computes stage-2 rescore with a
    psum), and the host assembles feature columns. The peptide table
    lives sharded in HBM — the single-device path's HBM-resident ladder
    tables replicated-per-shard analog."""

    def __init__(self, db: IndexedDatabase, mesh: Mesh, params):
        from ..ops.search import Scorer

        self.db = db
        self.mesh = mesh
        self.params = params
        # the single-device scorer's host-side machinery (row expansion,
        # merge, feature assembly), without its device tables — device
        # work goes through the mesh instead
        self._host = h = Scorer(db, params, build_device_tables=False)
        self.search = ShardedSearch(
            db, mesh, params.fragment_tol, Z=h.Z, K=h.K
        )
        self._n_data = mesh.shape["data"]

    def score(self, spectra):
        """Row-wise Feature list (parity with Scorer.score)."""
        return self.score_table(spectra).to_features()

    def score_stream(self, batches):
        """Drop-in for Scorer.score_stream: yield one FeatureTable per
        batch. Each full_step is a single device dispatch; the host
        finalize of batch N overlaps the mesh's work on batch N+1 only
        via XLA's async dispatch (no host pipelining yet)."""
        for batch in batches:
            yield self.score_table(batch)

    def score_table(self, spectra):
        from ..ops.features import FeatureTable

        h = self._host
        if not spectra:
            return FeatureTable.empty()
        masses, intens, Pk = h._pad_peaks(spectra)
        rows = h._expand_rows(spectra)
        n_rows = rows["si"].size
        n_spec = len(spectra)
        R = ((max(n_rows, self._n_data) + self._n_data - 1)
             // self._n_data) * self._n_data

        mono = self.db.table.mono
        peaks_r = np.full((R, Pk), np.inf, np.float32)
        intens_r = np.full((R, Pk), -1.0, np.float32)
        lo = np.zeros(R, np.float32)
        hi = np.full(R, -1.0, np.float32)  # empty window for padding rows
        maxz = np.full(R, 2, np.int32)
        peaks_r[:n_rows] = masses[rows["si"]]
        intens_r[:n_rows] = intens[rows["si"]]
        # full_step windows are mass ranges [lo, hi]: reconstruct the f32
        # range endpoints from the peptide-index window so membership is
        # identical to the single-device candidate range
        lo[:n_rows] = np.where(
            rows["i0"] < len(mono), mono[np.minimum(rows["i0"], len(mono) - 1)],
            np.float32(np.inf),
        )
        hi[:n_rows] = np.where(
            rows["i1"] > 0, mono[np.maximum(rows["i1"] - 1, 0)],
            np.float32(-np.inf),
        )
        # empty [i0, i1) windows must stay empty
        empty = rows["i1"] <= rows["i0"]
        lo[:n_rows][empty] = np.float32(np.inf)
        hi[:n_rows][empty] = np.float32(-np.inf)
        cfg = self.params.max_fragment_charge
        cap = np.minimum(rows["z"], cfg + 1) if cfg is not None else rows["z"]
        maxz[:n_rows] = np.maximum(cap, 2)

        out = self.search.full_step(peaks_r, intens_r, lo, hi, maxz)
        counts, pep = (np.asarray(x) for x in out[:2])
        feats = [np.asarray(x) for x in out[2:9]]
        row_mtot = np.asarray(out[9])
        row_scored = np.asarray(out[10])

        # flatten (row, k), drop zero-matched, host-merge with the shared
        # PreScore-ordering helper (one tie-rule definition for both the
        # single-device and sharded paths)
        from ..ops.search import merge_prescore_candidates

        K = h.K
        m = counts[:n_rows].ravel()
        pp = pep[:n_rows].ravel()
        ss = np.repeat(rows["si"], K)
        zz = np.repeat(rows["z"], K)
        ii = np.repeat(rows["iso"], K)
        fcols = [f[:n_rows].reshape(-1) for f in feats]
        sel = merge_prescore_candidates(m, pp, ss, zz, ii, K)
        ssel = ss[sel]

        spec_matched = np.bincount(
            rows["si"], weights=row_mtot[:n_rows], minlength=n_spec
        ).astype(np.int64)
        spec_scored = np.bincount(
            rows["si"], weights=row_scored[:n_rows], minlength=n_spec
        ).astype(np.int64)
        prelim = {
            "cand_matched": m[sel].astype(np.int32),
            "cand_pep": pp[sel].astype(np.int32),
            "cand_spec": ssel.astype(np.int32),
            "cand_charge": zz[sel].astype(np.int32),
            "cand_iso": ii[sel].astype(np.int32),
            "spec_matched": spec_matched,
            "spec_scored": spec_scored,
        }
        packed = np.stack([c[sel].astype(np.float32) for c in fcols], axis=1)
        d2 = {"out_dev": packed, "nI": sel.size, "use_int": intens}
        return h._stage2_finalize(
            spectra, prelim, d2, self.params.report_psms, None, masses, Pk
        )
