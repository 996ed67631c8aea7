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

        # The sharded tables are passed as jit ARGUMENTS (never traced as
        # closure constants — constvar capture materializes them via
        # ._value at lowering time, which blocks behind the device queue;
        # see ops/search.py _build_stage1's identical rule).
        jitted = jax.jit(fn)

        def run(peaks, prec_lo, prec_hi, maxz):
            t = self.tables
            return jitted(
                peaks, prec_lo, prec_hi, maxz,
                t.resmass, t.nterm, t.mono, t.lens,
            )

        return run

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

    def _build_full(self, R: int, Pk: int, Bc: int):
        """One jitted device program: sharded preliminary scoring, global
        top-K merge, then the full candidate rescore with OWNER-COMPUTES
        sharding — each model shard rescores only the top-K candidates
        whose peptide rows it holds (its ladders are local) and a psum
        over "model" assembles the complete per-candidate features. The
        per-candidate sequential f32 sums run entirely on the owning
        shard, so results are bit-identical to the single-device stage 2
        for any mesh shape.

        Stage 2 is COMPACTED (the sharded analog of the fused path's
        matched>0 compaction, scoring.rs:478-595 — only top-K hits get
        the full rescore): each shard packs its live owned (count > 0)
        items to the front with a stable sort and rescores only the
        first `Bc` slots, scattering features back to the [R_l, K] grid.
        The per-shard live count is returned so the host can detect a
        clipped budget and redo at a larger Bc (full_step grows the
        cached budget — same adapt-and-redo contract as the fused
        path's `_bc_hint`)."""
        from ..ops.search import rescore_candidate

        mesh = self.mesh
        tables = self.tables
        series = self.series
        frag_tol = self.frag_tol
        Z = self.Z
        K = self.K
        n_model = mesh.shape["model"]
        n_data = mesh.shape["data"]
        P_local = tables.P_pad // n_model
        L = tables.L
        R_l = R // n_data

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

            # ---- stage 2, owner-computes + live compaction
            feats, nl = self._owner_stage2(
                gvals, gpep, peaks, intens, maxz, base,
                resmass, nterm, mono, lens, Bc, R_l,
            )
            return (gvals, gpep) + feats + (mtot, scored, nl[None])

        fn = shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(
                P("data", None), P("data", None),
                P("data"), P("data"), P("data"),
                P("model", None), P("model"), P("model"), P("model"),
            ),
            out_specs=(
                (P("data", None),) * 9 + (P("data"), P("data"), P("data"))
            ),
            check_vma=False,
        )

        # tables as jit arguments, not closure constants (see _build)
        jitted = jax.jit(fn)

        def run(peaks, intens, prec_lo, prec_hi, maxz):
            t = self.tables
            return jitted(
                peaks, intens, prec_lo, prec_hi, maxz,
                t.resmass, t.nterm, t.mono, t.lens,
            )

        return run

    def _owner_stage2(
        self, gvals, gpep, peaks, intens, maxz, base,
        resmass, nterm, mono, lens, Bc: int, R_l: int,
    ):
        """Owner-computes full rescore of the merged top-K grid with live
        compaction (the sharded analog of the fused path's matched>0
        compaction — only top-K hits get the full rescore,
        scoring.rs:478-595): this shard packs its live owned (count > 0)
        items to the front with a stable sort, rescores only the first
        `Bc` slots in CH-chunked scans, and scatters features back to the
        [R_l, K] grid; a psum over "model" assembles the complete grid.
        Returns (feature tuple, per-shard max live count — the host's
        budget-overflow signal). Runs inside shard_map."""
        from ..ops.search import rescore_candidate

        series = self.series
        frag_tol = self.frag_tol
        Z = self.Z
        K = self.K
        tables = self.tables
        L = tables.L
        n_model = self.mesh.shape["model"]
        P_local = tables.P_pad // n_model

        flat_v = gvals.reshape(-1)  # [R_l * K]
        flat_p = gpep.reshape(-1)
        owned = (flat_p >= base) & (flat_p < base + P_local)
        live = (flat_v > 0) & owned
        n_live = jnp.sum(live.astype(jnp.int32))
        # stable sort packs live item indices to the front
        order = jnp.argsort(
            jnp.where(live, 0, 1).astype(jnp.int32), stable=True
        )
        CH = 32
        Bp = ((Bc + CH - 1) // CH) * CH  # scan-chunk-padded budget
        take = order[:Bc]  # [Bc] flat (row, k) indices
        take = jnp.pad(take, (0, Bp - Bc))
        t_valid = jnp.arange(Bp, dtype=jnp.int32) < jnp.minimum(
            n_live, np.int32(Bc)
        )
        rows_i = (take // K).astype(jnp.int32)
        pep_g = flat_p[take]
        lp = jnp.clip(pep_g - base, 0, P_local - 1)
        ion_idx = jnp.arange(L, dtype=jnp.int32)

        def item(row, lpp, ok):
            f = ion_ladders(
                resmass[lpp][None, :], nterm[lpp][None], mono[lpp][None],
                series,
            )[:, 0, :]
            n_ions = jnp.maximum(lens[lpp] - 1, 0)
            fvalid = jnp.broadcast_to(
                ion_idx[None, :] < n_ions, (len(series), L)
            )
            out = rescore_candidate(
                f, fvalid, peaks[row], intens[row], maxz[row],
                series=series, frag_tol=frag_tol, Z=Z,
            )
            return tuple(
                jnp.where(ok, o.astype(jnp.float32), np.float32(0.0))
                for o in out
            )

        # chunked scan bounds the [CH, S, L, Pk] rescore intermediates
        rows_c = rows_i.reshape(-1, CH)
        lp_c = lp.reshape(-1, CH)
        ok_c = t_valid.reshape(-1, CH)

        def chunk(carry, rlo):
            r, lpp, ok = rlo
            return carry, jax.vmap(item)(r, lpp, ok)

        _, outs = jax.lax.scan(chunk, 0, (rows_c, lp_c, ok_c))
        zeros = jnp.zeros(R_l * K, jnp.float32)
        feats = tuple(jnp.asarray(o).reshape(-1) for o in outs)
        feats = tuple(
            jax.lax.psum(
                zeros.at[take].add(
                    jnp.where(t_valid, o, np.float32(0.0))
                ).reshape(R_l, K),
                "model",
            )
            for o in feats
        )
        nl = jax.lax.pmax(n_live, "model")
        return feats, nl

    def _build_windowed(self, R: int, Pk: int, W: int, Bc: int):
        """Windowed sharded search step — the production NARROW-search
        multi-chip path. Unlike `_build_full` (which scans every local
        peptide per row — the right shape only when precursor windows
        span most of the table, i.e. open search), each row's candidate
        set here is the [i0, i1) slice of the mass-sorted peptide table
        (width <= W, the single-device stage-1 shape, ops/search.py
        _build_stage1). Every model shard slices the overlap of that
        window with its local peptide range (narrow windows hit 1-2
        shards; non-overlapping shards do masked no-op work), so
        per-shard stage-1 compute is R_l x W x ions — the single-device
        cost divided by the data axis — instead of R_l x P_local.
        Merge and owner-computes compacted stage 2 are shared with the
        full path."""
        mesh = self.mesh
        tables = self.tables
        series = self.series
        frag_tol = self.frag_tol
        Z = self.Z
        K = self.K
        n_model = mesh.shape["model"]
        n_data = mesh.shape["data"]
        P_local = tables.P_pad // n_model
        L = tables.L
        R_l = R // n_data
        assert W <= P_local, (W, P_local)

        def local_shard(
            peaks, intens, i0, i1, maxz,
            resmass, nterm, mono, lens,
        ):
            shard_id = jax.lax.axis_index("model")
            base = shard_id.astype(jnp.int32) * P_local

            def per_row(pk, g0, g1, mz):
                # local overlap of the global index window [g0, g1)
                lo_l = jnp.clip(g0 - base, 0, P_local)
                hi_l = jnp.clip(g1 - base, 0, P_local)
                p0 = jnp.clip(lo_l, 0, P_local - W)
                res = jax.lax.dynamic_slice(resmass, (p0, 0), (W, L))
                ntm = jax.lax.dynamic_slice(nterm, (p0,), (W,))
                mono_c = jax.lax.dynamic_slice(mono, (p0,), (W,))
                lens_c = jax.lax.dynamic_slice(lens, (p0,), (W,))
                f = ion_ladders(res, ntm, mono_c, series)  # [S, W, L]
                fvalid = series_valid_mask(
                    lens_c, L, series, self.min_ion_index
                )
                lidx = p0 + jnp.arange(W, dtype=jnp.int32)
                cand_valid = (lidx >= lo_l) & (lidx < hi_l)
                counts = count_fragment_matches(
                    f, fvalid, pk, frag_tol, mz, Z
                )
                counts = jnp.where(cand_valid, counts, 0)
                matched_total = jnp.sum(counts)
                scored = jnp.sum((counts > 0).astype(jnp.int32))
                # top-k with ties to the higher peptide index (PreScore
                # Ord): reversed-axis top_k, like the single-device path
                k = min(K, W)
                rev = counts[::-1]
                vals, ridx = jax.lax.top_k(rev, k)
                pep = base + p0 + (W - 1 - ridx)
                if k < K:
                    vals = jnp.pad(vals, (0, K - k))
                    pep = jnp.pad(pep, (0, K - k), constant_values=-1)
                return vals, pep, matched_total, scored

            vals, pep, mtot, scored = jax.vmap(per_row)(
                peaks, i0, i1, maxz
            )
            mtot = jax.lax.psum(mtot, "model")
            scored = jax.lax.psum(scored, "model")
            allv = jax.lax.all_gather(vals, "model", axis=1, tiled=True)
            allp = jax.lax.all_gather(pep, "model", axis=1, tiled=True)
            sc, sp = jax.lax.sort((-allv, -allp), dimension=1, num_keys=2)
            gvals = -sc[:, :K]
            gpep = -sp[:, :K]
            feats, nl = self._owner_stage2(
                gvals, gpep, peaks, intens, maxz, base,
                resmass, nterm, mono, lens, Bc, R_l,
            )
            return (gvals, gpep) + feats + (mtot, scored, nl[None])

        fn = shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(
                P("data", None), P("data", None),
                P("data"), P("data"), P("data"),
                P("model", None), P("model"), P("model"), P("model"),
            ),
            out_specs=(
                (P("data", None),) * 9 + (P("data"), P("data"), P("data"))
            ),
            check_vma=False,
        )

        # tables as jit arguments, not closure constants (see _build)
        jitted = jax.jit(fn)

        def run(peaks, intens, i0, i1, maxz):
            t = self.tables
            return jitted(
                peaks, intens, i0, i1, maxz,
                t.resmass, t.nterm, t.mono, t.lens,
            )

        return run

    # ------------------------------------------------------------------
    # Banded open search: the fragment index sharded along "model"
    # ------------------------------------------------------------------

    def _open_tables(self):
        """Per-shard fragment index: entries partitioned by OWNING model
        shard (peptide-range bands — the band key IS the mass-range
        shard key), m/z-sorted within each shard, padded to a uniform
        width and device_put sharded along "model". The TPU realization
        of the north star's "fragment index mass-range sharded for open
        search" (database.rs:480-536)."""
        if getattr(self, "_open_tbl", None) is None:
            from ..ops.open_search import V_ROW

            db = self.db
            assert db.fragment_mz_flat is not None, (
                "banded open sharding needs the flat fragment index"
            )
            n_model = self.mesh.shape["model"]
            P_local = self.tables.P_pad // n_model
            pep = db.fragment_pep_flat.astype(np.int32)
            mz = db.fragment_mz_flat
            shard = np.minimum(pep // np.int32(P_local), n_model - 1)
            order = np.argsort(shard, kind="stable")  # keeps m/z order
            pep_s = pep[order]
            mz_s = mz[order]
            counts = np.bincount(shard, minlength=n_model)
            offs = np.concatenate([[0], np.cumsum(counts)])
            N_l = max(
                ((int(counts.max()) + V_ROW - 1) // V_ROW) * V_ROW,
                2 * V_ROW,
            )
            pep_pad = np.full((n_model, N_l), -1, np.int32)
            segs = []
            for m in range(n_model):
                c = int(counts[m])
                pep_pad[m, :c] = pep_s[offs[m] : offs[m + 1]]
                segs.append(mz_s[offs[m] : offs[m + 1]])
            dev = jax.device_put(
                jnp.asarray(pep_pad.reshape(n_model, N_l // V_ROW, V_ROW)),
                NamedSharding(self.mesh, P("model", None, None)),
            )
            self._open_tbl = (dev, segs, N_l)
        return self._open_tbl

    def open_ranges(self, masses):
        """Host planning: per (shard, spectrum, z, peak) in-tolerance
        fragment ranges over each shard's m/z-sorted segment — the exact
        f32 window semantics of the single-device open ranges
        (ops/open_search.py OpenSearcher.ranges). masses: [B, Pk] peak
        masses (+inf padded). Returns (starts, lens) i32
        [M, B, Z*Pk]."""
        _, segs, _ = self._open_tables()
        M = len(segs)
        B, Pk = masses.shape
        Z = self.Z
        starts = np.zeros((M, B, Z * Pk), np.int32)
        lens = np.zeros((M, B, Z * Pk), np.int32)
        for zi in range(Z):
            q = (masses * np.float32(zi + 1)).astype(np.float32)
            with np.errstate(invalid="ignore"):
                lo, hi = self.frag_tol.bounds(q)
            bad = ~np.isfinite(lo) | ~np.isfinite(hi)
            col = slice(zi * Pk, (zi + 1) * Pk)
            for m in range(M):
                seg = segs[m]
                if seg.size == 0:
                    continue
                hit = ~bad & (hi >= seg[0]) & (lo <= seg[-1])
                s = np.zeros(lo.shape, np.int64)
                e = np.zeros(lo.shape, np.int64)
                if hit.any():
                    s[hit] = np.searchsorted(seg, lo[hit], side="left")
                    e[hit] = np.searchsorted(seg, hi[hit], side="right")
                starts[m, :, col] = s.astype(np.int32)
                lens[m, :, col] = np.maximum(e - s, 0).astype(np.int32)
        return starts, lens

    def _build_open(self, R: int, Pk: int, B: int, F: int, Bc: int):
        """Mass-range-sharded banded open search step: each model shard
        runs the peak-major gather/sort/run-length count
        (ops/open_search._open_count_core) over ITS fragment segment —
        counts per peptide are complete locally because a peptide's
        entries live wholly in one shard — then the per-shard top-K
        merges with the same all_gather + 2-key sort as the windowed
        path, and the owner-computes compacted stage 2 is shared
        verbatim. Bitwise-equal to the single-device banded open path
        for any mesh shape.

        The [B, F] entry sort is replicated across the "data" axis
        (each data shard counts only its own query rows against it);
        model parallelism carries the open regime's dominant cost (the
        per-shard entry volume), data parallelism the per-row work."""
        from ..ops.open_search import _open_count_core

        mesh = self.mesh
        tables = self.tables
        Z = self.Z
        K = self.K
        n_model = mesh.shape["model"]
        n_data = mesh.shape["data"]
        P_local = tables.P_pad // n_model
        R_l = R // n_data

        def local_shard(
            peaks, intens, si, i0, i1, maxz,
            pep8, starts, lens_r,
            resmass, nterm, mono, lens_t,
        ):
            shard_id = jax.lax.axis_index("model")
            base = shard_id.astype(jnp.int32) * P_local
            vals, pep, mtot, scored = _open_count_core(
                pep8[0], starts[0], lens_r[0],
                si, i0, i1, maxz,
                F=F, Wc=8, Pk=Pk, Z=Z, K=K, R=R_l, chunked=False,
            )
            pep = jnp.where(vals > 0, pep, -1)
            mtot = jax.lax.psum(mtot, "model")
            scored = jax.lax.psum(scored, "model")
            allv = jax.lax.all_gather(vals, "model", axis=1, tiled=True)
            allp = jax.lax.all_gather(pep, "model", axis=1, tiled=True)
            sc, sp = jax.lax.sort((-allv, -allp), dimension=1, num_keys=2)
            gvals = -sc[:, :K]
            gpep = -sp[:, :K]
            feats, nl = self._owner_stage2(
                gvals, gpep, peaks, intens, maxz, base,
                resmass, nterm, mono, lens_t, Bc, R_l,
            )
            return (gvals, gpep) + feats + (mtot, scored, nl[None])

        fn = shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(
                P("data", None), P("data", None),
                P("data"), P("data"), P("data"), P("data"),
                P("model", None, None),
                P("model", None, None), P("model", None, None),
                P("model", None), P("model"), P("model"), P("model"),
            ),
            out_specs=(
                (P("data", None),) * 9 + (P("data"), P("data"), P("data"))
            ),
            check_vma=False,
        )
        jitted = jax.jit(fn)

        def run(peaks, intens, si, i0, i1, maxz, starts, lens_r):
            t = self.tables
            dev, _, _ = self._open_tables()
            return jitted(
                peaks, intens, si, i0, i1, maxz,
                dev, starts, lens_r,
                t.resmass, t.nterm, t.mono, t.lens,
            )

        return run

    def open_dispatch(self, peaks, intens, si, i0, i1, maxz, masses):
        """Async banded open step: host range planning + mesh dispatch,
        no fetch (same contract as windowed_dispatch). ``masses`` is the
        per-SPECTRUM [B, Pk] peak array (ranges are planned once per
        spectrum; rows reference them through ``si``)."""
        from ..ops.open_search import _quarter_octave

        from ..ops.open_search import OpenSearcher

        R, Pk = peaks.shape
        B = masses.shape[0]
        starts, lens_r = self.open_ranges(masses)
        per_shard_max = lens_r.sum(axis=2).max()
        F = _quarter_octave(int(per_shard_max) + 1)
        F = ((max(F, self.K, 128) + 127) // 128) * 128
        if B * F > OpenSearcher.MAX_ELEMENTS:
            # per-cell [B, F] entry matrices would blow the device
            # budget (very deep open searches): the caller falls back
            # to the whole-table-scan path, which has no F axis
            return None
        key = ("bc_open", R, Pk)
        Bc = self._fn_cache.get(key, self._initial_bc(R))
        fkey = ("open", R, Pk, B, F, Bc)
        if fkey not in self._fn_cache:
            self._fn_cache[fkey] = self._build_open(R, Pk, B, F, Bc)
        starts_dev = jax.device_put(
            jnp.asarray(starts), NamedSharding(self.mesh, P("model", None, None))
        )
        lens_dev = jax.device_put(
            jnp.asarray(lens_r), NamedSharding(self.mesh, P("model", None, None))
        )
        out = self._fn_cache[fkey](
            peaks, intens, si, i0, i1, maxz, starts_dev, lens_dev
        )
        return {
            "out": out, "Bc": Bc, "bc_key": key,
            "kind": ("open", B, F),
            "args": (peaks, intens, si, i0, i1, maxz, starts_dev,
                     lens_dev),
        }

    def windowed_step(self, peaks, intens, i0, i1, maxz, W: int):
        """Windowed sharded search step (narrow regime): query windows
        are [i0, i1) peptide-INDEX ranges (i32 [R]), W the static pow2
        window width (>= every i1-i0). Same outputs and budget-growth
        contract as full_step."""
        return self.step_result(
            self.windowed_dispatch(peaks, intens, i0, i1, maxz, W)
        )

    def windowed_dispatch(self, peaks, intens, i0, i1, maxz, W: int):
        """Async half of :meth:`windowed_step`: dispatches at the
        learned stage-2 budget and returns a handle dict WITHOUT
        fetching, so a stream driver can overlap this batch's device
        execution with the previous batch's host finalize. Pass to
        :meth:`step_result` to fetch + budget-check."""
        R, Pk = peaks.shape
        key = ("bc_win", R, Pk)
        Bc = self._fn_cache.get(key, self._initial_bc(R))
        fkey = ("win", R, Pk, W, Bc)
        if fkey not in self._fn_cache:
            self._fn_cache[fkey] = self._build_windowed(R, Pk, W, Bc)
        out = self._fn_cache[fkey](peaks, intens, i0, i1, maxz)
        return {
            "out": out, "Bc": Bc, "bc_key": key, "kind": ("win", W),
            "args": (peaks, intens, i0, i1, maxz),
        }

    def step_result(self, d):
        """Fetch a dispatched step's budget signal and redo at a larger
        stage-2 budget if any shard's live candidates were clipped
        (rare; the learned per-shape budget converges after the first
        overflow). Returns the 11 result arrays."""
        peaks = d["args"][0]
        R, Pk = peaks.shape
        n_data = self.mesh.shape["data"]
        cap = (R // n_data) * self.K
        out, Bc = d["out"], d["Bc"]
        while True:
            n_live = int(np.max(np.asarray(out[11])))
            if n_live <= Bc or Bc >= cap:
                self._fn_cache[d["bc_key"]] = Bc
                return out[:11]
            Bc = min(next_power_of_two(max(n_live, Bc * 2)), cap)
            if d["kind"][0] == "win":
                fkey = ("win", R, Pk, d["kind"][1], Bc)
                if fkey not in self._fn_cache:
                    self._fn_cache[fkey] = self._build_windowed(
                        R, Pk, d["kind"][1], Bc
                    )
            elif d["kind"][0] == "open":
                _, B, F = d["kind"]
                fkey = ("open", R, Pk, B, F, Bc)
                if fkey not in self._fn_cache:
                    self._fn_cache[fkey] = self._build_open(
                        R, Pk, B, F, Bc
                    )
            else:
                fkey = ("full", R, Pk, Bc)
                if fkey not in self._fn_cache:
                    self._fn_cache[fkey] = self._build_full(R, Pk, Bc)
            out = self._fn_cache[fkey](*d["args"])

    def _initial_bc(self, R: int) -> int:
        """Starting per-shard stage-2 item budget: ~8 live candidates per
        local row (live items are usually a small fraction of the K=50
        top-K slots), pow2-rounded, never above the rescore-everything
        bound R_l * K."""
        n_data = self.mesh.shape["data"]
        R_l = max(R // n_data, 1)
        cap = R_l * self.K
        return min(next_power_of_two(max(256, R_l * 8)), cap)

    def full_step(self, peaks, intens, prec_lo, prec_hi, maxz):
        """Complete sharded search step. Returns (counts [R, K],
        peptide [R, K], mb, my, summed_b, summed_y, ppm_sum, longest_b,
        longest_y — each f32 [R, K] — plus matched_total [R] and
        scored_candidates [R]). Grows the per-shape stage-2 budget and
        re-dispatches when a shard's live candidates exceeded it."""
        return self.step_result(
            self.full_dispatch(peaks, intens, prec_lo, prec_hi, maxz)
        )

    def full_dispatch(self, peaks, intens, prec_lo, prec_hi, maxz):
        """Async half of :meth:`full_step` (see windowed_dispatch)."""
        R, Pk = peaks.shape
        # budget learned per regime: the whole-table scan's live-candidate
        # profile is far heavier than the windowed path's, so sharing one
        # learned Bc would force overflow redos and oversized compiles
        key = ("bc_full", R, Pk)
        Bc = self._fn_cache.get(key, self._initial_bc(R))
        fkey = ("full", R, Pk, Bc)
        if fkey not in self._fn_cache:
            self._fn_cache[fkey] = self._build_full(R, Pk, Bc)
        out = self._fn_cache[fkey](peaks, intens, prec_lo, prec_hi, maxz)
        return {
            "out": out, "Bc": Bc, "bc_key": key, "kind": ("full",),
            "args": (peaks, intens, prec_lo, prec_hi, maxz),
        }

    # ------------------------------------------------------------------
    # Candidate-list rescore (chimera rounds)
    # ------------------------------------------------------------------

    def _build_rescore(self, C: int, Pk: int):
        """Owner-computes rescore of an explicit candidate list — the
        mesh analog of the single-device stage-2-only dispatch that
        chimera rounds re-run with masked peaks (scoring.rs:598-672).
        Candidates are sharded over "data" (each row carries its own
        peak copy, so no spectrum grouping is needed); each model shard
        rescores the candidates whose peptide rows it owns and a psum
        assembles the full [C, 7] feature pack — bit-identical to the
        single-device rescore for any mesh shape."""
        from ..ops.search import rescore_candidate

        mesh = self.mesh
        series = self.series
        frag_tol = self.frag_tol
        Z = self.Z
        tables = self.tables
        L = tables.L
        n_model = mesh.shape["model"]
        n_data = mesh.shape["data"]
        P_local = tables.P_pad // n_model
        C_l = C // n_data

        def local_shard(peaks, intens, pep, maxz, resmass, nterm, mono, lens):
            shard_id = jax.lax.axis_index("model")
            base = shard_id.astype(jnp.int32) * P_local
            ion_idx = jnp.arange(L, dtype=jnp.int32)

            def item(pk, ii, pg, mz):
                owned = (pg >= base) & (pg < base + P_local)
                lpp = jnp.clip(pg - base, 0, P_local - 1)
                f = ion_ladders(
                    resmass[lpp][None, :], nterm[lpp][None],
                    mono[lpp][None], series,
                )[:, 0, :]
                n_ions = jnp.maximum(lens[lpp] - 1, 0)
                fvalid = jnp.broadcast_to(
                    ion_idx[None, :] < n_ions, (len(series), L)
                )
                out = rescore_candidate(
                    f, fvalid, pk, ii, mz,
                    series=series, frag_tol=frag_tol, Z=Z,
                )
                return tuple(
                    jnp.where(owned, o.astype(jnp.float32), np.float32(0.0))
                    for o in out
                )

            CH = 32
            pk_c = peaks.reshape(-1, CH, peaks.shape[1])
            ii_c = intens.reshape(-1, CH, intens.shape[1])
            pep_c = pep.reshape(-1, CH)
            mz_c = maxz.reshape(-1, CH)

            def chunk(carry, x):
                pk, ii, pg, mz = x
                return carry, jax.vmap(item)(pk, ii, pg, mz)

            _, outs = jax.lax.scan(chunk, 0, (pk_c, ii_c, pep_c, mz_c))
            packed = jnp.stack(
                [jnp.asarray(o).reshape(-1) for o in outs], axis=1
            )  # [C_l, 7]
            return jax.lax.psum(packed, "model")

        fn = shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(
                P("data", None), P("data", None), P("data"), P("data"),
                P("model", None), P("model"), P("model"), P("model"),
            ),
            out_specs=P("data", None),
            check_vma=False,
        )
        jitted = jax.jit(fn)

        def run(peaks, intens, pep, maxz):
            t = self.tables
            return jitted(
                peaks, intens, pep, maxz,
                t.resmass, t.nterm, t.mono, t.lens,
            )

        return run

    def rescore(self, peaks, intens, pep, maxz):
        """Rescore an explicit candidate list on the mesh: peaks/intens
        f32 [C, Pk] per candidate, pep i32 [C] global peptide index (-1
        for padding), maxz i32 [C]. C must be divisible by (data axis x
        32). Returns packed f32 [C, 7] (mb, my, summed_b, summed_y,
        ppm_sum, longest_b, longest_y)."""
        C, Pk = peaks.shape
        key = ("rescore", C, Pk)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build_rescore(C, Pk)
        return self._fn_cache[key](peaks, intens, pep, maxz)


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
        """Drop-in for Scorer.score_stream: pipelined like the
        single-device stream (same shared driver) — the host finalize
        of batch N overlaps the mesh's execution of batch N+1, so the
        meshed stream's wall-clock tracks max(device, host) rather than
        their sum (runner.rs:311-324 is the bar: search must saturate
        the execution engine)."""
        from ..ops.search import pipeline_stream

        if self.params.chimera:
            # chimera rounds are data-dependent re-dispatches; stream
            # them unpipelined like the single-device path
            from ..ops.features import FeatureTable

            for batch in batches:
                yield self.score_table(batch) if batch \
                    else FeatureTable.empty()
            return
        yield from pipeline_stream(
            batches, self._dispatch, self._advance, self._finalize
        )

    def score_table(self, spectra):
        from ..ops.features import FeatureTable

        if not spectra:
            return FeatureTable.empty()
        if self.params.chimera:
            return self._score_chimera(spectra)
        return self._finalize(self._advance(self._dispatch(spectra)))

    def _dispatch(self, spectra):
        """Host prep + async mesh dispatch for one batch (no fetch)."""
        h = self._host
        masses, intens, Pk = h._pad_peaks(spectra)
        rows = h._expand_rows(spectra)
        n_rows = rows["si"].size
        n_spec = len(spectra)
        R = ((max(n_rows, self._n_data) + self._n_data - 1)
             // self._n_data) * self._n_data

        mono = self.db.table.mono
        peaks_r = np.full((R, Pk), np.inf, np.float32)
        intens_r = np.full((R, Pk), -1.0, np.float32)
        maxz = np.full(R, 2, np.int32)
        peaks_r[:n_rows] = masses[rows["si"]]
        intens_r[:n_rows] = intens[rows["si"]]
        cfg = self.params.max_fragment_charge
        cap = np.minimum(rows["z"], cfg + 1) if cfg is not None else rows["z"]
        maxz[:n_rows] = np.maximum(cap, 2)

        import os

        max_win = int((rows["i1"] - rows["i0"]).max()) if n_rows else 1
        W = next_power_of_two(max(max_win, 8))
        P_local = self.search.tables.P_pad // self.mesh.shape["model"]
        windowed = W <= P_local and os.environ.get(
            "SAGE_TPU_SHARD_WINDOWED", "1"
        ) != "0"
        if windowed:
            # narrow regime: [i0, i1) peptide-index windows, W-wide
            # dynamic slices per shard (single-device stage-1 shape / n_data)
            i0 = np.zeros(R, np.int32)
            i1 = np.zeros(R, np.int32)  # empty window for padding rows
            i0[:n_rows] = rows["i0"]
            i1[:n_rows] = rows["i1"]
            d = self.search.windowed_dispatch(
                peaks_r, intens_r, i0, i1, maxz, W
            )
        elif (
            self.db.fragment_mz_flat is not None
            and os.environ.get("SAGE_TPU_SHARD_OPEN", "1") != "0"
        ):
            # open regime: the BANDED fragment-index open search, mass-
            # range sharded along "model" (the band key IS the shard
            # key) — each shard gather/sort/run-length counts its own
            # fragment segment (ops/open_search core), merged like the
            # windowed path
            i0 = np.zeros(R, np.int32)
            i1 = np.zeros(R, np.int32)
            si_r = np.zeros(R, np.int32)
            i0[:n_rows] = rows["i0"]
            i1[:n_rows] = rows["i1"]
            si_r[:n_rows] = rows["si"]
            d = self.search.open_dispatch(
                peaks_r, intens_r, si_r, i0, i1, maxz, masses
            )
            if d is None:  # element budget: whole-table scan instead
                d = self._full_fallback(mono, rows, n_rows, R, peaks_r,
                                        intens_r, maxz)
        else:
            d = self._full_fallback(mono, rows, n_rows, R, peaks_r,
                                    intens_r, maxz)
        return {
            "spectra": spectra, "masses": masses, "intens": intens,
            "Pk": Pk, "rows": rows, "n_rows": n_rows, "n_spec": n_spec,
            "d": d,
        }

    def _full_fallback(self, mono, rows, n_rows, R, peaks_r, intens_r,
                       maxz):
        """Whole-table scan per shard with f32 mass-range membership;
        endpoints reconstructed from the index window so membership is
        identical to the single-device candidate range."""
        lo = np.zeros(R, np.float32)
        hi = np.full(R, -1.0, np.float32)
        lo[:n_rows] = np.where(
            rows["i0"] < len(mono),
            mono[np.minimum(rows["i0"], len(mono) - 1)],
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
        return self.search.full_dispatch(peaks_r, intens_r, lo, hi, maxz)

    def _advance(self, e):
        """Blocking fetch (+ rare budget redo) of a dispatched batch."""
        out = self.search.step_result(e["d"])
        e["counts"], e["pep"] = (np.asarray(x) for x in out[:2])
        e["feats"] = [np.asarray(x) for x in out[2:9]]
        e["row_mtot"] = np.asarray(out[9])
        e["row_scored"] = np.asarray(out[10])
        return e

    def _finalize(self, e):
        prelim, packed = self._merge_prelim(e)
        d2 = {"out_dev": packed, "nI": prelim["cand_spec"].size,
              "use_int": e["intens"]}
        return self._host._stage2_finalize(
            e["spectra"], prelim, d2, self.params.report_psms, None,
            e["masses"], e["Pk"],
        )

    def _merge_prelim(self, e):
        """Host merge of the fetched [R, K] grids: flatten (row, k),
        drop zero-matched, PreScore-order with the shared helper (one
        tie-rule definition for both the single-device and sharded
        paths). Returns (prelim dict, packed [N, 7] f32 features)."""
        from ..ops.search import merge_prescore_candidates

        rows, n_rows, n_spec = e["rows"], e["n_rows"], e["n_spec"]
        K = self._host.K
        m = e["counts"][:n_rows].ravel()
        pp = e["pep"][:n_rows].ravel()
        ss = np.repeat(rows["si"], K)
        zz = np.repeat(rows["z"], K)
        ii = np.repeat(rows["iso"], K)
        fcols = [f[:n_rows].reshape(-1) for f in e["feats"]]
        sel = merge_prescore_candidates(m, pp, ss, zz, ii, K)
        ssel = ss[sel]

        spec_matched = np.bincount(
            rows["si"], weights=e["row_mtot"][:n_rows], minlength=n_spec
        ).astype(np.int64)
        spec_scored = np.bincount(
            rows["si"], weights=e["row_scored"][:n_rows], minlength=n_spec
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
        return prelim, packed

    # ------------------------------------------------------------------
    # Chimera mode on the mesh (scoring.rs:598-672)
    # ------------------------------------------------------------------

    def _score_chimera(self, spectra):
        """Chimera = iterative re-search with peak removal. The
        preliminary candidate set is computed once by the ordinary
        sharded step; every round's full rescore of that set with the
        masked peaks is an ordinary mesh rescore (`ShardedSearch
        .rescore`, owner-computes + psum), so results are byte-identical
        to the single-device chimera for any mesh shape. The round
        bookkeeping (peak removal, TIC recompute, rank assembly) is the
        single-device host logic, shared via `chimera_rounds`."""
        from ..ops.search import chimera_rounds

        h = self._host
        e = self._advance(self._dispatch(spectra))
        prelim, packed0 = self._merge_prelim(e)
        masses, intens, Pk = e["masses"], e["intens"], e["Pk"]

        def features_table(removed, tic):
            if not removed.any():
                # round 0: the fused step's features ARE the unmasked
                # rescore — reuse instead of re-dispatching
                packed = packed0
            else:
                use_int = np.where(removed, -1.0, intens).astype(np.float32)
                packed = self._rescore_candidates(
                    prelim, masses, use_int, Pk
                )
            d2 = {
                "out_dev": packed, "nI": prelim["cand_spec"].size,
                "use_int": (
                    np.where(removed, -1.0, intens).astype(np.float32)
                    if removed.any() else intens
                ),
            }
            return h._stage2_finalize(
                spectra, prelim, d2, 1, tic, masses, Pk
            )

        return chimera_rounds(h, spectra, masses, intens, features_table)

    def _rescore_candidates(self, prelim, masses, use_int, Pk):
        """Mesh rescore of prelim's candidate list with (masked) peak
        intensities; returns packed f32 [nI, 7]."""
        spec_i = prelim["cand_spec"]
        pep_i = prelim["cand_pep"]
        chg = prelim["cand_charge"]
        nI = spec_i.size
        grain = self._n_data * 32  # data shards x rescore scan chunk
        C = max(next_power_of_two(max(nI, 1)), grain)
        C = ((C + grain - 1) // grain) * grain
        peaks_c = np.full((C, Pk), np.inf, np.float32)
        intens_c = np.full((C, Pk), -1.0, np.float32)
        pep_c = np.full(C, -1, np.int32)
        maxz_c = np.full(C, 2, np.int32)
        peaks_c[:nI] = masses[spec_i]
        intens_c[:nI] = use_int[spec_i]
        pep_c[:nI] = pep_i
        cfg = self.params.max_fragment_charge
        cap = np.minimum(chg, cfg + 1) if cfg is not None else chg
        maxz_c[:nI] = np.minimum(np.maximum(cap, 2), self._host.Z + 1)
        out = self.search.rescore(peaks_c, intens_c, pep_c, maxz_c)
        return np.asarray(out)[:nI]
