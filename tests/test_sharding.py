"""Multi-chip sharded search must be bitwise identical to single-device:
the mass-range-sharded peptide table + all_gather top-K merge reproduces
the same candidate set, counts, and Poisson statistics for every mesh
shape (the TPU analog of the reference's index-query invariant,
sage/tests/integration.rs:30-70)."""

import numpy as np
import pytest

from sage_tpu.chem.fasta import Fasta
from sage_tpu.chem.mass import Tolerance
from sage_tpu.index.builder import DatabaseParams
from sage_tpu.parallel.sharding import ShardedSearch, make_mesh

FASTA = "/root/reference/tests/Q99536.fasta"


@pytest.fixture(scope="module")
def db():
    params = DatabaseParams()
    fasta = Fasta.parse(open(FASTA).read(), params.decoy_tag, True)
    return params.build(fasta)


@pytest.fixture(scope="module")
def queries(db):
    rng = np.random.default_rng(0)
    b, y = db.table.ladders()
    mono = db.table.mono
    R, Pk = 8, 64
    peaks = np.full((R, Pk), np.inf, np.float32)
    lo = np.zeros(R, np.float32)
    hi = np.zeros(R, np.float32)
    for r in range(R):
        i = int(rng.integers(0, len(db)))
        n = max(int(db.table.lens[i]) - 1, 1)
        frs = np.concatenate([b[i, :n], y[i, :n]])
        take = rng.choice(frs, size=min(20, len(frs)), replace=False)
        peaks[r, : len(take)] = np.sort(take)
        lo[r] = mono[i] - 0.01
        hi[r] = mono[i] + 0.01
    maxz = np.full(R, 2, np.int32)
    return peaks, lo, hi, maxz


def _run(db, queries, n_data, n_model):
    import jax

    if len(jax.devices()) < n_data * n_model:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_data, n_model)
    ss = ShardedSearch(db, mesh, Tolerance("ppm", -10.0, 10.0), Z=1, K=50)
    return tuple(np.asarray(x) for x in ss(*queries))


@pytest.mark.parametrize("shape", [(1, 2), (2, 1), (4, 2), (2, 4), (8, 1), (1, 8)])
def test_sharded_matches_single_device(db, queries, shape):
    ref = _run(db, queries, 1, 1)
    got = _run(db, queries, *shape)
    for r, g in zip(ref, got):
        assert np.array_equal(r, g)


def test_sharded_counts_match_reference_query(db, queries):
    """Top-1 counts agree with the host-side bucketed-index query."""
    peaks, lo, hi, maxz = queries
    vals, pep, mtot, scored = _run(db, queries, 2, 2)
    ftol = Tolerance("ppm", -10.0, 10.0)
    for r in range(peaks.shape[0]):
        finite = peaks[r][np.isfinite(peaks[r])]
        # host count for the top candidate
        count = 0
        for m in finite:
            flo, fhi = ftol.bounds(np.float32(m))
            hits = db.query_fragments(lo[r], hi[r], flo, fhi)
            count += int((db.fragment_pep[hits] == pep[r, 0]).sum())
        assert count == vals[r, 0]


def _run_full(db, queries, n_data, n_model):
    import jax

    if len(jax.devices()) < n_data * n_model:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_data, n_model)
    ss = ShardedSearch(db, mesh, Tolerance("ppm", -10.0, 10.0), Z=1, K=50)
    peaks, lo, hi, maxz = queries
    rng = np.random.default_rng(7)
    intens = np.where(
        np.isfinite(peaks), rng.uniform(1.0, 1e4, peaks.shape), -1.0
    ).astype(np.float32)
    return tuple(
        np.asarray(x) for x in ss.full_step(peaks, intens, lo, hi, maxz)
    )


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_full_step_mesh_invariant(db, queries, shape):
    """The owner-computes sharded stage 2 (psum merge) is bitwise
    identical across mesh shapes, including the (1, 1)-equivalent."""
    ref = _run_full(db, queries, 1, 1)
    got = _run_full(db, queries, *shape)
    names = ["counts", "pep", "mb", "my", "sb", "sy", "ppm", "lb", "ly"]
    for name, r, g in zip(names, ref, got):
        np.testing.assert_array_equal(r, g, err_msg=name)


def test_full_step_matches_scorer_stage2(db, queries):
    """The sharded rescore equals the single-device stage-2 program for
    the same (spectrum, candidate) items."""
    import jax.numpy as jnp

    from sage_tpu.chem.mass import Tolerance as Tol
    from sage_tpu.ops.search import Scorer, SearchParams, _pad_count

    peaks, lo, hi, maxz = queries
    out = _run_full(db, queries, 1, 1)
    counts, pep = out[0], out[1]
    sp = SearchParams(
        precursor_tol=Tol("da", -0.01, 0.01),
        fragment_tol=Tol("ppm", -10.0, 10.0),
        max_precursor_charge=2,
    )
    scorer = Scorer(db, sp)
    rng = np.random.default_rng(7)
    intens = np.where(
        np.isfinite(peaks), rng.uniform(1.0, 1e4, peaks.shape), -1.0
    ).astype(np.float32)
    peaks_dev = jnp.asarray(np.stack([peaks, intens]))
    # flatten the (row, k) candidates with counts > 0
    rows, ks = np.nonzero(counts > 0)
    nI = rows.size
    N = _pad_count(nI)
    spec_idx = np.zeros(N, np.int32)
    pep_idx = np.zeros(N, np.int32)
    mz = np.full(N, 2, np.int32)
    spec_idx[:nI] = rows
    pep_idx[:nI] = pep[rows, ks]
    fn = scorer._stage2_compact(peaks.shape[1], N, 1)
    got = np.asarray(
        fn(peaks_dev, jnp.asarray(np.stack([spec_idx, pep_idx, mz])))
    )[:nI]
    want = np.stack(
        [out[2 + j][rows, ks] for j in range(7)], axis=1
    ).astype(np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(2, 4), (8, 1), (1, 8)])
@pytest.mark.parametrize("path", ["windowed", "full", "banded"])
def test_sharded_scorer_matches_single_device(db, shape, path, monkeypatch):
    """ShardedScorer.score_table must equal the single-device Scorer's
    FeatureTable bitwise, for any mesh shape, on the windowed (narrow),
    whole-table (legacy open), and BANDED open (fragment index
    mass-range sharded along "model") stage-1 paths."""
    monkeypatch.setenv(
        "SAGE_TPU_SHARD_WINDOWED", "1" if path == "windowed" else "0"
    )
    monkeypatch.setenv(
        "SAGE_TPU_SHARD_OPEN", "1" if path == "banded" else "0"
    )
    import dataclasses

    import jax

    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("not enough devices")

    from sage_tpu.chem.mass import PROTON
    from sage_tpu.ops.search import Scorer, SearchParams
    from sage_tpu.parallel.sharding import ShardedScorer
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(3)
    b, y = db.table.ladders()
    spectra = []
    targets = np.flatnonzero(db.table.lens >= 8)
    for i in range(12):
        p = int(rng.choice(targets))
        n = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :n], y[p, :n]])
        take = frags[rng.random(frags.shape[0]) < 0.8]
        noise = rng.uniform(200.0, 1500.0, 20).astype(np.float32)
        masses = np.sort(np.concatenate([take, noise]).astype(np.float32))
        intens = rng.uniform(1.0, 1e5, masses.shape[0]).astype(np.float32)
        charge = 2 if i % 3 else None  # mix annotated + sweep rows
        spectra.append(
            ProcessedSpectrum(
                level=2, id=f"scan={i}", file_id=0,
                scan_start_time=0.1 * i, ion_injection_time=1.0,
                precursors=[
                    Precursor(
                        mz=float(db.table.mono[p]) / 2 + PROTON, charge=charge
                    )
                ],
                masses=masses, intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    params = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        min_isotope_err=-1, max_isotope_err=1,
        report_psms=2, min_matched_peaks=2,
    )
    t_single = Scorer(db, params).score_table(spectra)
    mesh = make_mesh(*shape)
    t_mesh = ShardedScorer(db, mesh, params).score_table(spectra)
    assert len(t_mesh) == len(t_single) > 0
    for k in t_single.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_mesh.columns[k], t_single.columns[k], err_msg=f"column {k}"
        )


@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_sharded_open_regime_banded_default(db, shape, monkeypatch):
    """A genuinely wide precursor window (true open regime, windowed
    gate fails naturally) must route to the mass-range-sharded banded
    open path by default and match the single-device result bitwise."""
    import jax

    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("not enough devices")

    from sage_tpu.chem.mass import PROTON
    from sage_tpu.ops.search import Scorer, SearchParams
    from sage_tpu.parallel.sharding import ShardedScorer
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(11)
    b, y = db.table.ladders()
    targets = np.flatnonzero(db.table.lens >= 8)
    spectra = []
    for i in range(8):
        p = int(rng.choice(targets))
        n = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :n], y[p, :n]])
        take = frags[rng.random(frags.shape[0]) < 0.8]
        masses = np.sort(take.astype(np.float32))
        intens = rng.uniform(1.0, 1e5, masses.shape[0]).astype(np.float32)
        spectra.append(
            ProcessedSpectrum(
                level=2, id=f"scan={i}", file_id=0,
                scan_start_time=0.1 * i, ion_injection_time=1.0,
                precursors=[
                    Precursor(mz=float(db.table.mono[p]) / 2 + PROTON,
                              charge=2)
                ],
                masses=masses, intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    params = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        report_psms=2, min_matched_peaks=2,
    )
    # the tiny test db can still fit a +-300 Da window in one shard's
    # peptide range at small model axes; disable the windowed gate so
    # the banded open kernel is exercised at every shape
    monkeypatch.setenv("SAGE_TPU_SHARD_WINDOWED", "0")
    t_single = Scorer(db, params).score_table(spectra)
    mesh = make_mesh(*shape)
    sc = ShardedScorer(db, mesh, params)
    t_mesh = sc.score_table(spectra)
    # the open (banded) kernel must actually have been used
    assert any(k[0] == "open" for k in sc.search._fn_cache
               if isinstance(k, tuple)), "banded open path not engaged"
    assert len(t_mesh) == len(t_single) > 0
    for k in t_single.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_mesh.columns[k], t_single.columns[k], err_msg=f"column {k}"
        )


def test_sharded_open_element_budget_fallback(db, monkeypatch):
    """When the banded open path's per-cell [B, F] entry matrices would
    blow the element budget, the dispatch must fall back to the
    whole-table scan — same results, no OOM-sized allocations."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")

    from sage_tpu.ops import open_search as osmod
    from sage_tpu.ops.search import Scorer, SearchParams
    from sage_tpu.parallel.sharding import ShardedScorer
    from sage_tpu.chem.mass import PROTON
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(4)
    b, y = db.table.ladders()
    targets = np.flatnonzero(db.table.lens >= 8)
    spectra = []
    for i in range(4):
        p = int(rng.choice(targets))
        n = int(db.table.lens[p]) - 1
        take = np.concatenate([b[p, :n], y[p, :n]])
        masses = np.sort(take.astype(np.float32))
        intens = rng.uniform(1.0, 1e5, masses.shape[0]).astype(np.float32)
        spectra.append(
            ProcessedSpectrum(
                level=2, id=f"scan={i}", file_id=0,
                scan_start_time=0.1 * i, ion_injection_time=1.0,
                precursors=[
                    Precursor(mz=float(db.table.mono[p]) / 2 + PROTON,
                              charge=2)
                ],
                masses=masses, intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    params = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        report_psms=1, min_matched_peaks=2,
    )
    monkeypatch.setenv("SAGE_TPU_SHARD_WINDOWED", "0")
    t_single = Scorer(db, params).score_table(spectra)
    monkeypatch.setattr(osmod.OpenSearcher, "MAX_ELEMENTS", 64)
    mesh = make_mesh(2, 4)
    sc = ShardedScorer(db, mesh, params)
    t_mesh = sc.score_table(spectra)
    assert not any(
        isinstance(k, tuple) and k[0] == "open" for k in sc.search._fn_cache
    ), "budget fallback did not engage"
    for k in t_single.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_mesh.columns[k], t_single.columns[k], err_msg=f"column {k}"
        )


def test_stage2_budget_overflow_redo(db, monkeypatch):
    """When a shard's live candidates exceed the stage-2 compaction
    budget, full_step/windowed_step must grow the budget and redo — the
    result stays bitwise correct (parallel/sharding.py _owner_stage2)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")

    from sage_tpu.chem.mass import PROTON
    from sage_tpu.ops.search import Scorer, SearchParams
    from sage_tpu.parallel.sharding import ShardedScorer
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(5)
    b, y = db.table.ladders()
    targets = np.flatnonzero(db.table.lens >= 8)
    spectra = []
    for i in range(6):
        p = int(rng.choice(targets))
        n = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :n], y[p, :n]])
        masses = np.sort(frags.astype(np.float32))
        intens = rng.uniform(1.0, 1e5, masses.shape[0]).astype(np.float32)
        spectra.append(
            ProcessedSpectrum(
                level=2, id=f"scan={i}", file_id=0, scan_start_time=0.1 * i,
                ion_injection_time=1.0,
                precursors=[
                    Precursor(mz=float(db.table.mono[p]) / 2 + PROTON, charge=2)
                ],
                masses=masses, intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    # wide Da tolerance -> many live candidates per row
    params = SearchParams(
        precursor_tol=Tolerance("da", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        report_psms=3, min_matched_peaks=1,
    )
    t_single = Scorer(db, params).score_table(spectra)
    mesh = make_mesh(2, 1)
    sc = ShardedScorer(db, mesh, params)
    # force a tiny initial budget so the first dispatch must overflow
    monkeypatch.setattr(
        type(sc.search), "_initial_bc", lambda self, R: 2
    )
    t_mesh = sc.score_table(spectra)
    # the budget grew past the forced 32
    bc = [v for k, v in sc.search._fn_cache.items()
          if isinstance(k, tuple) and k[0] in ("bc_win", "bc_full")]
    assert bc and bc[0] > 2
    assert len(t_mesh) == len(t_single) > 0
    for k in t_single.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_mesh.columns[k], t_single.columns[k], err_msg=f"column {k}"
        )
