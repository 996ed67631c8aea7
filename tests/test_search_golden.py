"""The end-to-end correctness anchor: searching the bundled single-scan mzML
against the VAT1 FASTA must yield exactly 1 PSM with 21 matched peaks for
peptide LQSRPAAPPAPGPGQLTLR. Setup mirrors the reference integration test
(crates/sage-cli/tests/integration.rs:7-52): *default* database builder
(no mods), SpectrumProcessor(100, deisotope, min_deisotope_mz=0), precursor
tol ppm(-50,50), fragment tol ppm(-10,10), isotope errors -1..3,
max_fragment_charge 1."""

import numpy as np
import pytest

from sage_tpu.chem.fasta import Fasta
from sage_tpu.chem.mass import Tolerance
from sage_tpu.index.builder import DatabaseParams
from sage_tpu.io.mzml import read_mzml
from sage_tpu.ops.search import Scorer, SearchParams, max_fragment_charge
from sage_tpu.spectrum.processor import SpectrumProcessor

FASTA = "/root/reference/tests/Q99536.fasta"
MZML = "/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"


@pytest.fixture(scope="module")
def golden_setup():
    db_params = DatabaseParams()
    fasta = Fasta.parse(open(FASTA).read(), db_params.decoy_tag, db_params.generate_decoys)
    db = db_params.build(fasta)

    params = SearchParams(
        precursor_tol=Tolerance("ppm", -50.0, 50.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        min_isotope_err=-1,
        max_isotope_err=3,
        max_fragment_charge=1,
        report_psms=1,
        chimera=False,
    )
    sp = SpectrumProcessor(take_top_n=100, deisotope=True)
    spectra = [sp.process(s) for s in read_mzml(MZML)]
    assert len(spectra) == 1
    assert len(spectra[0]) <= 300
    return db, params, spectra


def test_max_fragment_charge_table():
    # scoring.rs:821-830
    assert max_fragment_charge(None, 1) == 2
    assert max_fragment_charge(None, 2) == 2
    assert max_fragment_charge(None, 3) == 3
    assert max_fragment_charge(None, 4) == 4
    assert max_fragment_charge(1, 2) == 2
    assert max_fragment_charge(1, 3) == 2
    assert max_fragment_charge(2, 4) == 3
    assert max_fragment_charge(4, 1) == 2


def test_golden_psm(golden_setup):
    db, params, spectra = golden_setup
    scorer = Scorer(db, params)
    features = scorer.score(spectra)

    assert len(features) == 1, f"expected exactly 1 PSM, got {len(features)}"
    psm = features[0]
    peptide = db.peptides[psm.peptide_idx]
    assert peptide.sequence == b"LQSRPAAPPAPGPGQLTLR"
    assert psm.matched_peaks == 21, f"expected 21 matched peaks, got {psm.matched_peaks}"
    assert psm.charge == 3
    assert psm.label == 1
    assert psm.rank == 1
    # calcmass is the f32 peptide monoisotopic mass
    assert np.float32(psm.calcmass) == peptide.monoisotopic
    assert psm.hyperscore > 0
    assert psm.longest_y > 0
    assert psm.spec_id == "controllerType=0 controllerNumber=1 scan=30069"


def test_golden_psm_annotated(golden_setup):
    db, params, spectra = golden_setup
    import dataclasses

    params2 = dataclasses.replace(params, annotate_matches=True)
    scorer = Scorer(db, params2)
    features = scorer.score(spectra)
    assert len(features) == 1
    frags = features[0].fragments
    assert frags is not None
    assert len(frags.kinds) == 21
    # all matched fragments are b or y at charge 1 (max_fragment_charge: 1)
    assert set(frags.kinds) <= {"b", "y"}
    assert set(frags.charges) == {1}
    # experimental vs calculated m/z within the 10 ppm window
    for cm, em in zip(frags.mz_calculated, frags.mz_experimental):
        assert abs(cm - em) / cm * 1e6 < 10.5


def test_report_multiple_psms(golden_setup):
    db, params, spectra = golden_setup
    import dataclasses

    params2 = dataclasses.replace(params, report_psms=5, min_matched_peaks=1)
    scorer = Scorer(db, params2)
    features = scorer.score(spectra)
    assert len(features) >= 1
    # best hit is still the golden peptide, ranks ascending, hyperscores desc
    assert db.peptides[features[0].peptide_idx].sequence == b"LQSRPAAPPAPGPGQLTLR"
    ranks = [f.rank for f in features]
    assert ranks == list(range(1, len(features) + 1))
    hs = [f.hyperscore for f in features]
    assert hs == sorted(hs, reverse=True)
    # delta_next chain: f[i].delta_next == f[i].hyperscore - f[i+1].hyperscore
    for a, b in zip(features, features[1:]):
        assert abs(a.delta_next - (a.hyperscore - b.hyperscore)) < 1e-9


def test_score_stream_matches_score_table(golden_setup):
    """The pipelined score_stream path must produce byte-identical feature
    columns to per-batch score_table calls (ops/search.py score_stream)."""
    db, params, spectra = golden_setup
    scorer = Scorer(db, params)
    # Three batches (two copies of the golden spectrum each) exercise the
    # two-deep pipeline including the flush path.
    batches = [spectra * 2, spectra, spectra * 3]
    streamed = list(scorer.score_stream(batches))
    assert len(streamed) == len(batches)
    scorer2 = Scorer(db, params)
    for batch, st in zip(batches, streamed):
        tt = scorer2.score_table(batch)
        assert len(st) == len(tt) == len(batch)
        for k in tt.columns:
            if k == "psm_id":
                continue  # ids depend on global dispatch order
            np.testing.assert_array_equal(
                st.columns[k], tt.columns[k], err_msg=f"column {k}"
            )


def test_trim_hits_k_widens_with_report_psms(golden_setup):
    """trim_hits keeps max(50, 2*report_psms) candidates
    (scoring.rs:311-329), so report_psms > 25 widens the K-select."""
    import dataclasses

    db, params, spectra = golden_setup
    assert Scorer(db, params).K == 50
    wide = dataclasses.replace(params, report_psms=40)
    assert Scorer(db, wide).K == 80


def test_fused_matches_two_dispatch(golden_setup, monkeypatch):
    """The fused single-dispatch path (device-side merge + compaction +
    rescore) must equal the classic two-dispatch path column for column,
    including the multi-isotope row merge."""
    db, params, spectra = golden_setup
    batch = spectra * 3
    monkeypatch.setenv("SAGE_TPU_FUSED", "1")
    t_fused = Scorer(db, params).score_table(batch)
    monkeypatch.setenv("SAGE_TPU_FUSED", "0")
    t_classic = Scorer(db, params).score_table(batch)
    assert len(t_fused) == len(t_classic) == len(batch)
    for k in t_classic.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_fused.columns[k], t_classic.columns[k], err_msg=f"column {k}"
        )


def test_fused_matches_two_dispatch_sweep(golden_setup, monkeypatch):
    """Same equivalence with unannotated precursors (charge sweep rows)
    and multiple reported PSMs."""
    import dataclasses

    db, params, spectra = golden_setup
    spec = dataclasses.replace(spectra[0])
    from sage_tpu.spectrum.processor import Precursor

    spec.precursors = [Precursor(mz=spectra[0].precursors[0].mz, charge=None)]
    batch = [spec] * 2
    p2 = dataclasses.replace(params, report_psms=3, min_matched_peaks=1)
    monkeypatch.setenv("SAGE_TPU_FUSED", "1")
    t_fused = Scorer(db, p2).score_table(batch)
    monkeypatch.setenv("SAGE_TPU_FUSED", "0")
    t_classic = Scorer(db, p2).score_table(batch)
    assert len(t_fused) == len(t_classic) > 0
    for k in t_classic.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_fused.columns[k], t_classic.columns[k], err_msg=f"column {k}"
        )


def test_fused_matches_two_dispatch_wide_windows(monkeypatch):
    """Fused path with W > K (per-row top-K stage-1 shape, the
    production-scale regime) still equals the classic path."""
    from sage_tpu.chem.mass import PROTON
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(13)
    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    lines = []
    for i in range(60):
        seq = AA[rng.integers(0, len(AA), size=260)].tobytes().decode()
        lines.append(f">sp|W{i:03d}|W{i}_SYN synthetic\n{seq}")
    db_params = DatabaseParams()
    db = db_params.build(
        Fasta.parse("\n".join(lines), db_params.decoy_tag, True)
    )
    b, y = db.table.ladders()
    targets = np.flatnonzero(db.table.lens >= 8)
    spectra = []
    for i in range(6):
        p = int(targets[rng.integers(0, targets.size)])
        n = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :n], y[p, :n]])
        take = frags[rng.random(frags.shape[0]) < 0.8]
        masses = np.sort(take.astype(np.float32))
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
    wide = SearchParams(
        precursor_tol=Tolerance("da", -60.0, 60.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        report_psms=3, min_matched_peaks=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")
    monkeypatch.setenv("SAGE_TPU_FUSED", "1")
    s1 = Scorer(db, wide)
    rows = s1._expand_rows(spectra)
    W = max(int((rows["i1"] - rows["i0"]).max()), 8)
    assert W > s1.K, f"test needs a wide window, got {W}"
    t_fused = s1.score_table(spectra)
    monkeypatch.setenv("SAGE_TPU_FUSED", "0")
    t_classic = Scorer(db, wide).score_table(spectra)
    assert len(t_fused) == len(t_classic) > 0
    for k in t_classic.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_fused.columns[k], t_classic.columns[k], err_msg=f"column {k}"
        )


def _wide_synth_setup(rng_seed=13, n_spec=6):
    """Synthetic wide-window batch shared by the fused-select tests:
    60 random proteins, spectra drawn from real b/y ladders."""
    from sage_tpu.chem.mass import PROTON
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(rng_seed)
    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    lines = []
    for i in range(60):
        seq = AA[rng.integers(0, len(AA), size=260)].tobytes().decode()
        lines.append(f">sp|W{i:03d}|W{i}_SYN synthetic\n{seq}")
    db_params = DatabaseParams()
    db = db_params.build(
        Fasta.parse("\n".join(lines), db_params.decoy_tag, True)
    )
    b, y = db.table.ladders()
    targets = np.flatnonzero(db.table.lens >= 8)
    spectra = []
    for i in range(n_spec):
        p = int(targets[rng.integers(0, targets.size)])
        n = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :n], y[p, :n]])
        take = frags[rng.random(frags.shape[0]) < 0.8]
        masses = np.sort(take.astype(np.float32))
        intens = rng.uniform(1.0, 1e5, masses.shape[0]).astype(np.float32)
        spectra.append(
            ProcessedSpectrum(
                level=2, id=f"scan={i}", file_id=0, scan_start_time=0.1 * i,
                ion_injection_time=1.0,
                precursors=[
                    Precursor(mz=float(db.table.mono[p]) / 2 + PROTON,
                              charge=2)
                ],
                masses=masses, intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    return db, spectra


@pytest.mark.parametrize("force_fallback", [False, True])
def test_fused_select_guard_fallback(monkeypatch, force_fallback):
    """The device selects top-Ksel candidates by an f32 hyperscore key;
    the host guard must catch boundary ambiguity and recompute from the
    untruncated on-device arrays. Forcing the guard to fail for EVERY
    spectrum (SELECT_EPS = inf) must still give byte-identical columns to
    the classic path — the fallback IS the correctness proof. The
    minimal Ksel (report_psms + 1) maximizes boundary pressure."""
    db, spectra = _wide_synth_setup()
    wide = SearchParams(
        precursor_tol=Tolerance("da", -60.0, 60.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        report_psms=3, min_matched_peaks=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")
    monkeypatch.setenv("SAGE_TPU_KSEL", "4")  # report_psms + 1
    monkeypatch.setenv("SAGE_TPU_FUSED", "1")
    s1 = Scorer(db, wide)
    if force_fallback:
        monkeypatch.setattr(Scorer, "SELECT_EPS", float("inf"))
    t_fused = s1.score_table(spectra)
    monkeypatch.setenv("SAGE_TPU_FUSED", "0")
    t_classic = Scorer(db, wide).score_table(spectra)
    assert len(t_fused) == len(t_classic) > 0
    # truncation must actually be in play for the test to mean anything
    assert any(
        (t_classic.columns["rank"] == wide.report_psms).any()
        for _ in (0,)
    )
    for k in t_classic.columns:
        np.testing.assert_array_equal(
            t_fused.columns[k], t_classic.columns[k], err_msg=f"column {k}"
        )


@pytest.mark.parametrize("band_w", ["16", "4096"])
def test_narrow_banded_matches_candidate_major(monkeypatch, band_w):
    """The peak-major banded stage 1 (device binary-search ranges over a
    (band, m/z)-sorted fragment index + the open-search counting core)
    must give byte-identical columns to the candidate-major stage 1.
    band_w=16 forces many bands (multi-band coverage per window);
    band_w=4096 collapses to one band (the unbanded degenerate case)."""
    db, spectra = _wide_synth_setup(rng_seed=7, n_spec=8)
    wide = SearchParams(
        precursor_tol=Tolerance("da", -60.0, 60.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        report_psms=2, min_matched_peaks=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")
    monkeypatch.setenv("SAGE_TPU_FUSED", "1")
    monkeypatch.setenv("SAGE_TPU_NARROW_BANDED", "1")
    monkeypatch.setenv("SAGE_TPU_NARROW_BAND_W", band_w)
    s1 = Scorer(db, wide)
    s1.score_table(spectra)  # may fall back once while F adapts
    # second call must come from the banded path itself, not a fallback
    reruns0 = getattr(s1, "fused_reruns", 0)
    s1._psm_counter = 1
    t_banded = s1.score_table(spectra)
    assert getattr(s1, "fused_reruns", 0) == reruns0, (
        "banded path fell back to classic; equivalence not exercised"
    )
    monkeypatch.setenv("SAGE_TPU_NARROW_BANDED", "0")
    t_classic = Scorer(db, wide).score_table(spectra)
    assert len(t_banded) == len(t_classic) > 0
    for k in t_classic.columns:
        np.testing.assert_array_equal(
            t_banded.columns[k], t_classic.columns[k], err_msg=f"column {k}"
        )


def test_narrow_banded_capacity_overflow_redo(monkeypatch):
    """When the banded path's per-spectrum entry capacity F is too small
    the batch must be redone (classic path) and F grown — never silently
    truncated."""
    db, spectra = _wide_synth_setup(rng_seed=7, n_spec=8)
    wide = SearchParams(
        precursor_tol=Tolerance("da", -60.0, 60.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        report_psms=2, min_matched_peaks=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")
    monkeypatch.setenv("SAGE_TPU_FUSED", "1")
    monkeypatch.setenv("SAGE_TPU_NARROW_BANDED", "1")
    s1 = Scorer(db, wide)
    nb = s1._narrow_banded_maybe(256)
    assert nb is not None
    nb._F = 128  # far below the real entry counts
    t_banded = s1.score_table(spectra)
    assert nb._F > 128, "overflow must grow the capacity"
    t_classic = Scorer(db, wide).score_table(spectra)
    for k in t_classic.columns:
        np.testing.assert_array_equal(
            t_banded.columns[k], t_classic.columns[k], err_msg=f"column {k}"
        )


def test_packed_stage1_layout_and_saturation_redo(monkeypatch):
    """W > K stage-1 dispatches use the bit-packed (count<<23 | pep) top-K
    layout whenever P_pad < 2^23. The dispatch dict must carry the
    "packed" flag plus a "redo" closure for the unpacked re-dispatch, and
    _prelim_part must (a) unpack the packed keys to the same candidates as
    the unpacked layout, (b) fall back to redo() when a count saturates
    the 9-bit pack. Regression for the round-1 HEAD breakage where the
    flag was never threaded through the dispatch sites."""
    from sage_tpu.chem.mass import PROTON
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(47)
    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    lines = []
    for i in range(60):
        seq = AA[rng.integers(0, len(AA), size=260)].tobytes().decode()
        lines.append(f">sp|P{i:03d}|P{i}_SYN synthetic\n{seq}")
    db_params = DatabaseParams()
    db = db_params.build(
        Fasta.parse("\n".join(lines), db_params.decoy_tag, True)
    )
    b, y = db.table.ladders()
    targets = np.flatnonzero(db.table.lens >= 8)
    spectra = []
    for i in range(4):
        p = int(targets[rng.integers(0, targets.size)])
        n = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :n], y[p, :n]])
        take = frags[rng.random(frags.shape[0]) < 0.8]
        masses = np.sort(take.astype(np.float32))
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
    wide = SearchParams(
        precursor_tol=Tolerance("da", -60.0, 60.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        report_psms=3, min_matched_peaks=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")
    monkeypatch.setenv("SAGE_TPU_FUSED", "0")
    monkeypatch.setenv("SAGE_TPU_WIDTH_BUCKETS", "0")
    s = Scorer(db, wide)
    d = s._prelim_dispatch(spectra)
    assert d["W"] > s.K, "test needs the W > K (top-K) stage-1 shape"
    assert d["counts_only"] is False
    assert d["packed"] is True, "packed stage-1 layout should be active"
    assert callable(d["redo"])
    K = s.K
    import jax

    out_packed = np.asarray(jax.device_get(d["out_dev"]))
    assert out_packed.shape[1] == K + 3  # keys, rawmax, mtot, scored
    out_unpacked = np.asarray(jax.device_get(d["redo"]()))
    assert out_unpacked.shape[1] == 2 * K + 2

    # (a) unpacked equivalence through _prelim_part
    m_p, pp_p, *rest_p = Scorer._prelim_part(dict(d), K)
    d_u = dict(d)
    d_u["out_dev"] = out_unpacked
    d_u["packed"] = False
    m_u, pp_u, *rest_u = Scorer._prelim_part(d_u, K)
    np.testing.assert_array_equal(m_p, m_u)
    np.testing.assert_array_equal(pp_p, pp_u)
    for a, b in zip(rest_p, rest_u):
        np.testing.assert_array_equal(a, b)

    # (b) saturation fallback: force the fetched rawmax column past 511 so
    # _prelim_part must discard the packed fetch and use redo()
    out_sat = out_packed.copy()
    out_sat[:, K] = 600
    d_s = dict(d)
    d_s["out_dev"] = out_sat
    m_s, pp_s, *rest_s = Scorer._prelim_part(d_s, K)
    np.testing.assert_array_equal(m_s, m_u)
    np.testing.assert_array_equal(pp_s, pp_u)


def test_width_bucketed_stage1_matches_single_dispatch(monkeypatch):
    """Stage-1 width bucketing (rows dispatched at per-class window
    widths) must be invisible: same PSM table as one max-width dispatch."""
    from sage_tpu.chem.mass import PROTON
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(29)
    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    lines = []
    for i in range(60):
        seq = AA[rng.integers(0, len(AA), size=260)].tobytes().decode()
        lines.append(f">sp|B{i:03d}|B{i}_SYN synthetic\n{seq}")
    db_params = DatabaseParams()
    db = db_params.build(
        Fasta.parse("\n".join(lines), db_params.decoy_tag, True)
    )
    b, y = db.table.ladders()
    targets = np.flatnonzero(db.table.lens >= 8)
    spectra = []
    for i in range(300):
        p = int(targets[rng.integers(0, targets.size)])
        n = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :n], y[p, :n]])
        take = frags[rng.random(frags.shape[0]) < 0.8]
        masses = np.sort(take.astype(np.float32))
        intens = rng.uniform(1.0, 1e5, masses.shape[0]).astype(np.float32)
        spectra.append(
            ProcessedSpectrum(
                level=2, id=f"scan={i}", file_id=0, scan_start_time=0.01 * i,
                ion_injection_time=1.0,
                precursors=[
                    Precursor(mz=float(db.table.mono[p]) / 2 + PROTON, charge=2)
                ],
                masses=masses, intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    # per-spectrum Da windows scale with precursor mass -> mixed widths
    wide = SearchParams(
        precursor_tol=Tolerance("da", -40.0, 40.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        report_psms=2, min_matched_peaks=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")
    monkeypatch.setenv("SAGE_TPU_FUSED", "0")
    s1 = Scorer(db, wide)
    rows = s1._expand_rows(spectra)
    buckets = s1._row_buckets(
        rows, rows["si"].size,
        int(2 ** np.ceil(np.log2(max(int((rows["i1"] - rows["i0"]).max()), 8))))
    )
    assert buckets is not None and len(buckets) >= 2, "test needs >=2 width classes"
    t_bucketed = s1.score_table(spectra)
    monkeypatch.setenv("SAGE_TPU_WIDTH_BUCKETS", "0")
    t_single = Scorer(db, wide).score_table(spectra)
    assert len(t_bucketed) == len(t_single) > 0
    for k in t_single.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_bucketed.columns[k], t_single.columns[k], err_msg=f"column {k}"
        )


def test_hyperscore_flavors():
    """Both ScoreType flavors match the reference arithmetic
    (scoring.rs:179-201): Sage = ln((sb+1)(sy+1)) + lnfact(mb) +
    lnfact(my) with f32 pre-sums; OpenMS = ln_1p(sb+sy) in f32 then f64;
    non-finite -> 255; and the lnfact(0) == 1.0 quirk."""
    import math

    from sage_tpu.ops.features import hyperscore

    def lnfact(n):
        if n == 0:
            return 1.0
        return (
            n * math.log(n) - n + 0.5 * math.log(n)
            + 0.5 * math.log(2 * math.pi * n)
        )

    sb, sy = np.float32(1234.5), np.float32(67.25)
    want_sage = (
        math.log(float(np.float32(sb + np.float32(1.0)))
                 * float(np.float32(sy + np.float32(1.0))))
        + lnfact(7) + lnfact(9)
    )
    assert hyperscore("SageHyperScore", 7, 9, sb, sy) == pytest.approx(
        want_sage, rel=1e-12
    )
    want_openms = (
        float(np.log1p(np.float32(sb + sy))) + lnfact(7) + lnfact(9)
    )
    assert hyperscore("OpenMSHyperScore", 7, 9, sb, sy) == pytest.approx(
        want_openms, rel=1e-12
    )
    # zero-matched: lnfact(0) -> 1.0 on both
    assert hyperscore("SageHyperScore", 0, 0, np.float32(0), np.float32(0)) \
        == pytest.approx(math.log(1.0) + 2.0)
    # overflow to non-finite clamps at 255
    assert hyperscore(
        "SageHyperScore", 3, 3, np.float32(-1.0), np.float32(5.0)
    ) == 255.0


def test_openms_score_type_end_to_end(golden_setup):
    """score_type flows config -> SearchParams -> scoring: the OpenMS
    flavor produces the ln_1p-based hyperscore for the golden PSM."""
    import dataclasses

    from sage_tpu.ops.features import hyperscore

    db, params, spectra = golden_setup
    p2 = dataclasses.replace(params, score_type="OpenMSHyperScore")
    t = Scorer(db, p2).score_table(spectra)
    assert len(t) == 1
    t_sage = Scorer(db, params).score_table(spectra)
    # same PSM, different score: OpenMS hyperscore must be strictly
    # smaller than Sage's (ln1p(sb+sy) < ln((sb+1)(sy+1)) when both
    # summed intensities are > 0)
    assert int(t.columns["peptide_idx"][0]) == int(
        t_sage.columns["peptide_idx"][0]
    )
    assert float(t.columns["hyperscore"][0]) < float(
        t_sage.columns["hyperscore"][0]
    )


def test_longest_run_vec_matches_scan_automaton():
    """The vectorized single-series Run computation must agree with the
    reference automaton (scoring.rs:771-793) on every match pattern —
    exhaustively for short ladders, randomized for long ones."""
    import itertools

    import jax.numpy as jnp

    from sage_tpu.ops.search import longest_run_scan, longest_run_vec

    def check(flags):
        L = len(flags)
        idx = np.arange(L, dtype=np.int32)
        f = np.asarray(flags, dtype=bool)
        got = int(longest_run_vec(jnp.asarray(f), jnp.asarray(idx)))
        want = int(longest_run_scan((jnp.asarray(f), jnp.asarray(idx))))
        assert got == want, (flags, got, want)

    for L in (1, 2, 3, 4, 5, 6):
        for bits in itertools.product([False, True], repeat=L):
            check(list(bits))
    rng = np.random.default_rng(5)
    for _ in range(200):
        L = int(rng.integers(7, 64))
        check(rng.random(L) < rng.uniform(0.05, 0.95))


def test_ragged_peak_upload_matches_padded(golden_setup):
    """The ragged upload + on-device re-pad must reproduce the padded
    [2, B, Pk] arrays bit-for-bit (pads included)."""
    db, params, spectra = golden_setup
    sc = Scorer(db, params)
    # ragged lengths: several copies plus a truncated variant
    import dataclasses

    short = dataclasses.replace(
        spectra[0],
        masses=spectra[0].masses[:17],
        intensities=spectra[0].intensities[:17],
    )
    batch = spectra * 2 + [short] + spectra
    masses, intens, Pk = sc._pad_peaks(batch)
    got = np.asarray(sc._peaks_device(batch, masses, intens, Pk))
    np.testing.assert_array_equal(got[0], masses)
    np.testing.assert_array_equal(got[1], intens)
