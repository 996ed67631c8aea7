"""Open-search path: the peak-major preliminary counter over the flat
sorted fragment index must reproduce the candidate-major stage 1
bit-for-bit (ops/open_search.py vs ops/search.py), including PreScore
tie-breaking, Poisson statistics and all downstream features."""

import os

import numpy as np
import pytest

from sage_tpu.chem.fasta import Fasta
from sage_tpu.chem.mass import PROTON, Tolerance
from sage_tpu.index.builder import DatabaseParams
from sage_tpu.ops.search import Scorer, SearchParams
from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)


def synth_fasta(n_proteins: int, length: int = 240, seed: int = 3) -> str:
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_proteins):
        seq = AA[rng.integers(0, len(AA), size=length)].tobytes().decode()
        lines.append(f">sp|OPEN{i:04d}|OPEN{i}_SYN synthetic\n{seq}")
    return "\n".join(lines)


@pytest.fixture(scope="module")
def db():
    params = DatabaseParams()
    return params.build(Fasta.parse(synth_fasta(40), params.decoy_tag, True))


def _spectra(db, n, seed=5):
    rng = np.random.default_rng(seed)
    b, y = db.table.ladders()
    out = []
    targets = np.flatnonzero(db.table.lens >= 7)
    for i in range(n):
        p = int(rng.choice(targets))
        nion = int(db.table.lens[p]) - 1
        frags = np.concatenate([b[p, :nion], y[p, :nion]])
        take = frags[rng.random(frags.shape[0]) < 0.8]
        noise = rng.uniform(200.0, 2000.0, size=25).astype(np.float32)
        masses = np.sort(np.concatenate([take, noise]).astype(np.float32))
        intens = rng.uniform(1.0, 1e5, size=masses.shape[0]).astype(np.float32)
        # shift the precursor by a random "modification" within the open
        # window so the open search must look far from the true mass
        shift = float(rng.uniform(-80.0, 80.0))
        mono = float(db.table.mono[p])
        out.append(
            ProcessedSpectrum(
                level=2, id=f"scan={i}", file_id=0,
                scan_start_time=float(i) * 0.01, ion_injection_time=1.0,
                precursors=[Precursor(mz=(mono + shift) / 2 + PROTON, charge=2)],
                masses=masses, intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    return out


def test_open_matches_candidate_major(db, monkeypatch):
    sp = SearchParams(
        precursor_tol=Tolerance("da", -500.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        min_matched_peaks=4,
        report_psms=2,
    )
    spectra = _spectra(db, 48)

    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")  # force peak-major
    t_open = Scorer(db, sp).score_table(spectra)
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")  # force dense
    t_dense = Scorer(db, sp).score_table(spectra)

    assert len(t_open) == len(t_dense) > 0
    for k in t_dense.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_open.columns[k], t_dense.columns[k], err_msg=f"column {k}"
        )


def test_open_prelim_counts_match_index_query(db, monkeypatch):
    """The peak-major counts equal a direct walk of the bucketed index
    (database.rs:480-536 semantics via query_fragments)."""
    sp = SearchParams(
        precursor_tol=Tolerance("da", -120.0, 120.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
    )
    spectra = _spectra(db, 6, seed=11)
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    scorer = Scorer(db, sp)
    masses, intens, Pk = scorer._pad_peaks(spectra)
    prelim = scorer._preliminary(spectra, masses=masses)

    for si, spec in enumerate(spectra):
        prec = spec.precursors[0]
        mz = np.float32(np.float32(prec.mz) - PROTON)
        pm = np.float32(mz * np.float32(prec.charge))
        lo, hi = sp.precursor_tol.bounds(pm)
        expected = {}
        for pk in spec.masses:
            for z in (1,):
                q = np.float32(pk * np.float32(z))
                flo, fhi = sp.fragment_tol.bounds(q)
                for fi in db.query_fragments(lo, hi, flo, fhi):
                    pep = int(db.fragment_pep[fi])
                    expected[pep] = expected.get(pep, 0) + 1
        got = {
            int(p): int(m)
            for p, m, s in zip(
                prelim["cand_pep"], prelim["cand_matched"], prelim["cand_spec"]
            )
            if s == si
        }
        # every reported candidate's count must equal the index walk
        for pep, m in got.items():
            assert expected.get(pep) == m, (si, pep, m, expected.get(pep))
        # and the top candidate by (count, pep) is identical
        if expected:
            best = max(expected.items(), key=lambda kv: (kv[1], kv[0]))
            top = max(got.items(), key=lambda kv: (kv[1], kv[0]))
            assert best == top


def test_open_search_subbatch_split(db, monkeypatch):
    """The memory-budget split must not change results: force a tiny
    element budget so every batch recursively halves."""
    from sage_tpu.ops import open_search as osmod

    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        min_isotope_err=-1, max_isotope_err=1,
    )
    spectra = _spectra(db, 24, seed=21)
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    t_whole = Scorer(db, sp).score_table(spectra)
    monkeypatch.setattr(osmod.OpenSearcher, "MAX_ELEMENTS", 20000)
    t_split = Scorer(db, sp).score_table(spectra)
    assert len(t_split) == len(t_whole) > 0
    for k in t_whole.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_split.columns[k], t_whole.columns[k], err_msg=f"column {k}"
        )


def test_open_select_two_segment_split(db, monkeypatch):
    """A single budget-split level runs as TWO pseudo-segments through
    the on-device merge/select program (no classic fallback), and must
    match the unsplit result byte-for-byte."""
    from sage_tpu.ops import open_search as osmod

    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        min_isotope_err=-1, max_isotope_err=1,
    )
    spectra = _spectra(db, 24, seed=21)
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    s_whole = Scorer(db, sp)
    t_whole = s_whole.score_table(spectra)
    # a budget that forces exactly one split level (each half fits):
    # just under the whole batch's footprint, far above either half's
    os_ = s_whole._open_searcher()
    masses, _, _ = s_whole._pad_peaks(spectra)
    rows = s_whole._expand_rows(spectra)
    *_, size, _, _, nbcov = os_._geometry(masses, rows, s_whole.Z, None)
    whole_fp = len(spectra) * nbcov * (int(size.max()) + 1)
    monkeypatch.setattr(osmod.OpenSearcher, "MAX_ELEMENTS", whole_fp - 1)
    s_split = Scorer(db, sp)
    t_split = s_split.score_table(spectra)
    assert getattr(s_split, "fused_reruns", 0) == 0, (
        "split batch fell back to classic; two-segment path not exercised"
    )
    assert len(t_split) == len(t_whole) > 0
    for k in t_whole.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_split.columns[k], t_whole.columns[k], err_msg=f"column {k}"
        )


def test_open_pallas_sort_equivalence(db, monkeypatch):
    """The in-VMEM bitonic sort path (bit-packed keys) must reproduce
    the lax.sort path exactly, including multi-charge z tags."""
    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        min_isotope_err=-1, max_isotope_err=1,
        min_precursor_charge=2, max_precursor_charge=3,
        override_precursor_charge=True,
    )
    spectra = _spectra(db, 12, seed=5)
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    monkeypatch.setenv("SAGE_TPU_PSORT", "0")
    t_lax = Scorer(db, sp).score_table(spectra)
    monkeypatch.setenv("SAGE_TPU_PSORT", "1")
    t_psort = Scorer(db, sp).score_table(spectra)
    assert len(t_psort) == len(t_lax) > 0
    for k in t_lax.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_psort.columns[k], t_lax.columns[k], err_msg=f"column {k}"
        )


def test_open_search_banding_invariant(db, monkeypatch):
    """The band-segmented index layout (sorted by (peptide-mass band,
    m/z)) must be result-invariant for any band count: counting masks by
    the exact per-row candidate range either way."""
    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        min_isotope_err=-1, max_isotope_err=1,
    )
    spectra = _spectra(db, 16, seed=33)
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    tables = {}
    for nb in ("1", "4", "16"):
        monkeypatch.setenv("SAGE_TPU_OPEN_BANDS", nb)
        tables[nb] = Scorer(db, sp).score_table(spectra)
    ref = tables["1"]
    assert len(ref) > 0
    for nb in ("4", "16"):
        assert len(tables[nb]) == len(ref)
        for k in ref.columns:
            if k == "psm_id":
                continue
            np.testing.assert_array_equal(
                tables[nb].columns[k], ref.columns[k],
                err_msg=f"bands={nb} column {k}",
            )


def test_auto_bands_policy(db):
    """_auto_bands scales with expected window length for both ppm and
    Da fragment tolerances (the Da branch regressed once: a spurious
    1e-3 made banding silently inert for Da windows)."""
    from sage_tpu.ops.open_search import OpenSearcher

    prec = Tolerance("da", -500.0, 100.0)
    o_ppm = OpenSearcher(db, Tolerance("ppm", -10.0, 10.0), Z=1)
    # a +-0.01 Da window at ~1000 m/z is ~ +-10 ppm: the Da estimate
    # must land within ~2x of the ppm one, not 1000x under
    w_ppm = o_ppm._auto_bands(db, prec)
    o_da = OpenSearcher(db, Tolerance("da", -0.01, 0.01), Z=1)
    w_da = o_da._auto_bands(db, prec)
    assert w_da >= w_ppm / 2
    # a big synthetic fragment count drives the band count up
    class FakeDb:
        table = db.table
        num_fragments = 60_000_000
        def __len__(self):
            return len(db)
    assert OpenSearcher._auto_bands(o_ppm, FakeDb(), prec) >= 8


def test_open_charge_sweep_matches_candidate_major(db, monkeypatch):
    """Unannotated precursors expand into a charge sweep (min..max), so
    the peak-major path runs with Zb > 1 fragment-charge planes and the
    z-tag machinery engages; results must equal the candidate-major
    stage 1 exactly, like the annotated case."""
    import dataclasses

    spectra = []
    for s in _spectra(db, 12, seed=41):
        s2 = dataclasses.replace(s)
        s2.precursors = [Precursor(mz=s.precursors[0].mz, charge=None)]
        spectra.append(s2)
    sp = SearchParams(
        precursor_tol=Tolerance("da", -100.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        min_precursor_charge=2, max_precursor_charge=4,
        report_psms=2, min_matched_peaks=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    t_open = Scorer(db, sp).score_table(spectra)
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "999999999")
    t_cand = Scorer(db, sp).score_table(spectra)
    assert len(t_open) == len(t_cand) > 0
    for k in t_cand.columns:
        if k == "psm_id":
            continue
        np.testing.assert_array_equal(
            t_open.columns[k], t_cand.columns[k], err_msg=f"column {k}"
        )
    # the sweep really produced multiple charges
    assert len(set(t_open.columns["charge"].tolist())) > 1


def test_device_ranges_match_host(db):
    """ranges_device (decimated-rank probe on device) must be
    bit-identical to the host searchsorted ranges() — starts and lens —
    across band counts, charges, padding peaks, and window edges."""
    import jax.numpy as jnp

    from sage_tpu.ops.open_search import OpenSearcher, spectrum_window_union

    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
    )
    spectra = _spectra(db, 24, seed=7)
    sc = Scorer(db, sp)
    masses, intens, Pk = sc._pad_peaks(spectra)
    rows = sc._expand_rows(spectra)
    peaks_dev = jnp.asarray(np.stack([masses, intens]))
    B = masses.shape[0]
    u0, u1 = spectrum_window_union(rows, B)
    for nb in (1, 3, 8):
        os.environ["SAGE_TPU_OPEN_BANDS"] = str(nb)
        try:
            osr = OpenSearcher(
                db, sp.fragment_tol, 2, K=50,
                precursor_tol=sp.precursor_tol,
            )
        finally:
            del os.environ["SAGE_TPU_OPEN_BANDS"]
        for Zb in (1, 2):
            h_st, h_ln = osr.ranges(masses, Zb, u0, u1)
            d_st, d_ln, nbcov = osr.ranges_device(peaks_dev, u0, u1, Zb)
            assert h_st.shape == d_st.shape, (nb, Zb)
            np.testing.assert_array_equal(
                np.asarray(d_ln), h_ln, err_msg=f"lens nb={nb} Zb={Zb}"
            )
            # host zeroes starts of empty windows; the device does too
            np.testing.assert_array_equal(
                np.asarray(d_st), h_st, err_msg=f"starts nb={nb} Zb={Zb}"
            )


def test_open_sticky_device_ranges_equivalence(db, monkeypatch):
    """Batch 1 plans on the host and records sticky shapes; batches 2+
    plan ranges ON DEVICE. The whole stream must match the all-host
    path byte-for-byte."""
    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    spectra = _spectra(db, 48, seed=11)
    batches = [spectra[i : i + 16] for i in range(0, 48, 16)]
    monkeypatch.setenv("SAGE_TPU_OPEN_DEV_RANGES", "0")
    t_ref = list(Scorer(db, sp).score_stream(batches))
    monkeypatch.setenv("SAGE_TPU_OPEN_DEV_RANGES", "1")
    sc = Scorer(db, sp)
    t_dev = list(sc.score_stream(batches))
    assert sc._open_searcher()._sticky_shapes is not None
    assert sum(len(t) for t in t_ref) > 0
    for a, b in zip(t_ref, t_dev):
        assert len(a) == len(b)
        for k in a.columns:
            np.testing.assert_array_equal(
                b.columns[k], a.columns[k], err_msg=k
            )


def test_device_ranges_slots_match_host(db):
    """ranges_device_slots (slot-major flat probe) must equal the host
    searchsorted ranges at every probed (spectrum, band) slot, with
    invalid (padding) slots all-zero."""
    import jax
    import jax.numpy as jnp

    from sage_tpu.ops.open_search import (
        OpenSearcher, covered_bands, spectrum_window_union,
    )

    frag_tol = Tolerance("ppm", -15.0, 15.0)
    prec = Tolerance("da", -300.0, 100.0)
    sp = SearchParams(precursor_tol=prec, fragment_tol=frag_tol)
    spectra = _spectra(db, 24, seed=23)
    sc = Scorer(db, sp)
    masses, intens, Pk = sc._pad_peaks(spectra)
    rows = sc._expand_rows(spectra)
    B = len(spectra)
    for nb_env in ("2", "4"):
        osr = OpenSearcher.__new__(OpenSearcher)
        import os as _os
        _os.environ["SAGE_TPU_OPEN_BANDS"] = nb_env
        try:
            osr.__init__(db, frag_tol, 1, 50, precursor_tol=prec)
        finally:
            del _os.environ["SAGE_TPU_OPEN_BANDS"]
        u0, u1 = spectrum_window_union(rows, B)
        st_h, ln_h = osr.ranges(masses, 1, u0, u1)
        b0, b1, nbcov = covered_bands(u0, u1, osr.band_w, osr.n_bands, B)
        # all (spectrum, slot) pairs incl. some invalid ones
        s_arr = np.repeat(np.arange(B), nbcov)
        k_arr = np.tile(np.arange(nbcov), B)
        valid = k_arr <= (b1 - b0)[s_arr]
        band = np.clip(b0[s_arr] + k_arr, 0, osr.n_bands - 1)
        peaks_dev = jnp.asarray(np.stack([masses, intens]))
        st_d, ln_d = osr.ranges_device_slots(
            peaks_dev, s_arr, band, valid, 1
        )
        st_d = np.asarray(jax.device_get(st_d))
        ln_d = np.asarray(jax.device_get(ln_d))
        # host grid layout col = (zi*nbcov + k)*Pk + pk, zi = 0
        st_g = st_h.reshape(B, nbcov, Pk)[s_arr, k_arr]
        ln_g = ln_h.reshape(B, nbcov, Pk)[s_arr, k_arr]
        np.testing.assert_array_equal(st_d[valid], st_g[valid])
        np.testing.assert_array_equal(ln_d[valid], ln_g[valid])
        assert (st_d[~valid] == 0).all() and (ln_d[~valid] == 0).all()


def test_open_sticky_slot_classes_equivalence(db, monkeypatch):
    """When the teaching batch records slot size classes, later batches
    dispatch each (spectrum, band) slot as its own pseudo-row in its
    size class, recombined by the outer merge — byte-identical to the
    all-host single-segment path, including charge/isotope sweeps."""
    import jax.numpy as jnp

    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
        override_precursor_charge=True,
        min_isotope_err=-1,
        max_isotope_err=1,
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    spectra = _spectra(db, 96, seed=17)
    batches = [spectra[i: i + 48] for i in range(0, 96, 48)]
    monkeypatch.setenv("SAGE_TPU_OPEN_DEV_RANGES", "0")
    t_ref = list(Scorer(db, sp).score_stream(batches))
    monkeypatch.setenv("SAGE_TPU_OPEN_DEV_RANGES", "1")
    sc = Scorer(db, sp)
    t_dev = list(sc.score_stream(batches))
    t_dev2 = list(sc.score_stream(batches))  # fully sticky pass
    st = sc._open_searcher()._sticky_shapes
    assert st is not None
    # prove the slot path engaged (not just the single-class fallback)
    b = batches[1]
    masses, intens, Pk = sc._pad_peaks(b)
    peaks_dev = jnp.asarray(np.stack([masses, intens]))
    rows = sc._expand_rows(b)
    cap = {}
    d = sc._fused_dispatch(
        b, masses, intens, Pk, peaks_dev, rows=rows, capture=cap
    )
    sc._fused_finalize(b, d, masses, intens, Pk)
    if len(st["classes"]) > 1:
        tags = [t[0] if t else None for _s, _k, t in cap["open_segs"]]
        assert "slot" in tags
    for t_cmp in (t_dev, t_dev2):
        for a, b2 in zip(t_ref, t_cmp):
            assert len(a) == len(b2)
            for k in a.columns:
                if k == "psm_id":
                    continue
                np.testing.assert_array_equal(
                    b2.columns[k], a.columns[k], err_msg=k
                )


def test_open_sticky_overflow_grows_and_redoes(db, monkeypatch):
    """A device-planned batch that violates the sticky shapes must be
    detected (device-computed stats through the tail row), grown, and
    redone with identical results."""
    sp = SearchParams(
        precursor_tol=Tolerance("da", -300.0, 100.0),
        fragment_tol=Tolerance("ppm", -15.0, 15.0),
    )
    monkeypatch.setenv("SAGE_TPU_OPEN_THRESHOLD", "1")
    spectra = _spectra(db, 32, seed=13)
    batches = [spectra[:16], spectra[16:]]
    monkeypatch.setenv("SAGE_TPU_OPEN_DEV_RANGES", "0")
    t_ref = list(Scorer(db, sp).score_stream(batches))
    monkeypatch.setenv("SAGE_TPU_OPEN_DEV_RANGES", "1")
    sc = Scorer(db, sp)
    t0 = sc.score_table(batches[0])       # host-planned, records sticky
    os_ = sc._open_searcher()
    assert os_._sticky_shapes is not None
    for cl in os_._sticky_shapes["classes"]:
        cl["F"] = 128                     # force an entries violation
        cl["Wc"] = 8
    os_._sticky_shapes["F"] = 128
    os_._sticky_shapes["Wc"] = 8
    t1 = sc.score_table(batches[1])       # device-planned -> redo
    assert getattr(sc, "fused_reruns", 0) >= 1
    assert os_._sticky_shapes["F"] > 128  # grew from the device stats
    for a, b in zip(t_ref, (t0, t1)):
        assert len(a) == len(b)
        for k in a.columns:
            np.testing.assert_array_equal(
                b.columns[k], a.columns[k], err_msg=k
            )
