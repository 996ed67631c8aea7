"""LFQ tests: isotope envelope golden values (isotopes.rs:52-66), the
reference's exact convolve semantics, and a synthetic end-to-end
extraction where MS1 spectra contain a known isotope envelope at the
expected aligned RT."""

import numpy as np
import pytest

from sage_tpu.chem.isotopes import peptide_isotopes
from sage_tpu.quant.lfq import (
    GRID_SIZE,
    RT_TOL,
    Grid,
    _convolve_same,
    _gaussian_kernel,
    build_feature_map,
)


def test_isotope_envelope_golden():
    iso = peptide_isotopes(60, 5)
    expected = np.array([0.3972, 0.2824, 0.1869]) / 0.3972
    assert np.all(np.abs(iso - expected) <= 0.02)


def _convolve_scalar(sl, kernel):
    """Direct port of lfq.rs:633-649."""
    n = len(kernel) - len(kernel) // 2
    out = []
    for idx in range(len(sl)):
        k = kernel[max(len(kernel) - (n + idx), 0) :]
        w = sl[max(idx - (n - 1), 0) :]
        out.append(sum(x * y for x, y in zip(w, k)))
    return np.array(out)


def test_convolve_matches_reference_semantics():
    rng = np.random.default_rng(3)
    sig = rng.random(100)
    k = _gaussian_kernel(0.5, 10)
    fast = _convolve_same(sig[None, :], k)[0]
    slow = _convolve_scalar(sig, k)
    assert np.allclose(fast, slow, atol=1e-12)


def test_gaussian_kernel_normalized():
    k = _gaussian_kernel(0.5, 10)
    assert np.isclose(k.sum(), 1.0)
    assert np.allclose(k, k[::-1])  # symmetric


def test_grid_add_and_trace():
    dist = np.array([1.0, 0.5, 0.2], dtype=np.float32)
    g = Grid(rt=0.5, file_id=0, distribution=dist, n_files=1)
    # inject a nearly-clean envelope at the grid center across several rt
    # bins (an EXACTLY proportional envelope rounds sim just above 1 and
    # acos -> NaN — faithful to the reference's unclamped f64::acos)
    center_rt = 0.5
    for k, drt in enumerate(np.linspace(-0.001, 0.001, 11)):
        for iso in range(3):
            g.add_entries(
                [center_rt + drt], [iso], [0], [1000.0 * dist[iso] + 7.0 * iso + k]
            )
    traces = g.summarize_traces()
    # spectral angle should be ~1 where the envelope is present
    assert traces.spectral_angle.max() > 0.95

    from sage_tpu.pipeline.input import LfqSettings

    res = traces.integrate(LfqSettings())
    assert res is not None
    peak, areas = res
    assert len(areas) == 1 and areas[0] > 0
    assert peak.spectral_angle > 0.9


@pytest.fixture(scope="module")
def lfq_setup():
    """Small database + features table + synthetic MS1 spectra."""
    from sage_tpu.chem.fasta import Fasta
    from sage_tpu.chem.mass import PROTON
    from sage_tpu.index.builder import DatabaseParams
    from sage_tpu.ml.retention_alignment import Alignment
    from sage_tpu.ops.features import FeatureTable
    from sage_tpu.pipeline.input import LfqSettings
    from sage_tpu.spectrum.processor import ProcessedSpectrum

    params = DatabaseParams()
    fasta = Fasta.parse(
        open("/root/reference/tests/Q99536.fasta").read(), "rev_", True
    )
    db = params.build(fasta)
    # pick a target peptide
    pi = next(
        i for i, p in enumerate(db.peptides) if p.sequence == b"LQSRPAAPPAPGPGQLTLR"
    )
    t = FeatureTable.empty(1)
    c = t.columns
    c["peptide_idx"][0] = pi
    c["label"][0] = 1
    c["peptide_q"][0] = 0.001
    c["aligned_rt"][0] = 0.5
    c["calcmass"][0] = db.table.mono[pi]
    c["charge"][0] = 2
    c["file_id"][0] = 0
    t.spec_ids = ["x"]

    fmap = build_feature_map(LfqSettings(), (2, 3), db, t)

    # synthetic MS1 spectra: envelope at charge-2 neutral masses
    mono = float(db.table.mono[pi])
    spectra = []
    NEUTRON = 1.00335
    for k, srt in enumerate(np.linspace(49.6, 50.4, 21)):
        masses = np.array(
            [mono + i * NEUTRON / 1.0 for i in range(3)], dtype=np.float32
        )
        # neutral masses for charge 2 ranges: (mono + iso*NEUTRON)/2
        masses = np.sort(
            np.array([(mono + i * NEUTRON) / 2.0 for i in range(3)], np.float32)
        )
        intens = np.array([1000.0, 700.0, 300.0], dtype=np.float32)
        spectra.append(
            ProcessedSpectrum(
                level=1, id=f"ms1={k}", file_id=0, scan_start_time=srt,
                ion_injection_time=0.0, precursors=[], masses=masses,
                intensities=intens, mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    alignments = [Alignment(file_id=0, max_rt=100.0, slope=1.0, intercept=0.0)]
    return db, fmap, spectra, alignments


def test_feature_map_structure(lfq_setup):
    db, fmap, spectra, alignments = lfq_setup
    # 1 peptide x charges {2,3} x 3 isotopes x {target, decoy}
    assert fmap.rt.size == 2 * 3 * 2
    # decoys shifted in RT and mass
    assert (fmap.rt[fmap.decoy] < fmap.rt[~fmap.decoy].max()).all()


def test_lfq_quantify(lfq_setup):
    db, fmap, spectra, alignments = lfq_setup
    areas = fmap.quantify(db, spectra, alignments)
    # target found
    target_keys = [k for k in areas if not k[1]]
    assert target_keys, "no target precursor quantified"
    peak, data = areas[target_keys[0]]
    assert len(data) == 1
    assert data[0] > 0
    assert peak.spectral_angle > 0.5

    from sage_tpu.quant.lfq import assign_precursor_q

    assign_precursor_q(areas)
    assert 0.0 <= peak.q_value <= 1.0
