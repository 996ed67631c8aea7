"""MGF parser tests mirroring the reference's inline tests
(/root/reference/crates/sage-cloudpath/src/mgf.rs:392-566)."""

import numpy as np

from sage_tpu.io.mgf import parse_mgf

SPECTRUM_0 = """
BEGIN IONS
TITLE=spectrum 0
RTINSECONDS=0.8963232289
PEPMASS=367.069682741984 56700.5185546875
CHARGE=2+ and 3+
TOL=10
TOLU=ppm
148.2041016
169.5001831 4608.2421875
226.0483246 5335.4907226563
228.3407898 30918.244140625
322.5945435 5311.5737304688
1144.66272 6260.8315429688
END IONS
"""


def _assert_spectrum_0(s):
    assert s.id == "spectrum 0"
    assert s.ms_level == 2
    assert s.centroid
    assert len(s.precursors) == 2
    assert s.precursors[0].charge == 2
    assert s.precursors[1].charge == 3
    assert abs(s.precursors[0].mz - 367.069682741984) < 1e-4
    assert abs(s.precursors[0].intensity - 56700.5185546875) < 1e-3
    iso = s.precursors[0].isolation_window
    assert iso is not None and iso.kind == "ppm" and iso.lo == -10.0 and iso.hi == 10.0
    assert abs(s.scan_start_time - 0.8963232289 / 60.0) < 1e-4
    assert s.ion_injection_time == 0.0
    assert len(s.intensity) == len(s.mz) == 6
    assert abs(s.mz[3] - 228.3407898) < 1e-4
    assert abs(s.intensity[0] - 1.0) < 1e-4  # missing intensity -> 1.0


def test_parse_spectrum():
    spectra = parse_mgf(SPECTRUM_0)
    assert len(spectra) == 1
    _assert_spectrum_0(spectra[0])


def test_parse_two_spectra():
    content = "# a comment at the beginning of the file" + SPECTRUM_0 + "\n\n" + SPECTRUM_0
    spectra = parse_mgf(content)
    assert len(spectra) == 2
    for s in spectra:
        _assert_spectrum_0(s)


def test_matrixscience_example_1():
    # global CHARGE default applies to blocks without their own CHARGE
    s = """
COM=10 pmol digest of Sample X15
ITOL=1
ITOLU=Da
MODS=Carbamidomethyl (C)
MASS=Monoisotopic
CHARGE=2+ and 3+
BEGIN IONS
TITLE=Spectrum 1
PEPMASS=983.6
846.60 73
847.60 67
END IONS

BEGIN IONS
TITLE=Spectrum 2
PEPMASS=1084.9
SCANS=3
RTINSECONDS=25
345.10 237
370.20 128
END IONS
"""
    spectra = parse_mgf(s)
    assert len(spectra) == 2
    last = spectra[-1]
    assert len(last.precursors) == 2
    assert last.precursors[0].charge == 2
    assert last.precursors[1].charge == 3
    assert last.precursors[0].isolation_window is None
    assert abs(last.scan_start_time - 25.0 / 60.0) < 1e-6


def test_matrixscience_example_2():
    # pre-block numeric/sequence-query lines are ignored; per-block
    # CHARGE/TOL/TOLU override the globals
    s = """
# comment
COM=My favourite protein has been eaten by an enzyme
CLE=Trypsin
CHARGE=2+
1024.6
2321 seq(n-ACTL) comp(2[C])
BEGIN IONS
TITLE=The first peptide - dodgy peak detection, so extra wide tolerance
PEPMASS=896.05 25674.3
CHARGE=3+
TOL=3
TOLU=Da
240.1 3
242.1 12
1623.7 55
END IONS
"""
    spectra = parse_mgf(s)
    assert len(spectra) == 1
    s0 = spectra[0]
    assert len(s0.precursors) == 1
    assert s0.precursors[0].charge == 3
    iso = s0.precursors[0].isolation_window
    assert iso.kind == "da" and iso.lo == -3.0 and iso.hi == 3.0


def test_malformed_blocks_skipped():
    # no TITLE, no PEPMASS, or no peaks -> block dropped
    s = """
BEGIN IONS
TITLE=ok
PEPMASS=500.0
100.0 1
END IONS
BEGIN IONS
PEPMASS=500.0
100.0 1
END IONS
BEGIN IONS
TITLE=no peaks
PEPMASS=500.0
END IONS
"""
    spectra = parse_mgf(s)
    assert [x.id for x in spectra] == ["ok"]


def test_tic_is_sequential_f32_sum():
    s = parse_mgf(SPECTRUM_0)[0]
    expected = np.float32(0.0)
    for i in s.intensity:
        expected = np.float32(expected + np.float32(i))
    assert np.float32(s.total_ion_current) == expected


# ---- fast-path vs exact-parser parity ------------------------------------

def _spectra_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.id == y.id
        assert x.ms_level == y.ms_level and x.centroid == y.centroid
        assert abs(x.scan_start_time - y.scan_start_time) < 1e-12
        assert np.float32(x.total_ion_current) == np.float32(y.total_ion_current)
        assert len(x.precursors) == len(y.precursors)
        for p, q in zip(x.precursors, y.precursors):
            assert p.mz == q.mz and p.intensity == q.intensity
            assert p.charge == q.charge
            assert (p.isolation_window is None) == (q.isolation_window is None)
            if p.isolation_window is not None:
                assert (p.isolation_window.kind, p.isolation_window.lo,
                        p.isolation_window.hi) == (
                    q.isolation_window.kind, q.isolation_window.lo,
                    q.isolation_window.hi)
        np.testing.assert_array_equal(np.asarray(x.mz), np.asarray(y.mz))
        np.testing.assert_array_equal(np.asarray(x.intensity), np.asarray(y.intensity))


_PARITY_CASES = [
    SPECTRUM_0,
    "# a comment" + SPECTRUM_0 + "\n\n" + SPECTRUM_0,
    # ragged columns (3 cols then 2): fast path must fall back, results equal
    "BEGIN IONS\nTITLE=t\nPEPMASS=500.0\n100.0 1 9\n200.0 2\nEND IONS\n",
    # third column ignored uniformly
    "BEGIN IONS\nTITLE=t\nPEPMASS=500.0\n100.0 1 9\n200.0 2 8\nEND IONS\n",
    # mz-only peaks (intensity defaults to 1.0)
    "BEGIN IONS\nTITLE=t\nPEPMASS=500.0\n100.0\n200.0\nEND IONS\n",
    # header line after peaks began (exact parser re-dispatches it)
    "BEGIN IONS\nTITLE=t\nPEPMASS=500.0\n100.0 1\nCHARGE=2+\n200.0 2\nEND IONS\n",
    # blank line inside peak list
    "BEGIN IONS\nTITLE=t\nPEPMASS=500.0\n100.0 1\n\n200.0 2\nEND IONS\n",
    # no TITLE / no peaks / missing PEPMASS blocks skipped
    "BEGIN IONS\nPEPMASS=1.0\n1 1\nEND IONS\nBEGIN IONS\nTITLE=a\nPEPMASS=2.0\n2 2\nEND IONS\n",
    "BEGIN IONS\nTITLE=nopeaks\nPEPMASS=1.0\nEND IONS\n",
    # leading whitespace on a peak line
    "BEGIN IONS\nTITLE=t\nPEPMASS=500.0\n  100.0 1\n200.0 2\nEND IONS\n",
    # CRLF endings
    "BEGIN IONS\r\nTITLE=t\r\nPEPMASS=500.0\r\n100.0 1\r\n200.0 2\r\nEND IONS\r\n",
    # trailing garbage after last END IONS, and content with no END IONS
    SPECTRUM_0 + "BEGIN IONS\nTITLE=x\nPEPMASS=1.0\n1 1\n",
    # unparseable peak token
    "BEGIN IONS\nTITLE=t\nPEPMASS=500.0\n100.0 one\n200.0 2\nEND IONS\n",
    # global TOL/TOLU/CHARGE before first block
    "TOL=25\nTOLU=ppm\nCHARGE=2+ and 3+\n" + SPECTRUM_0.replace("CHARGE=2+ and 3+\n", "").replace("TOL=10\n", "").replace("TOLU=ppm\n", ""),
]


def test_fast_parser_parity():
    from sage_tpu.io.mgf import _parse_mgf_exact, parse_mgf

    for case in _PARITY_CASES:
        _spectra_equal(parse_mgf(case, 3), _parse_mgf_exact(case, 3))


def test_fast_parser_parity_random():
    # randomized well-formed files: the fast path must take effect and agree
    from sage_tpu.io.mgf import _parse_mgf_exact, _parse_mgf_fast

    rng = np.random.default_rng(7)
    blocks = []
    for i in range(50):
        n = int(rng.integers(1, 40))
        mz = rng.uniform(100, 2000, n)
        it = rng.uniform(0, 1e6, n)
        lines = [f"{m:.6f} {v:.4f}" for m, v in zip(mz, it)]
        hdr = [f"TITLE=scan {i}", f"PEPMASS={rng.uniform(300, 1500):.5f}"]
        if rng.random() < 0.5:
            hdr.append("CHARGE=%d+" % int(rng.integers(1, 5)))
        if rng.random() < 0.3:
            hdr.append(f"RTINSECONDS={rng.uniform(0, 6000):.3f}")
        blocks.append("BEGIN IONS\n" + "\n".join(hdr + lines) + "\nEND IONS")
    content = "\n\n".join(blocks) + "\n"
    fast = _parse_mgf_fast(content, 0)
    assert fast is not None and len(fast) == 50
    _spectra_equal(fast, _parse_mgf_exact(content, 0))
