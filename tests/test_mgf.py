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
