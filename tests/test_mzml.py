"""mzML parser + spectrum processor tests (fixture: the reference's bundled
single-scan mzML from PXD016766)."""

import base64
import struct
import zlib

import pytest

import numpy as np

from sage_tpu.chem.mass import NEUTRON, PROTON
from sage_tpu.io.mzml import MzMLReader, read_mzml
from sage_tpu.native import deisotope
from sage_tpu.spectrum.processor import RawSpectrum, SpectrumProcessor, select_most_intense_peak

FIXTURE = "/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"


def test_parse_reference_fixture():
    spectra = read_mzml(FIXTURE)
    assert len(spectra) == 1
    s = spectra[0]
    assert s.ms_level == 2
    assert s.centroid
    assert s.id == "controllerType=0 controllerNumber=1 scan=30069"
    assert len(s.mz) == 299 and len(s.intensity) == 299
    assert abs(s.scan_start_time - 108.2854) < 1e-4
    assert abs(s.ion_injection_time - 9.645317681134) < 1e-6
    assert s.total_ion_current == 1.1475606e08
    assert len(s.precursors) == 1
    p = s.precursors[0]
    assert abs(p.mz - 643.034396630915) < 1e-6
    assert p.charge == 3
    assert p.isolation_window is not None
    assert p.isolation_window.kind == "da"
    assert p.isolation_window.lo == -1.0 and p.isolation_window.hi == 1.0
    assert p.spectrum_ref == "controllerType=0 controllerNumber=1 scan=30068"


def _mk_mzml(scans):
    body = []
    for i, sc in enumerate(scans):
        mz_bytes = struct.pack("<%dd" % len(sc["mz"]), *sc["mz"])
        int_bytes = struct.pack("<%dd" % len(sc["int"]), *sc["int"])
        mz_b64 = base64.b64encode(zlib.compress(mz_bytes)).decode()
        int_b64 = base64.b64encode(int_bytes).decode()
        prec = ""
        if sc.get("precursor_mz"):
            charge = (
                f'<cvParam accession="MS:1000041" value="{sc["charge"]}"/>'
                if sc.get("charge")
                else ""
            )
            prec = f"""
            <precursorList count="1"><precursor>
              <isolationWindow>
                <cvParam accession="MS:1000827" value="{sc["precursor_mz"]}"/>
                <cvParam accession="MS:1000828" value="1.0"/>
                <cvParam accession="MS:1000829" value="1.0"/>
              </isolationWindow>
              <selectedIonList count="1"><selectedIon>
                <cvParam accession="MS:1000744" value="{sc["precursor_mz"]}"/>
                {charge}
              </selectedIon></selectedIonList>
            </precursor></precursorList>"""
        body.append(f"""
        <spectrum index="{i}" id="scan={i + 1}" defaultArrayLength="{len(sc["mz"])}">
          <cvParam accession="MS:1000511" value="{sc["level"]}"/>
          <cvParam accession="MS:1000127" value=""/>
          <cvParam accession="MS:1000285" value="{sc.get("tic", 100.0)}"/>
          <scanList count="1"><scan>
            <cvParam accession="MS:1000016" value="{sc.get("rt", 1.0)}" unitAccession="{sc.get("rt_unit", "UO:0000031")}"/>
          </scan></scanList>
          {prec}
          <binaryDataArrayList count="2">
            <binaryDataArray>
              <cvParam accession="MS:1000523" value=""/>
              <cvParam accession="MS:1000574" value=""/>
              <cvParam accession="MS:1000514" value=""/>
              <binary>{mz_b64}</binary>
            </binaryDataArray>
            <binaryDataArray>
              <cvParam accession="MS:1000523" value=""/>
              <cvParam accession="MS:1000576" value=""/>
              <cvParam accession="MS:1000515" value=""/>
              <binary>{int_b64}</binary>
            </binaryDataArray>
          </binaryDataArrayList>
        </spectrum>""")
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n<mzML xmlns="http://psi.hupo.org/ms/mzml">'
        f"<run><spectrumList>{''.join(body)}</spectrumList></run></mzML>"
    ).encode()


def test_synthetic_roundtrip_and_units():
    data = _mk_mzml(
        [
            {"mz": [100.0, 200.0], "int": [1.0, 2.0], "level": 1, "rt": 90.0, "rt_unit": "UO:0000010"},
            {"mz": [150.0, 250.0], "int": [3.0, 4.0], "level": 2, "precursor_mz": 500.25, "charge": 2},
        ]
    )
    spectra = MzMLReader(file_id=3).parse(data)
    assert len(spectra) == 2
    assert spectra[0].ms_level == 1
    assert spectra[0].file_id == 3
    # seconds -> minutes
    assert abs(spectra[0].scan_start_time - 1.5) < 1e-6
    assert np.allclose(spectra[0].mz, [100.0, 200.0])
    assert spectra[1].precursors[0].charge == 2
    assert spectra[1].precursors[0].mz == 500.25


def test_tic_zero_skipped_and_level_filter():
    data = _mk_mzml(
        [
            {"mz": [1.0], "int": [1.0], "level": 2, "tic": 0.0, "precursor_mz": 5.0},
            {"mz": [2.0], "int": [1.0], "level": 2, "precursor_mz": 5.0},
            {"mz": [3.0], "int": [1.0], "level": 1},
        ]
    )
    spectra = MzMLReader().parse(data)
    assert [list(s.mz) for s in spectra] == [[2.0], [3.0]]
    only_ms2 = MzMLReader(ms_level=2).parse(data)
    assert [list(s.mz) for s in only_ms2] == [[2.0]]


def test_missing_charge_is_none():
    data = _mk_mzml([{"mz": [1.0], "int": [1.0], "level": 2, "precursor_mz": 7.0}])
    (s,) = MzMLReader().parse(data)
    assert s.precursors[0].charge is None


def test_deisotope_golden():
    # spectrum.rs:419-500
    mz = np.array(
        [
            800.9,
            800.9 + NEUTRON * 1.0,
            800.9 + NEUTRON * 2.0,
            803.4080,
            804.4108,
            805.4106,
            806.4116,
            810.0,
            812.0,
            812.0 + NEUTRON / 2.0,
        ],
        dtype=np.float32,
    )
    inten = np.array([2.0, 1.5, 1.0, 4.0, 3.0, 2.0, 1.0, 1.0, 9.0, 4.5], dtype=np.float32)
    out_int, out_charge, out_env = deisotope(mz, inten, 2, 5.0, 800.91)
    assert list(out_int) == [2.0, 2.5, 1.0, 10.0, 6.0, 3.0, 1.0, 1.0, 13.5, 4.5]
    assert list(out_charge) == [0, 1, 1, 1, 1, 1, 1, 0, 2, 2]
    assert list(out_env) == [-1, -1, 1, -1, 3, 4, 5, -1, -1, 8]


def test_process_ms2_deisotope_converts_charge():
    raw = RawSpectrum(
        ms_level=2,
        id="x",
        centroid=True,
        mz=np.array([100.0, 800.0, 800.0 + NEUTRON], dtype=np.float32),
        intensity=np.array([5.0, 4.0, 1.0], dtype=np.float32),
    )
    from sage_tpu.spectrum.processor import Precursor

    raw.precursors = [Precursor(mz=500.0, charge=2)]
    sp = SpectrumProcessor(150, True, 0.0)
    out = sp.process(raw)
    # The C13 peak is folded into its envelope; charge-1 assignment keeps mass = mz - PROTON
    assert len(out) == 2
    assert np.allclose(out.masses, [100.0 - PROTON, 800.0 - PROTON], atol=1e-4)
    assert list(out.intensities) == [5.0, 5.0]
    assert out.total_ion_current == 10.0


def test_process_ms1_sorts_columns():
    # spectrum.rs:608-650
    raw = RawSpectrum(
        ms_level=1,
        mz=np.array([102.0, 100.0, 101.0], dtype=np.float32),
        intensity=np.array([30.0, 10.0, 20.0], dtype=np.float32),
    )
    sp = SpectrumProcessor(10, False, 0.0)
    out = sp.process(raw)
    assert np.allclose(out.masses, np.array([100.0, 101.0, 102.0], np.float32) - PROTON)
    assert list(out.intensities) == [10.0, 20.0, 30.0]
    assert len(out.mobilities) == 0
    assert out.total_ion_current == 60.0

    raw = RawSpectrum(
        ms_level=1,
        mz=np.array([102.0, 100.0, 101.0], dtype=np.float32),
        intensity=np.array([30.0, 10.0, 20.0], dtype=np.float32),
        mobility=np.array([3.0, 1.0, 2.0], dtype=np.float32),
    )
    out = sp.process(raw)
    assert list(out.mobilities) == [1.0, 2.0, 3.0]


def test_select_most_intense_peak():
    # spectrum.rs:570-605
    masses = np.array([99.0, 100.0, 100.01, 100.02, 101.0], dtype=np.float32)
    inten = np.array([10.0, 20.0, 50.0, 30.0, 100.0], dtype=np.float32)
    from sage_tpu.chem.mass import Tolerance

    idx = select_most_intense_peak(masses, inten, np.float32(100.01), Tolerance("da", -0.02, 0.02))
    assert idx == 2

    label = 126.127726
    masses = np.array([label - PROTON - 0.01, label - PROTON, label - PROTON + 0.01], np.float32)
    inten = np.array([10.0, 100.0, 50.0], np.float32)
    idx = select_most_intense_peak(
        masses, inten, np.float32(label), Tolerance("da", -0.005, 0.005), offset=-PROTON
    )
    assert idx == 1


def test_profile_ms2_raises():
    raw = RawSpectrum(ms_level=2, id="p", centroid=False, mz=np.zeros(1, np.float32), intensity=np.zeros(1, np.float32))
    sp = SpectrumProcessor(10, False, 0.0)
    try:
        sp.process(raw)
        assert False, "expected profile-mode error"
    except ValueError as e:
        assert "profile" in str(e)


def test_read_mzml_parallel_matches_serial(tmp_path):
    """The chunked process-pool reader returns the same spectra as the
    serial state machine (forced with workers=2 on any host)."""
    import numpy as np

    from sage_tpu.io.mzml import read_mzml, read_mzml_parallel

    path = "/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"
    a = read_mzml(path)
    # small file falls back to serial; force the split path via workers
    # by lowering the size gate through a big synthetic copy
    data = open(path, "rb").read()
    b = read_mzml_parallel(path, workers=2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.id == y.id and x.ms_level == y.ms_level
        np.testing.assert_array_equal(x.mz, y.mz)
        np.testing.assert_array_equal(x.intensity, y.intensity)


def test_c_scanner_matches_python_parser():
    """The native mzml_scan fast path must produce identical spectra to
    the Python state machine on the bundled fixture (native/mzml_scan.c)."""
    import numpy as np

    from sage_tpu.io.mzml import MzMLReader, parse_fast

    data = open("/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML", "rb").read()
    fast = parse_fast(data)
    if fast is None:
        import pytest

        pytest.skip("no C compiler for the native scanner")
    slow = MzMLReader().parse(data)
    assert len(fast) == len(slow)
    for a, b in zip(fast, slow):
        assert a.id == b.id and a.ms_level == b.ms_level
        assert a.centroid == b.centroid
        assert a.total_ion_current == b.total_ion_current
        assert abs(a.scan_start_time - b.scan_start_time) < 1e-12
        np.testing.assert_array_equal(a.mz, b.mz)
        np.testing.assert_array_equal(a.intensity, b.intensity)
        assert len(a.precursors) == len(b.precursors)
        for p, q in zip(a.precursors, b.precursors):
            assert p.mz == q.mz and p.charge == q.charge
            assert p.isolation_window == q.isolation_window
            assert p.inverse_ion_mobility == q.inverse_ion_mobility
            assert p.spectrum_ref == q.spectrum_ref


def _reference_issue_snippets():
    """Extract the raw <spectrum> XML literals from the reference's inline
    regression tests (mzml.rs, GitHub issues 78/117/210) at runtime —
    real vendor-style documents incl. base64 binary payloads."""
    import re

    src = open("/root/reference/crates/sage-cloudpath/src/mzml.rs").read()
    blocks = re.findall(r'r#"\s*(<spectrum.*?</spectrum>)\s*"#', src, re.S)
    assert len(blocks) >= 3, "reference test snippets not found"
    return blocks


@pytest.mark.parametrize("use_c", [False, True])
def test_reference_issue_regressions(use_c):
    """Parity with the reference's mzML regression tests (issues 78, 117,
    210): isolation windows, ion mobility from selectedIon OR scan, and
    selected-ion m/z overriding the isolation target."""
    from sage_tpu.io.mzml import MzMLReader, parse_fast

    blocks = _reference_issue_snippets()

    def parse(xml):
        data = xml.encode()
        if use_c:
            out = parse_fast(data)
            if out is None:
                pytest.skip("no C scanner available")
            return out
        return MzMLReader().parse(data)

    # issue 78: IM on the selected ion; asymmetric isolation window;
    # seconds -> minutes
    s = parse(blocks[0])[0]
    assert s.id == "spectrum=2442"
    assert s.ms_level == 2 and s.centroid
    p = s.precursors[0]
    assert p.charge == 2
    assert abs(p.mz - 457.723968) < 1e-4
    assert abs(p.inverse_ion_mobility - 1.078628) < 1e-4
    assert p.isolation_window.kind == "da"
    assert p.isolation_window.lo == -1.5 and p.isolation_window.hi == 0.75
    assert abs(s.scan_start_time - 25.066) < 1e-3
    assert len(s.mz) == len(s.intensity) > 0

    # issue 117: IM written on the scan element instead
    s = parse(blocks[1])[0]
    p = s.precursors[0]
    assert p.inverse_ion_mobility is not None
    assert abs(p.inverse_ion_mobility - 1.078628) < 1e-4

    # issue 210: selected-ion m/z overrides the isolation window target
    s = parse(blocks[2])[0]
    p = s.precursors[0]
    assert abs(p.mz - 457.723968) < 1e-4
    assert p.isolation_window.lo == -1.5 and p.isolation_window.hi == 0.75


def test_c_scanner_matches_python_on_issue_snippets():
    from sage_tpu.io.mzml import MzMLReader, parse_fast
    import numpy as np

    for xml in _reference_issue_snippets():
        data = xml.encode()
        fast = parse_fast(data)
        if fast is None:
            pytest.skip("no C scanner available")
        slow = MzMLReader().parse(data)
        assert len(fast) == len(slow)
        for a, b in zip(fast, slow):
            np.testing.assert_array_equal(a.mz, b.mz)
            np.testing.assert_array_equal(a.intensity, b.intensity)
            assert len(a.precursors) == len(b.precursors)
            for p, q in zip(a.precursors, b.precursors):
                assert p.mz == q.mz and p.charge == q.charge
                assert p.isolation_window == q.isolation_window
                assert p.inverse_ion_mobility == q.inverse_ion_mobility
