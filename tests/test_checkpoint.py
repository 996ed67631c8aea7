"""Index checkpoint/resume: save_database/load_database must round-trip
every array bit-exactly and reproduce identical search results (a
first-class capability here; the reference only has an uncalled debug
dump, database.rs:435-458)."""

import numpy as np

from sage_tpu.chem.fasta import Fasta
from sage_tpu.chem.mass import Tolerance
from sage_tpu.index.builder import DatabaseParams, load_database, save_database
from sage_tpu.ops.search import Scorer, SearchParams

FASTA = ">sp|A|A_TEST first\nMKWVTFISLLLLFSSAYSRGVFRRDTHKSEIAHRFKDLGE\n" \
        ">sp|B|B_TEST second\nPEPTIDEKRILLKMEPTIDEKRAGEILK\n"


def test_checkpoint_roundtrip(tmp_path):
    params = DatabaseParams(
        variable_mods={
            k: v for k, v in
            __import__("sage_tpu.chem.modification", fromlist=["validate_var_mods"])
            .validate_var_mods({"M": [15.9949]}).items()
        },
    )
    fasta = Fasta.parse(FASTA, params.decoy_tag, True)
    db = params.build(fasta)
    path = str(tmp_path / "index.npz")
    save_database(db, path)
    db2 = load_database(path)

    assert len(db2) == len(db)
    np.testing.assert_array_equal(db2.fragment_mz, db.fragment_mz)
    np.testing.assert_array_equal(db2.fragment_pep, db.fragment_pep)
    np.testing.assert_array_equal(db2.bucket_min, db.bucket_min)
    np.testing.assert_array_equal(db2.table.mono, db.table.mono)
    np.testing.assert_array_equal(db2.table.resmass, db.table.resmass)
    np.testing.assert_array_equal(db2.table.decoy, db.table.decoy)
    assert db2.ion_kinds == db.ion_kinds
    assert db2.decoy_tag == db.decoy_tag
    assert [str(s) for s, _ in db2.potential_mods] == [
        str(s) for s, _ in db.potential_mods
    ]
    for p, p2 in zip(db.peptides, db2.peptides):
        assert p.sequence == p2.sequence
        assert p.decoy == p2.decoy
        assert p.proteins == p2.proteins
        assert str(p) == str(p2)
        assert np.float32(p.monoisotopic) == np.float32(p2.monoisotopic)

    # identical search results through the restored index
    sp = SearchParams(
        precursor_tol=Tolerance("ppm", -20, 20),
        fragment_tol=Tolerance("ppm", -10, 10),
        min_matched_peaks=1,
    )
    from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

    b, y = db.table.ladders()
    i = int(np.argmax(db.table.lens))
    n = int(db.table.lens[i]) - 1
    masses = np.sort(np.concatenate([b[i, :n], y[i, :n]])).astype(np.float32)
    spec = ProcessedSpectrum(
        level=2, id="scan=1", file_id=0, scan_start_time=1.0,
        ion_injection_time=1.0,
        precursors=[Precursor(mz=float(db.table.mono[i] / 2 + 1.0072764), charge=2)],
        masses=masses,
        intensities=np.full(masses.shape, 100.0, np.float32),
        mobilities=np.zeros(0, np.float32),
        total_ion_current=np.float32(100.0 * masses.size),
    )
    t1 = Scorer(db, sp).score_table([spec])
    t2 = Scorer(db2, sp).score_table([spec])
    assert len(t1) == len(t2) > 0
    for k in t1.columns:
        np.testing.assert_array_equal(t1.columns[k], t2.columns[k], err_msg=k)
