"""Chimera and wide-window search modes (scoring.rs:598-672, 418-462)."""

import numpy as np
import pytest

from sage_tpu.chem.fasta import Fasta
from sage_tpu.chem.mass import PROTON, Tolerance
from sage_tpu.index.builder import DatabaseParams
from sage_tpu.ops.search import Scorer, SearchParams
from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum

FASTA = ">sp|A|A_TEST first\nMKWVTFISLLLLFSSAYSRGVFRRDTHKSEIAHRFKDLGE\n" \
        ">sp|B|B_TEST second\nPEPTIDEKRILLKMEPTIDEKRAGEILK\n"


@pytest.fixture(scope="module")
def db():
    params = DatabaseParams()
    return params.build(Fasta.parse(FASTA, params.decoy_tag, True))


def _ions(db, i):
    b, y = db.table.ladders()
    n = int(db.table.lens[i]) - 1
    return np.concatenate([b[i, :n], y[i, :n]])


def _spectrum(masses, intensities, prec_mz, charge=None, iso=None):
    order = np.argsort(masses, kind="stable")
    masses = np.asarray(masses, np.float32)[order]
    intensities = np.asarray(intensities, np.float32)[order]
    return ProcessedSpectrum(
        level=2, id="scan=7", file_id=0, scan_start_time=5.0,
        ion_injection_time=1.0,
        precursors=[
            Precursor(mz=float(prec_mz), charge=charge, isolation_window=iso)
        ],
        masses=masses,
        intensities=intensities,
        mobilities=np.zeros(0, np.float32),
        total_ion_current=np.float32(intensities.sum()),
    )


def test_chimera_finds_second_peptide(db):
    """Chimeric spectrum = ion ladders of two co-isolated peptides; after
    the best PSM's peaks are removed, the re-search must identify the
    second peptide (scoring.rs:598-672)."""
    targets = np.flatnonzero(~db.table.decoy & (db.table.lens >= 8))
    i, j = int(targets[0]), int(targets[-1])
    mi = float(db.table.mono[i])
    # precursor window must cover both peptides: huge Da tolerance
    sp = SearchParams(
        precursor_tol=Tolerance("da", -5000.0, 5000.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        min_matched_peaks=4,
        chimera=True,
        report_psms=2,
    )
    fi, fj = _ions(db, i), _ions(db, j)
    masses = np.concatenate([fi, fj])
    # peptide i much more intense than j
    intens = np.concatenate(
        [np.full(fi.shape, 1000.0), np.full(fj.shape, 100.0)]
    )
    spec = _spectrum(masses, intens, mi / 2 + PROTON, charge=2)
    t = Scorer(db, sp).score_table([spec])
    assert len(t) == 2
    peps = {int(x) for x in t.columns["peptide_idx"]}
    assert peps == {i, j}
    ranks = sorted(int(x) for x in t.columns["rank"])
    assert ranks == [1, 2]
    # the two PSMs matched disjoint peak sets: total matched <= total peaks
    total_matched = int(t.columns["matched_peaks"].sum())
    assert total_matched <= masses.size


def test_chimera_equals_standard_for_clean_spectrum(db):
    """With one peptide's ions and report_psms=1, chimera mode reduces to
    the standard search."""
    targets = np.flatnonzero(~db.table.decoy & (db.table.lens >= 8))
    i = int(targets[0])
    fi = _ions(db, i)
    spec = _spectrum(
        fi, np.full(fi.shape, 500.0), float(db.table.mono[i]) / 2 + PROTON,
        charge=2,
    )
    base = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
    )
    import dataclasses

    chim = dataclasses.replace(base, chimera=True)
    t1 = Scorer(db, base).score_table([spec])
    t2 = Scorer(db, chim).score_table([spec])
    assert len(t1) == len(t2) == 1
    for k in ("peptide_idx", "matched_peaks", "hyperscore", "charge"):
        np.testing.assert_array_equal(t1.columns[k], t2.columns[k], err_msg=k)


def test_wide_window_mode(db):
    """wide_window searches the isolation window scaled by each sweep
    charge instead of the precursor tolerance (scoring.rs:418-436); the
    annotated charge is ignored."""
    targets = np.flatnonzero(~db.table.decoy & (db.table.lens >= 8))
    i = int(targets[0])
    fi = _ions(db, i)
    mono = float(db.table.mono[i])
    # precursor m/z annotated 1.5 Da away at z=2: the standard narrow ppm
    # search misses, the +/-2.4 Da default wide window still covers it
    prec_mz = (mono + 1.5) / 2 + PROTON
    spec = _spectrum(fi, np.full(fi.shape, 500.0), prec_mz, charge=None)
    wide = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
        wide_window=True,
    )
    narrow = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
    )
    t_wide = Scorer(db, wide).score_table([spec])
    t_narrow = Scorer(db, narrow).score_table([spec])
    assert len(t_wide) == 1
    assert int(t_wide.columns["peptide_idx"][0]) == i
    assert len(t_narrow) == 0
