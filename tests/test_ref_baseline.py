"""The C baseline program (native/ref_baseline.c) mirrors the reference
Rust hot loop exactly; bench.py uses its measured single-core spectra/s as
the baseline denominator. These tests prove the C program scores the same
PSMs as the TPU engine (which is itself golden-tested against the
reference), so the denominator measures the *same work* as the numerator.
"""

import shutil

import numpy as np
import pytest

from sage_tpu.bench_baseline import (
    compile_ref_baseline,
    measure_cpu_baseline,
    run_ref_baseline,
    synth_fasta,
    synth_spectra,
    write_baseline_dump,
)
from sage_tpu.chem.fasta import Fasta
from sage_tpu.chem.mass import Tolerance
from sage_tpu.index.builder import DatabaseParams
from sage_tpu.ops.search import Scorer, SearchParams

needs_cc = pytest.mark.skipif(
    all(shutil.which(c) is None for c in ("cc", "gcc", "clang")),
    reason="no C compiler",
)


@pytest.fixture(scope="module")
def workload():
    params = DatabaseParams()
    fasta = Fasta.parse(synth_fasta(30), params.decoy_tag, True)
    db = params.build(fasta)
    search = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
    )
    spectra = synth_spectra(db, 128)
    return db, search, spectra


@needs_cc
def test_ref_baseline_matches_engine(workload, tmp_path):
    db, search, spectra = workload
    dump = str(tmp_path / "dump.bin")
    write_baseline_dump(db, spectra, search, dump, reps=1)
    stats, per_spec = run_ref_baseline(dump, verbose=True)
    assert stats["n_spectra"] == len(spectra)

    table = Scorer(db, search).score_table(spectra)
    # best PSM per spectrum from the engine (report_psms=1 -> rank 1 rows)
    engine = {}
    for i in range(len(table)):
        engine[int(table.spec_idx[i])] = (
            int(table.peptide_idx[i]),
            int(table.matched_peaks[i]),
            int(table.longest_b[i]),
            int(table.longest_y[i]),
            float(table.hyperscore[i]),
        )
    c_hits = {
        s: (pep, mb + my, lb, ly, hs)
        for s, pep, mb, my, lb, ly, hs in per_spec
        if pep >= 0
    }
    assert set(engine) == set(c_hits), "different spectra produced PSMs"
    assert len(engine) > 100  # nearly every synthetic spectrum should hit
    for s, (pep, mp, lb, ly, hs) in engine.items():
        cpep, cmp_, clb, cly, chs = c_hits[s]
        assert cpep == pep, f"spec {s}: peptide {cpep} != {pep}"
        assert cmp_ == mp, f"spec {s}: matched {cmp_} != {mp}"
        assert (clb, cly) == (lb, ly), f"spec {s}: runs differ"
        assert hs == pytest.approx(chs, rel=1e-9), f"spec {s}: hyperscore"
    assert stats["psms"] == len(table)


@needs_cc
def test_measure_cpu_baseline_runs(workload):
    db, search, spectra = workload
    stats = measure_cpu_baseline(db, spectra[:32], search, reps=2)
    assert stats is not None
    assert stats["spectra_per_s"] > 0
    assert stats["n_spectra"] == 32


def test_compile_cached():
    exe = compile_ref_baseline()
    if exe is None:
        pytest.skip("no C compiler")
    # second call must hit the mtime cache
    assert compile_ref_baseline() == exe
