"""File-batch parallelism (--batch-size, main.rs:118-121 +
runner.rs:482-489): N files are read/processed concurrently on worker
threads; results must be independent of N."""

import os

from sage_tpu.pipeline.input import build_search
from sage_tpu.pipeline.runner import Runner

CONFIG = {
    "database": {
        "bucket_size": 16384,
        "enzyme": {
            "missed_cleavages": 1,
            "min_len": 7,
            "max_len": 30,
            "cleave_at": "KR",
            "restrict": "P",
        },
        "peptide_min_mass": 500.0,
        "peptide_max_mass": 5000.0,
        "min_ion_index": 2,
        "static_mods": {"C": 57.0215},
        "max_variable_mods": 2,
        "decoy_tag": "rev_",
        "fasta": "/root/reference/tests/Q99536.fasta",
    },
    "precursor_tol": {"ppm": [-50, 50]},
    "fragment_tol": {"ppm": [-10, 10]},
    "isotope_errors": [-1, 3],
    "deisotope": True,
    "mzml_paths": ["/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"] * 4,
}


def test_file_workers_policy(tmp_path):
    search = build_search(dict(CONFIG), output_directory=str(tmp_path))
    r = Runner(search)
    search.batch_size = 3
    assert r._file_workers() == 3
    search.batch_size = 0
    assert r._file_workers() == max((os.cpu_count() or 1) // 2, 1)
    search.batch_size = -5
    assert r._file_workers() >= 1


def test_batch_size_config_and_cli_plumbing(tmp_path):
    cfg = dict(CONFIG)
    cfg["batch_size"] = 7
    s = build_search(cfg, output_directory=str(tmp_path))
    assert s.batch_size == 7
    s2 = build_search(cfg, output_directory=str(tmp_path), batch_size=3)
    assert s2.batch_size == 3


def test_batched_reads_match_serial(tmp_path):
    outs = {}
    for bs in (1, 3):
        outdir = tmp_path / f"bs{bs}"
        outdir.mkdir()
        search = build_search(
            dict(CONFIG), output_directory=str(outdir), batch_size=bs
        )
        Runner(search).run()
        with open(outdir / "results.sage.tsv", "rb") as f:
            outs[bs] = f.read()
    assert outs[1] == outs[3]
    assert len(outs[1].splitlines()) == 5  # 4 files x golden PSM + header
