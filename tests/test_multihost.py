"""Multi-host layer tests: path sharding, the cross-host result gather,
and the 2-process CPU e2e whose merged TSV must equal the 1-process run
byte-for-byte (VERDICT round-1 item 4; the analog of the reference's
parallel SageResults reduce, output.rs:21-41)."""

import json
import os
import socket
import subprocess
import sys

import pytest

from sage_tpu.parallel.multihost import shard_paths

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_multihost_worker.py")

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
    # 3 files over 2 hosts: host 0 gets files {0, 2}, host 1 gets {1} —
    # exercising an uneven shard and out-of-order reassembly
    "mzml_paths": ["/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"] * 3,
}


def test_shard_paths_round_robin():
    paths = [f"f{i}.mzML" for i in range(5)]
    assert shard_paths(paths, 0, 2) == [
        (0, "f0.mzML"), (2, "f2.mzML"), (4, "f4.mzML")
    ]
    assert shard_paths(paths, 1, 2) == [(1, "f1.mzML"), (3, "f3.mzML")]
    # single process sees everything, ids global
    assert shard_paths(paths, 0, 1) == list(enumerate(paths))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(extra):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["SAGE_TPU_MESH"] = "1,1"
    env.update(extra)
    return env


def test_two_process_e2e_matches_single(tmp_path):
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(CONFIG, f)

    # --- single-process reference run ---
    single_dir = str(tmp_path / "single")
    os.makedirs(single_dir)
    r = subprocess.run(
        [sys.executable, WORKER, cfg_path, single_dir],
        env=_worker_env({}), capture_output=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    # --- 2-process distributed run (shared output dir; proc 0 writes) ---
    dist_dir = str(tmp_path / "dist")
    os.makedirs(dist_dir)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, cfg_path, dist_dir],
            env=_worker_env({
                "SAGE_TPU_COORDINATOR": f"127.0.0.1:{port}",
                "SAGE_TPU_NUM_PROCS": "2",
                "SAGE_TPU_PROC_ID": str(i),
            }),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]

    single_tsv = open(os.path.join(single_dir, "results.sage.tsv"), "rb").read()
    dist_tsv = open(os.path.join(dist_dir, "results.sage.tsv"), "rb").read()
    assert single_tsv == dist_tsv, "merged multi-host TSV differs"
    # all 3 copies of the golden scan produce the golden PSM
    assert len(single_tsv.splitlines()) == 4
    # only process 0 wrote outputs (no duplicate/partial files)
    assert sorted(os.listdir(dist_dir)) == sorted(os.listdir(single_dir))


def test_two_process_lfq_matches_single(tmp_path):
    """LFQ across 2 hosts: the two LC runs land on DIFFERENT hosts, so
    quantifying both requires the cross-host MS1-spectra + feature
    gather before the global LFQ stage. lfq.tsv and results.sage.tsv
    must equal the single-process run byte-for-byte."""
    import numpy as np

    from sage_tpu.chem.fasta import Fasta
    from sage_tpu.index.builder import DatabaseParams
    from test_pipeline import _write_lc_run

    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    rng = np.random.default_rng(17)
    lines = []
    for i in range(80):
        seq = AA[rng.integers(0, len(AA), size=240)].tobytes().decode()
        lines.append(f">sp|LFQ{i:03d}|LFQ{i}_SYN synthetic\n{seq}")
    fasta_path = tmp_path / "lfq.fasta"
    fasta_path.write_text("\n".join(lines))
    params = DatabaseParams()
    db = params.build(Fasta.parse("\n".join(lines), params.decoy_tag, True))
    targets = np.flatnonzero(~db.table.decoy & (db.table.lens >= 10))[:150]
    elute_rt = rng.uniform(3.0, 21.0, len(targets))
    _write_lc_run(tmp_path / "a.mzML", db, targets, elute_rt, rng)
    _write_lc_run(
        tmp_path / "b.mzML", db, targets, elute_rt, rng,
        rt_shift=0.9, scale=2.0,
    )
    cfg = {
        "database": {"fasta": str(fasta_path)},
        "precursor_tol": {"ppm": [-20, 20]},
        "fragment_tol": {"ppm": [-10, 10]},
        "deisotope": False,
        "quant": {"lfq": True},
        "mzml_paths": [str(tmp_path / "a.mzML"), str(tmp_path / "b.mzML")],
    }
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    single_dir = str(tmp_path / "single")
    os.makedirs(single_dir)
    r = subprocess.run(
        [sys.executable, WORKER, cfg_path, single_dir],
        env=_worker_env({}), capture_output=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist_dir = str(tmp_path / "dist")
    os.makedirs(dist_dir)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, cfg_path, dist_dir],
            env=_worker_env({
                "SAGE_TPU_COORDINATOR": f"127.0.0.1:{port}",
                "SAGE_TPU_NUM_PROCS": "2",
                "SAGE_TPU_PROC_ID": str(i),
            }),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]

    for name in ("results.sage.tsv", "lfq.tsv"):
        a = open(os.path.join(single_dir, name), "rb").read()
        b = open(os.path.join(dist_dir, name), "rb").read()
        assert a == b, f"{name} differs between 1-process and 2-process"
    # the LFQ table actually quantified rows from both hosts' files
    lines = open(os.path.join(dist_dir, "lfq.tsv")).read().splitlines()
    assert len(lines) >= 10


def test_two_process_tmt_matches_single(tmp_path):
    """TMT quant records gathered across hosts: two TMT files shard one
    per host; tmt.tsv must equal the single-process run byte-for-byte."""
    from test_pipeline import _write_tmt_mzml

    _write_tmt_mzml(tmp_path / "t1.mzML")
    _write_tmt_mzml(tmp_path / "t2.mzML")
    cfg = json.loads(json.dumps(CONFIG))
    cfg["mzml_paths"] = [str(tmp_path / "t1.mzML"), str(tmp_path / "t2.mzML")]
    cfg["deisotope"] = False
    cfg["quant"] = {"tmt": "Tmt6", "tmt_settings": {"level": 2}}
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    single_dir = str(tmp_path / "single")
    os.makedirs(single_dir)
    r = subprocess.run(
        [sys.executable, WORKER, cfg_path, single_dir],
        env=_worker_env({}), capture_output=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist_dir = str(tmp_path / "dist")
    os.makedirs(dist_dir)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, cfg_path, dist_dir],
            env=_worker_env({
                "SAGE_TPU_COORDINATOR": f"127.0.0.1:{port}",
                "SAGE_TPU_NUM_PROCS": "2",
                "SAGE_TPU_PROC_ID": str(i),
            }),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]

    for name in ("results.sage.tsv", "tmt.tsv"):
        a = open(os.path.join(single_dir, name), "rb").read()
        b = open(os.path.join(dist_dir, name), "rb").read()
        assert a == b, f"{name} differs between 1-process and 2-process"
    tmt = open(os.path.join(dist_dir, "tmt.tsv")).read().splitlines()
    assert len(tmt) == 3  # header + one PSM per file
