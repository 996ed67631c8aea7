"""CLI surface smoke tests — the analog of the reference's CI runs
(.github/workflows/rust.yml:24-33: `cargo run tests/config.json` and a
flags run with --annotate-matches --write-pin). Drives
`python -m sage_tpu` as a real subprocess so argument parsing, config
loading, and the output contract are locked at the process boundary."""

import json
import os
import subprocess
import sys

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
}

MZML = "/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["SAGE_TPU_MESH"] = "1,1"
    # drop the axon TPU plugin site-dir: it force-registers its backend
    # regardless of JAX_PLATFORMS, and these are pure-CPU subprocesses
    keep = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))] + keep
    )
    return env


def test_cli_config_run(tmp_path):
    cfg = dict(CONFIG)
    cfg["mzml_paths"] = [MZML]
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    r = subprocess.run(
        [sys.executable, "-m", "sage_tpu", str(cfg_path), "-o",
         str(tmp_path)],
        env=_env(), capture_output=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    # the resolved-parameters record is echoed to stdout (runner.rs:666)
    assert '"score_type": "SageHyperScore"' in r.stdout.decode()
    lines = (tmp_path / "results.sage.tsv").read_text().splitlines()
    assert len(lines[0].split("\t")) == 43
    row = dict(zip(lines[0].split("\t"), lines[1].split("\t")))
    assert row["peptide"] == "LQSRPAAPPAPGPGQLTLR"
    assert (tmp_path / "results.json").exists()


def test_cli_flags_run(tmp_path):
    """Positional mzML override + -f fasta + --annotate-matches
    --write-pin --batch-size --mesh-shape (the reference's second CI
    invocation plus the TPU flags)."""
    cfg = dict(CONFIG)
    db = dict(cfg["database"])
    db.pop("fasta")
    cfg["database"] = db
    cfg_path = tmp_path / "config-cli.json"
    cfg_path.write_text(json.dumps(cfg))
    r = subprocess.run(
        [
            sys.executable, "-m", "sage_tpu", str(cfg_path), MZML,
            "-f", "/root/reference/tests/Q99536.fasta",
            "-o", str(tmp_path),
            "--annotate-matches", "--write-pin",
            "--batch-size", "2", "--mesh-shape", "1,1",
        ],
        env=_env(), capture_output=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert (tmp_path / "results.sage.tsv").exists()
    assert (tmp_path / "matched_fragments.sage.tsv").exists()
    pin = (tmp_path / "results.sage.pin").read_text().splitlines()
    assert len(pin[0].split("\t")) == 39
