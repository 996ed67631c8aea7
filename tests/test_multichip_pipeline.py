"""Multi-chip product wiring: the Runner auto-selects the mesh-sharded
scorer when >1 device is visible (pipeline/runner.py:_make_scorer), and
the CLI golden run must produce byte-identical TSV on a 1-device and an
8-virtual-device mesh (the sharded path's bitwise mesh-invariance,
parallel/sharding.py, carried all the way through the product surface).
"""

import os

import pytest

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
    "mzml_paths": ["/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"],
}


def _run(outdir, mesh_env, monkeypatch, mesh_shape=None, extra=None):
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    if mesh_env is None:
        monkeypatch.delenv("SAGE_TPU_MESH", raising=False)
    else:
        monkeypatch.setenv("SAGE_TPU_MESH", mesh_env)
    cfg = dict(CONFIG, **(extra or {}))
    search = build_search(
        cfg, output_directory=str(outdir), mesh_shape=mesh_shape
    )
    Runner(search).run()
    with open(os.path.join(str(outdir), "results.sage.tsv"), "rb") as f:
        return f.read()


@pytest.mark.parametrize("shape", ["8,1", "4,2"])
@pytest.mark.parametrize("mode", ["standard", "chimera", "annotate"])
def test_runner_mesh_matches_single_device(tmp_path, monkeypatch, shape,
                                           mode):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    extra = {}
    if mode == "chimera":
        extra = {"chimera": True, "report_psms": 2}
    elif mode == "annotate":
        extra = {"annotate_matches": True}
    single = _run(tmp_path / "single", "1,1", monkeypatch, extra=extra)
    meshed = _run(tmp_path / f"mesh{shape.replace(',', 'x')}", shape,
                  monkeypatch, extra=extra)
    # Full byte equality INCLUDING psm_id: the Runner renumbers PSMs in
    # deterministic global (file, batch, row) order after the merge
    # (runner.py), so the mesh shape cannot leak into any column.
    assert single == meshed
    if mode == "annotate":
        # the mesh run must actually produce fragment annotations,
        # byte-equal to the single-device ones
        def frags(d):
            with open(d / "matched_fragments.sage.tsv", "rb") as f:
                return f.read()

        fs = frags(tmp_path / "single")
        assert fs == frags(tmp_path / f"mesh{shape.replace(',', 'x')}")
        assert len(fs.splitlines()) > 1


def test_runner_uses_sharded_scorer_on_multidevice(monkeypatch, tmp_path):
    """_make_scorer returns a ShardedScorer when the mesh is >1 device
    — including for chimera runs (no single-device fallback)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    from sage_tpu.ops.search import Scorer
    from sage_tpu.parallel.sharding import ShardedScorer
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    monkeypatch.setenv("SAGE_TPU_MESH", "2,1")
    cfg = dict(CONFIG)
    search = build_search(cfg, output_directory=str(tmp_path))
    r = Runner(search)
    assert isinstance(r._make_scorer(), ShardedScorer)

    search.chimera = True
    assert isinstance(r._make_scorer(), ShardedScorer)
    search.chimera = False

    # config mesh_shape flows through when the env var is unset
    monkeypatch.delenv("SAGE_TPU_MESH", raising=False)
    search.mesh_shape = (1, 1)
    assert isinstance(r._make_scorer(), Scorer)
    search.mesh_shape = (2, 2)
    s = r._make_scorer()
    assert isinstance(s, ShardedScorer)
    assert dict(s.mesh.shape) == {"data": 2, "model": 2}
