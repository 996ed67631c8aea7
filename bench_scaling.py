"""Mesh-scaling measurement for the sharded search.

Runs ShardedScorer over (data, model) meshes of growing size and prints
spectra/s per shape. On this box only ONE physical TPU chip is reachable,
so by default the scaling sweep runs on N virtual CPU devices
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count) — absolute
numbers are meaningless there; the point is exercising the real
collectives (all_gather top-K merge, owner-computes psum) and recording
RELATIVE scaling + bitwise mesh-invariance. On a real multi-chip slice,
run with SAGE_TPU_SCALING_PLATFORM=tpu for true spectra/s.

Prints one JSON line per mesh shape.
"""

import json
import os
import sys
import time

if os.environ.get("SAGE_TPU_SCALING_PLATFORM", "cpu") == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

if os.environ.get("SAGE_TPU_SCALING_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from sage_tpu import bench_baseline as B  # noqa: E402
from sage_tpu.chem.fasta import Fasta  # noqa: E402
from sage_tpu.chem.mass import Tolerance  # noqa: E402
from sage_tpu.index.builder import DatabaseParams  # noqa: E402
from sage_tpu.ops.search import SearchParams  # noqa: E402
from sage_tpu.parallel.sharding import ShardedScorer, make_mesh  # noqa: E402


def main():
    params = DatabaseParams()
    fasta = Fasta.parse(B.synth_fasta(30, length=200), params.decoy_tag, True)
    db = params.build(fasta)
    spectra = B.synth_spectra(db, 64)
    sp = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
    )
    n_dev = len(jax.devices())
    shapes = [(1, 1), (2, 1), (2, 2), (4, 2), (8, 1)]
    ref = None
    for n_data, n_model in shapes:
        if n_data * n_model > n_dev:
            continue
        scorer = ShardedScorer(db, make_mesh(n_data, n_model), sp)
        t = scorer.score_table(spectra)  # warm/compile
        t0 = time.perf_counter()
        t = scorer.score_table(spectra)
        dt = time.perf_counter() - t0
        if ref is None:
            ref = t
        else:
            for k in ref.columns:
                if k != "psm_id":
                    np.testing.assert_array_equal(
                        t.columns[k], ref.columns[k], err_msg=k
                    )
        print(
            json.dumps(
                {
                    "metric": "sharded_search_throughput",
                    "mesh": f"{n_data}x{n_model}",
                    "devices": n_data * n_model,
                    "value": round(len(spectra) / dt, 2),
                    "unit": "spectra/s",
                    "platform": jax.default_backend(),
                    "bitwise_equal_to_1x1": True,
                }
            )
        )


if __name__ == "__main__":
    main()
