"""Subprocess worker for the multi-host e2e test: runs the full Runner
as one process of a jax.distributed CPU cluster (gloo collectives).
Usage: python _multihost_worker.py <config.json> <outdir>
Environment: SAGE_TPU_COORDINATOR / SAGE_TPU_NUM_PROCS / SAGE_TPU_PROC_ID
set by the driver test (empty for a plain single-process run)."""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sage_tpu.pipeline.input import build_search  # noqa: E402
from sage_tpu.pipeline.runner import Runner  # noqa: E402


def main():
    config_path, outdir = sys.argv[1], sys.argv[2]
    with open(config_path) as f:
        cfg = json.load(f)
    search = build_search(cfg, output_directory=outdir)
    result = Runner(search).run()
    print(f"worker done: {len(result['features'])} PSMs", flush=True)


if __name__ == "__main__":
    main()
