"""Persistent XLA compilation cache (shared by the Runner and by direct
Scorer users): first-use compiles — seconds per executable on tunneled
TPU links, ~10s for the fused search program — amortize across
processes and runs. Opt out with SAGE_TPU_COMPILE_CACHE=0; relocate
with SAGE_TPU_COMPILE_CACHE_DIR."""

from __future__ import annotations

import logging
import os

_done = False


def enable_compile_cache() -> None:
    global _done
    if _done or os.environ.get("SAGE_TPU_COMPILE_CACHE", "1") == "0":
        return
    _done = True
    try:
        import jax

        path = os.environ.get(
            "SAGE_TPU_COMPILE_CACHE_DIR",
            os.path.expanduser("~/.cache/sage_tpu/xla"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        logging.getLogger("sage_tpu").debug("compile cache unavailable: %s", e)
