"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware.

The axon TPU plugin (when present) overrides JAX_PLATFORMS through
``jax.config`` at registration time, so env vars alone don't stick — the
config must be updated after importing jax, before any backend init.
Set SAGE_TPU_TEST_PLATFORM=axon to run the suite on the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_platform = os.environ.get("SAGE_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

# The Runner auto-selects the multi-chip ShardedScorer when it sees >1
# device; default the suite to the single-device path (the 8 virtual CPU
# devices above would otherwise flip EVERY pipeline test to the mesh).
# Multi-chip pipeline tests override this per-test.
os.environ.setdefault("SAGE_TPU_MESH", "1,1")
