"""Device-time profiling on high-latency links (the axon tunnel).

The usual tools are unusable here: ``block_until_ready`` returns early on
this backend, a single ``device_get`` costs a full ~30-50 ms round trip,
and the JAX profiler needs a local runtime. What DOES measure truthfully:

* queue N identical executions, reduce one scalar from every output with
  a tiny jitted combiner ON DEVICE, and fetch that one scalar — the wall
  time minus one round trip, divided by N, is the amortized device
  execution time (the combiner forces every queued program to finish);
* the round trip itself is measured the same way with a trivial program.

This is the measurement behind every device_s / mfu number bench.py
reports (the reference's own honest metric is logged spectra/s,
runner.rs:315-330 — this splits it into device/transfer/host terms).
"""

from __future__ import annotations

import time
from typing import Callable, List, Sequence

import numpy as np


def _combiner():
    import jax
    import jax.numpy as jnp

    def comb(xs):
        tot = jnp.float32(0)
        for x in xs:
            tot = tot + x.reshape(-1)[0].astype(jnp.float32)
        return tot

    return jax.jit(comb)


def measure_rtt(reps: int = 6) -> float:
    """Median wall time of a trivial dispatch + 4-byte fetch: the fixed
    per-round-trip cost of talking to the device."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    one = jnp.ones(8, jnp.float32)
    jax.device_get(f(one)[0])  # compile
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        jax.device_get(f(one)[0])
        ts.append(time.perf_counter() - t)
    return float(np.median(ts))


def amortized_exec_s(
    dispatch: Callable[[], Sequence], reps: int = 6, rtt: float | None = None
) -> float:
    """Amortized device execution time of ``dispatch()`` (which must
    return a sequence of device arrays). Queues ``reps`` executions and
    forces them with ONE combined scalar fetch."""
    import jax

    comb = _combiner()
    if rtt is None:
        rtt = measure_rtt()
    jax.device_get(comb(list(dispatch())))  # warm (compiles the combiner)
    t = time.perf_counter()
    outs: List = []
    for _ in range(reps):
        outs.extend(dispatch())
    jax.device_get(comb(outs))
    return max((time.perf_counter() - t - rtt) / reps, 0.0)


def transfer_s(out, rtt: float | None = None) -> float:
    """Wall time to fetch a finished device array, minus the round trip
    — the pure device->host transfer term."""
    import jax

    if rtt is None:
        rtt = measure_rtt()
    comb = _combiner()
    jax.device_get(comb([out]))  # ensure finished
    t = time.perf_counter()
    jax.device_get(out)
    return max(time.perf_counter() - t - rtt, 0.0)


def chained_exec_s(
    step: Callable, k1: int = 2, k2: int = 8, reps: int = 3,
    rtt: float | None = None,
) -> float:
    """TRUE device execution time of one program run, measured as the
    SLOPE over chain length: ``step(c)`` must dispatch the program with
    the i32[1] chain scalar ``c`` folded into one input (a 0-weighted
    add, so the executable is unchanged) and return the next i32[1]
    chain scalar derived from the program's output. The data dependency
    serializes the k executions on device; one 4-byte fetch ends the
    chain, so (t(k2) - t(k1)) / (k2 - k1) contains no dispatch latency,
    no transfer, and no tunnel round trip — unlike a blocking per-phase
    fetch, which inflates "device time" by ~2-3 RTTs on tunneled links
    (measured: a stage-1 that blocking-fetch timing reports as ~130 ms
    is ~12 ms by slope)."""
    import jax
    import jax.numpy as jnp

    def run(k):
        c = jnp.zeros(1, jnp.int32)
        t = time.perf_counter()
        for _ in range(k):
            c = step(c)
        jax.device_get(c[0])
        return time.perf_counter() - t

    run(k1)  # warm
    best = None
    for _ in range(reps):
        t1 = run(k1)
        t2 = run(k2)
        dt = (t2 - t1) / (k2 - k1)
        if best is None or dt < best:
            best = dt
    return max(best, 0.0)


def upload_s(nbytes: int, reps: int = 4, rtt: float | None = None) -> float:
    """Amortized host->device upload time for ``nbytes`` of FRESH content
    (content-identical re-uploads can be deduped by the link; each rep
    perturbs the buffer so the measurement reflects a real stream)."""
    import jax
    import jax.numpy as jnp

    if rtt is None:
        rtt = measure_rtt()
    n = max(nbytes // 4, 1)
    base = np.random.default_rng(0).random(n, np.float32)
    comb = _combiner()
    jax.device_get(comb([jnp.asarray(base)]))
    t = time.perf_counter()
    outs = []
    for i in range(reps):
        base[i] += np.float32(1.0)  # new content each rep
        outs.append(jnp.asarray(base))
    jax.device_get(comb(outs))
    return max((time.perf_counter() - t - rtt) / reps, 0.0)
