"""Multi-host execution: per-host data-parallel file streaming with a
cross-host result merge before the global rescoring/FDR stages.

The reference is strictly single-process; its analog of this layer is the
rayon parallel reduce of per-batch `SageResults`
(/root/reference/crates/sage-cli/src/output.rs:21-41 driven by the batch
loop runner.rs:482-489). The TPU-native design (SURVEY.md §2.4, §5.8):

* `jax.distributed.initialize` forms the process group (TPU pods
  auto-detect; explicit coordinator/rank env vars otherwise).
* Each host streams its own shard of the input files (round-robin by
  file index, keeping global file_ids) through its *local* devices.
* Before RT alignment / LDA / FDR — which are global, deterministic
  host-side stages — every host gathers all hosts' FeatureTables, TMT
  quant records, and MS1 spectra with a device all-gather (ICI/DCN via
  `multihost_utils.process_allgather`), re-assembles them in global file
  order, and runs the identical global stages replicated. Only process 0
  writes outputs.

The merged result is byte-identical to a single-process run: pieces are
re-ordered by file_id before concatenation and PSM ids are re-assigned
deterministically by row order (the reference's `PSM_COUNTER` is a racy
global atomic, scoring.rs:163-166 — here determinism is kept instead).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("sage_tpu")


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialize `jax.distributed` when the environment calls for it and
    return (process_id, process_count).

    Triggers: SAGE_TPU_COORDINATOR (explicit "host:port", with
    SAGE_TPU_NUM_PROCS / SAGE_TPU_PROC_ID), or SAGE_TPU_DISTRIBUTED=1
    (auto-detection — TPU pod metadata, SLURM, etc.). No-ops (returning
    the current state) if already initialized or not requested."""
    import jax

    coord = os.environ.get("SAGE_TPU_COORDINATOR")
    auto = os.environ.get("SAGE_TPU_DISTRIBUTED") == "1"
    if not coord and not auto:
        # plain single-process path — don't force backend init here
        try:
            from jax._src import distributed as _dist

            if _dist.global_state.client is None:
                return 0, 1
        except Exception:  # noqa: BLE001 — internal layout changed
            pass
        return jax.process_index(), jax.process_count()
    already = False
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except Exception:  # noqa: BLE001
        pass
    if not already:
        kwargs = {}
        if coord:
            kwargs = dict(
                coordinator_address=coord,
                num_processes=int(os.environ["SAGE_TPU_NUM_PROCS"]),
                process_id=int(os.environ["SAGE_TPU_PROC_ID"]),
            )
        jax.distributed.initialize(**kwargs)
    log.info(
        "distributed: process %d of %d (%d local / %d global devices)",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_index(), jax.process_count()


def shard_paths(
    paths: Sequence[str], process_id: int, process_count: int
) -> List[Tuple[int, str]]:
    """This host's shard of the input files, round-robin by index so all
    hosts get similar load; file_ids stay GLOBAL (they key spec_ids, RT
    alignment's per-file regressions, and the output filename column)."""
    return [
        (fid, p)
        for fid, p in enumerate(paths)
        if fid % process_count == process_id
    ]


def allgather_bytes(data: bytes) -> List[bytes]:
    """All-gather one opaque byte blob per process (padded uint8 device
    all-gather — rides ICI/DCN on pods, gloo on CPU test clusters).
    Returns the per-process blobs in process-id order on every host."""
    from jax.experimental import multihost_utils

    n = _process_count()
    if n == 1:
        return [data]
    lens = multihost_utils.process_allgather(
        np.asarray(len(data), np.int64)
    )  # [n]
    mx = max(int(lens.max()), 1)
    # Gather in bounded chunks: peak footprint is n_procs x CHUNK rather
    # than n_procs x max_blob (result blobs can reach hundreds of MB on
    # real multi-file runs, and process_allgather materializes a device
    # array on every host).
    chunk = int(os.environ.get("SAGE_TPU_ALLGATHER_CHUNK_MB", "64")) << 20
    chunk = max(chunk, 1 << 20)
    src = np.frombuffer(data, np.uint8)
    parts: List[List[np.ndarray]] = [[] for _ in range(n)]
    for off in range(0, mx, chunk):
        c = min(chunk, mx - off)
        buf = np.zeros(c, np.uint8)
        have = max(min(len(data) - off, c), 0)
        if have:
            buf[:have] = src[off : off + have]
        bufs = np.asarray(multihost_utils.process_allgather(buf))  # [n, c]
        for i in range(n):
            take = max(min(int(lens[i]) - off, c), 0)
            if take:
                # copy: a VIEW would pin the whole [n, chunk] buffer
                # until the final join, re-growing the footprint the
                # chunking exists to bound
                parts[i].append(bufs[i, :take].copy())
    return [
        b"".join(p.tobytes() for p in parts[i]) if parts[i] else b""
        for i in range(n)
    ]


def _process_count() -> int:
    import jax

    return jax.process_count()


def gather_file_results(
    pieces: List[Tuple[int, object, list, list]],
) -> List[Tuple[int, object, list, list]]:
    """All-gather the per-file search results — (file_id, FeatureTable,
    tmt_quant, ms1_spectra) tuples — across hosts, returning the union
    sorted by file_id on every host. The cross-host analog of the
    reference's SageResults reduce (output.rs:21-41)."""
    blob = pickle.dumps(pieces, protocol=pickle.HIGHEST_PROTOCOL)
    blobs = allgather_bytes(blob)
    merged: List[Tuple[int, object, list, list]] = []
    for b in blobs:
        merged.extend(pickle.loads(b))
    merged.sort(key=lambda t: t[0])
    return merged
