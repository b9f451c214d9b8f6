"""Multi-host (multi-process) scaffolding — the NUM_NODES story.

The reference trains DDP over GPUS × NUM_NODES processes
(ref: train.py:103-110, README.md:70-73), with Lightning inserting a
DistributedSampler per rank (`replace_sampler_ddp`, ref: train.py:115) and
rank-0 gating for checkpoint/TensorBoard writes. TPU-native equivalents:

- `jax.distributed.initialize()` once per host process; on TPU pods the
  coordinator/process topology is auto-detected from the environment.
- per-host strided sharding of the epoch order inside `SnippetLoader`
  (`host_shard_indices` reproduces DistributedSampler's pad-by-wraparound
  + stride semantics, so every host sees the same number of batches).
- `is_main_process()` gating for TensorBoard/vis writes (orbax saves are
  NOT gated — orbax checkpointing is itself a multihost-collective and
  every process must participate).
- per-host device_put of the host-local batch slice into the global mesh
  via `jax.make_array_from_process_local_data` (see mesh.shard_batch).

This box has a single host, so the end-to-end path cannot run here; the
shard math is unit-tested with faked process counts
(tests/test_train.py::test_host_shard_*).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def initialize_distributed(num_nodes: int,
                           coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed when NUM_NODES > 1. Returns True if the
    process is (now) part of a multi-process run. Idempotent."""
    import jax
    if num_nodes <= 1:
        return False
    if jax.process_count() > 1:
        return True
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def host_shard_indices(order: np.ndarray, process_index: int,
                       process_count: int) -> np.ndarray:
    """Per-host slice of a (shared, identically-seeded) epoch order.

    DistributedSampler semantics: pad by wraparound to a multiple of
    process_count so every host gets the same count, then stride — host i
    takes padded[i::process_count]."""
    if process_count <= 1:
        return order
    n = len(order)
    per = -(-n // process_count)
    total = per * process_count
    pad = total - n
    padded = np.concatenate([order, order[:pad]]) if pad else order
    return padded[process_index::process_count]
