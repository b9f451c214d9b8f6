"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(ref: train.py:103-110, SURVEY §2.2/§2.3). The TPU-native equivalent is a
(data, model) `jax.sharding.Mesh`: batches sharded on `data`, params either
replicated or sharded on `model` (tensor-parallel FFN/heads for scale-out),
with XLA inserting the ICI collectives (psum for grads) under jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. data=-1 → use all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    dev = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh, batch-axis sharded over data.

    Multi-process runs: each host holds only its per-host slice (the
    SnippetLoader shard), assembled into the global array via
    `make_array_from_process_local_data` — the jax-native equivalent of
    DDP's per-rank batches."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def param_sharding_rules(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """Sharding tree for params: model-axis tensor parallelism for the big
    decoder FFN / attention projection matrices when the model axis > 1;
    everything else replicated. Returns a pytree of NamedSharding matching
    `params`."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        if model_size == 1 or leaf.ndim < 2:
            return NamedSharding(mesh, P())
        names = "/".join(str(getattr(k, "key", k)) for k in path)
        # TP: shard FFN hidden and attention heads over the model axis
        if "linear1/kernel" in names:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if "linear2/kernel" in names:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        if any(f"{a}/{n}/kernel" in names
               for a in ("self_attn", "cross_attn")
               for n in ("query", "key", "value")):
            return NamedSharding(mesh, P(None, MODEL_AXIS, None))
        if any(f"{a}/out/kernel" in names
               for a in ("self_attn", "cross_attn")):
            return NamedSharding(mesh, P(MODEL_AXIS, None, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
