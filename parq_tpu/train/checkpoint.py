"""Checkpointing via orbax: async saves, top-k-by-F1 retention, full resume.

Covers the reference's three mechanisms (SURVEY §5 / train.py:74-121):
ModelCheckpoint top-k on val/metrics/0.5_f1 + save_last → orbax
CheckpointManager best_fn retention; resume_from_checkpoint → restore of
params/opt_state/step; PRETRAINED_PATH warm start → params-only restore
(plus the torch ckpt path through parq_tpu.io.torch_convert).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def make_manager(directory: str, save_top_k: int = 3, save_last: bool = True,
                 monitor: str = "0.5_f1", mode: str = "max",
                 async_save: bool = True) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=save_top_k + (1 if save_last else 0),
        best_fn=(lambda m: m.get(monitor, float("-inf"))) if save_top_k else None,
        best_mode=mode,
        keep_checkpoints_without_metrics=save_last,
        enable_async_checkpointing=async_save,
    )
    return ocp.CheckpointManager(directory, options=options)


def save_state(mgr: ocp.CheckpointManager, step: int, state,
               metrics: Optional[dict] = None, data_state: Optional[dict] = None):
    """Save params/frozen/opt_state/step (+ resumable data iterator state)."""
    payload = {
        "params": state.params,
        "frozen": state.frozen,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if data_state is not None:
        payload["data_state"] = data_state
    mgr.save(step, args=ocp.args.StandardSave(payload),
             metrics={k: float(v) for k, v in (metrics or {}).items()})


def restore_state(mgr: ocp.CheckpointManager, state, step: Optional[int] = None):
    """Restore into an existing TrainState template; returns (state, extras)."""
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return state, {}
    # restore without a template: the payload may carry extras (data_state)
    # a fixed template would reject
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    new_state = state.replace(
        params=restored["params"], frozen=restored["frozen"],
        opt_state=restored["opt_state"], step=restored["step"])
    extras = {k: v for k, v in restored.items()
              if k not in ("params", "frozen", "opt_state", "step")}
    return new_state, extras


def load_pretrained(state, path: str, num_heads: int = 4,
                    share_weights: bool = True):
    """Warm start weights only (ref: train.py:59-66, strict=False semantics):
    accepts either an orbax dir or a torch .ckpt via the converter. Keys
    present in the checkpoint override; missing keys keep their init."""
    if path.endswith((".ckpt", ".pt", ".pth")):
        from ..io.torch_convert import load_parq_checkpoint
        tree = load_parq_checkpoint(path, num_heads=num_heads,
                                    share_weights=share_weights)
        params = _merge(state.params, tree.get("params", {}))
        frozen = _merge(state.frozen, tree.get("frozen", {}))
        return state.replace(params=params, frozen=frozen)
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    params = _merge(state.params, restored.get("params", restored))
    frozen = _merge(state.frozen, restored.get("frozen", state.frozen))
    return state.replace(params=params, frozen=frozen)


def _merge(dst, src):
    """Recursively overlay src onto dst (strict=False load)."""
    import numpy as np
    import jax.numpy as jnp
    if not isinstance(dst, dict):
        return jnp.asarray(src) if src is not None else dst
    out = dict(dst)
    for k, v in (src or {}).items():
        if k in out:
            out[k] = _merge(out[k], v)
    return out
