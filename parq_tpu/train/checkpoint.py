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
                    share_weights: bool = True, strict: bool = False):
    """Load weights into a TrainState.

    strict=False (default): warm-start semantics (ref: train.py:59-66) —
    keys present in the checkpoint override, missing keys keep their init,
    extra checkpoint keys are ignored.

    strict=True: eval semantics (ref: eval.py:28-31 load_state_dict
    strict=True) — every model key must be present in the checkpoint and
    vice versa, so a typo'd layer name fails loudly instead of silently
    evaluating random init.
    """
    if path.endswith((".ckpt", ".pt", ".pth")):
        from ..io.torch_convert import (convert_parq_checkpoint,
                                        convert_torchvision_resnet,
                                        is_torchvision_resnet_sd,
                                        load_torch_state_dict)
        sd = load_torch_state_dict(path)
        if any(k.startswith("backbone2d.") for k in sd):
            tree = convert_parq_checkpoint(sd, num_heads=num_heads,
                                           share_weights=share_weights)
        elif is_torchvision_resnet_sd(sd):
            # bare ImageNet resnet50 → backbone warm start (the reference's
            # actual training recipe, ref: model/resnet_fpn.py:39-41)
            if strict:
                raise ValueError(
                    "a torchvision ImageNet state_dict only covers the "
                    "backbone body; it cannot satisfy a strict load")
            tree = convert_torchvision_resnet(sd)
        else:
            raise ValueError(
                f"unrecognized torch checkpoint layout in {path}: keys "
                f"like {sorted(sd)[:3]}")
        src_params, src_frozen = tree.get("params", {}), tree.get("frozen", {})
    else:
        ckpt = ocp.StandardCheckpointer()
        restored = ckpt.restore(os.path.abspath(path))
        src_params = restored.get("params", restored)
        src_frozen = restored.get("frozen", {})
    if strict:
        probs = (_strict_diff(state.params, src_params, "params")
                 + _strict_diff(state.frozen, src_frozen, "frozen"))
        if probs:
            raise ValueError(
                f"strict checkpoint load of {path} failed "
                f"({len(probs)} problems):\n  " + "\n  ".join(probs[:50]))
    params = _merge(state.params, src_params)
    frozen = _merge(state.frozen, src_frozen)
    return state.replace(params=params, frozen=frozen)


def _flat_keys(tree, prefix=""):
    if not isinstance(tree, dict):
        return {prefix}
    out = set()
    for k, v in tree.items():
        out |= _flat_keys(v, f"{prefix}/{k}" if prefix else str(k))
    return out


def _strict_diff(dst, src, label: str):
    """Missing/unexpected key report for a strict load (empty = OK)."""
    want, have = _flat_keys(dst), _flat_keys(src or {})
    return ([f"missing in checkpoint: {label}/{k}" for k in sorted(want - have)]
            + [f"unexpected in checkpoint: {label}/{k}"
               for k in sorted(have - want)])


def _merge(dst, src):
    """Recursively overlay src onto dst (strict=False load)."""
    import jax.numpy as jnp
    if not isinstance(dst, dict):
        return jnp.asarray(src) if src is not None else dst
    out = dict(dst)
    for k, v in (src or {}).items():
        if k in out:
            out[k] = _merge(out[k], v)
    return out
