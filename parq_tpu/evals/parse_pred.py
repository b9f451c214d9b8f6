"""Prediction parsing: last-iteration outputs → filtered oriented boxes.

Mirrors ref model/parq_decoder.py:372-459 with a clean device/host split:
rotation decode, corner generation, and the track-scale validity filter run
on device in one fused call; the greedy NMS and the stateful F1 accumulation
run on host (the reference bounces through CPU tensors mid-way,
parq_decoder.py:398-403).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import Obb3D, Pose, rotation_matrix_from_ortho6d
from ..losses.set_loss import Targets
from .nms import run_nms


@partial(jax.jit, static_argnames=("track_scale", "for_vis"))
def parse_pred_device(last_out: Dict[str, jnp.ndarray],
                      T_world_local: jnp.ndarray,
                      track_scale: Tuple[float, ...],
                      for_vis: bool = False) -> Dict[str, jnp.ndarray]:
    """last_out: final-iteration outputs (B, K, ...). Returns device arrays:
    corners_local (B,K,8,3), corners_world, scores, labels, valid, plus the
    flat obb data (B,K,19) for downstream Obb3D use."""
    size = last_out["size_unnormalized"]
    center = last_out["center_unnormalized"]
    probs = last_out["sem_cls_prob"]
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1)
    B, K = scores.shape

    R = rotation_matrix_from_ortho6d(
        last_out["ortho6d"].reshape(B * K, 6)).reshape(B, K, 3, 3)
    T_local_object = Pose.from_Rt(R, center)

    half = size / 2.0
    c3o = jnp.stack([-half[..., 0], half[..., 0],
                     -half[..., 1], half[..., 1],
                     -half[..., 2], half[..., 2]], axis=-1)
    obbs = Obb3D.from_parts(c3o, T_local_object.data,
                            labels.astype(jnp.float32))
    corners_local = T_local_object.transform(obbs.corners_object)

    Twl = Pose(T_world_local)
    if Twl.data.ndim == 3:
        Twl = Pose(Twl.data[:, 0, :])
    corners_world = Pose(Twl.data[:, None, :]).transform(corners_local)

    if for_vis:
        valid = jnp.ones((B, K), bool)
    else:
        ts = track_scale  # (ref: parq_decoder.py:407-414 — x and z bounds)
        valid = ((center[..., 0] > ts[0]) & (center[..., 0] < ts[1])
                 & (center[..., 2] > ts[4]) & (center[..., 2] < ts[5]))

    return {
        "obb_data": obbs.data,
        "corners_local": corners_local,
        "corners_world": corners_world,
        "scores": scores,
        "labels": labels,
        "valid": valid,
        "sem_cls_prob": probs,
    }


def finish_parse_pred(dev: Dict[str, jnp.ndarray], num_semcls: int,
                      enable_nms: bool = True, for_vis: bool = False
                      ) -> Dict[str, np.ndarray]:
    """Host half of parse_pred: blocks on the device arrays, then runs the
    greedy NMS. Split out so the eval loop can dispatch the NEXT batch's
    device work before blocking here (validate() pipelining — the chip
    computes batch i+1 while this runs batch i's host post-processing).

    NMS runs in the local frame on the reference's thresholds: 0.1
    class-agnostic for eval, 0.2 same-class for vis (ref: :417-421).
    """
    host = {k: np.asarray(v) for k, v in dev.items()}
    if enable_nms:
        if for_vis:
            nms_mask = run_nms(host["corners_local"], host["labels"],
                               host["scores"], num_semcls, 0.2,
                               "nms_3d_faster_samecls")
        else:
            nms_mask = run_nms(host["corners_local"], host["labels"],
                               host["scores"], num_semcls, 0.1,
                               "nms_3d_faster")
        host["pred_mask"] = nms_mask & host["valid"]
    else:
        host["pred_mask"] = host["valid"]
    host["pred_corners_world"] = host["corners_world"]
    return host


def parse_pred(last_out: Dict[str, jnp.ndarray], T_world_local: jnp.ndarray,
               track_scale: Sequence[float], num_semcls: int,
               enable_nms: bool = True, for_vis: bool = False
               ) -> Dict[str, np.ndarray]:
    """Device parse + host NMS → numpy dict ready for F1Calculator.step."""
    dev = parse_pred_device(last_out, T_world_local, tuple(track_scale),
                            for_vis)
    return finish_parse_pred(dev, num_semcls, enable_nms=enable_nms,
                             for_vis=for_vis)


def targets_to_gt_list(targets: Targets) -> List[Dict[str, np.ndarray]]:
    """Masked Targets → per-sample host GT dicts for F1Calculator.step."""
    valid = np.asarray(targets.valid)
    labels = np.asarray(targets.labels)
    corners = np.asarray(targets.corners_world)
    out = []
    for b in range(valid.shape[0]):
        idx = np.where(valid[b])[0]
        out.append({
            "labels": labels[b, idx],
            "gt_corners_world": corners[b, idx],
        })
    return out
