"""PARQ set prediction loss — fully masked, on-device, jit-safe.

Re-derivation of ref model/parq_decoder.py:165-370 with static shapes:
- targets come as padded Obb3D (B, K, 19) + validity masks instead of the
  reference's per-sample Python lists (remove_padding);
- matching runs on device (parq_tpu.ops.hungarian) per iteration — the
  reference does a scipy D2H round-trip per (iteration, sample)
  (utils/matcher.py:81);
- the symmetry-resolved rotation loss is a static (4, 36) angle-table min
  instead of the Python loop over k (parq_decoder.py:205-262).

Loss weights and normalization semantics match the reference exactly:
per-(iteration, sample) component losses are summed and divided by the
number of (iteration, sample) pairs that had any match.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import Obb3D, Pose, rot_to_6d, rotation_matrix_from_ortho6d, roty
from ..ops.hungarian import match_batch

# (4, 36) symmetry angle table: row s = angles to try for sym class s
# (ref sym_mapping: 0 none, 1 two-fold, 2 four-fold, 3 inf≈36)
_SYM_COUNT = np.array([1, 2, 4, 36])
_ANGLES = np.zeros((4, 36), np.float32)
_VALID = np.zeros((4, 36), bool)
for s, m in enumerate(_SYM_COUNT):
    for k in range(m):
        _ANGLES[s, k] = k * 2.0 * math.pi / m
        _VALID[s, k] = True


class Targets(NamedTuple):
    """Static-shape target tensors (the masked mirror of parse_target,
    ref: parq_decoder.py:165-203)."""
    labels: jnp.ndarray        # (B, K) int32, -1 pad
    center: jnp.ndarray        # (B, K, 3) in local frame
    size: jnp.ndarray          # (B, K, 3)
    rot: jnp.ndarray           # (B, K, 3, 3) local-frame rotation
    valid: jnp.ndarray         # (B, K) bool
    sym: jnp.ndarray           # (B, K) int32, 0 where unknown
    corners_world: jnp.ndarray # (B, K, 8, 3) for eval


def parse_targets(obbs_padded: Obb3D, T_world_local: Pose,
                  sym: jnp.ndarray = None) -> Targets:
    """obbs_padded: Obb3D (B, K); T_world_local: Pose (B, 1) or (B,);
    sym: (B, S) padded symmetry ids aligned with box order."""
    if T_world_local.data.ndim == 3:
        T_world_local = Pose(T_world_local.data[:, 0, :])
    valid = obbs_padded.valid_mask()                    # (B, K)
    B, K = valid.shape

    T_local_world = T_world_local.inverse()             # (B,)
    Two = obbs_padded.T_world_object                    # (B, K)
    T_local_object = Pose(T_local_world.data[:, None, :]) @ Two

    center = T_local_object.transform(
        obbs_padded.bb3_center_object[..., None, :])[..., 0, :]
    corners_world = Two.transform(obbs_padded.corners_object)

    labels = jnp.where(valid, obbs_padded.sem_id[..., 0].astype(jnp.int32), -1)
    if sym is None:
        sym_k = jnp.zeros((B, K), jnp.int32)
    else:
        S = sym.shape[1]
        if S >= K:
            sym_k = sym[:, :K].astype(jnp.int32)
        else:
            sym_k = jnp.pad(sym.astype(jnp.int32), ((0, 0), (0, K - S)),
                            constant_values=0)
        sym_k = jnp.clip(sym_k, 0, 3)

    return Targets(labels=labels, center=center, size=obbs_padded.bb3_size,
                   rot=T_local_object.R, valid=valid, sym=sym_k,
                   corners_world=corners_world)


def _rotation_loss_sym(R_pred: jnp.ndarray, R_tgt: jnp.ndarray,
                       sym: jnp.ndarray) -> jnp.ndarray:
    """Per-pair symmetry-resolved rotation MSE (ref: parq_decoder.py:205-262).

    R_pred, R_tgt: (N, 3, 3); sym: (N,) in {0..3}. Returns (N,).

    Uses the trace identity
        mean((R_pred − R_tgt·Rk)²) =
            (‖R_pred‖² + ‖R_tgt·Rk‖² − 2·⟨Rk, R_tgtᵀR_pred⟩) / 9
    with ‖R_tgt·Rk‖ = ‖R_tgt‖ (Rk orthogonal), so the whole angle sweep is
    ONE (N, 9) × (9, 144) matmul instead of materializing the
    (N, 4, 36, 3, 3) candidate tensor (~85MB of HBM traffic at release
    shapes L=8, B=8, Q=256). Precision.HIGHEST keeps the contraction f32
    on TPU (v5e matmuls default to bf16 — loss math must not degrade).
    """
    valid = jnp.asarray(_VALID)                       # (4, 36)
    Rk = roty(jnp.asarray(_ANGLES)).reshape(4 * 36, 9)
    N = R_pred.shape[0]
    hi = jax.lax.Precision.HIGHEST
    sq = (jnp.sum(R_pred ** 2, axis=(-2, -1))
          + jnp.sum(R_tgt ** 2, axis=(-2, -1)))       # (N,)
    M = jnp.einsum("nji,njk->nik", R_tgt, R_pred,
                   precision=hi).reshape(N, 9)        # R_tgtᵀ R_pred
    tr = jnp.matmul(M, Rk.T, precision=hi)            # (N, 144)
    # clamp: the expanded form can round to tiny negatives at perfect fits
    per = jnp.maximum(sq[:, None] - 2.0 * tr, 0.0) / 9.0
    per = jnp.where(valid.reshape(-1)[None], per, jnp.inf).reshape(N, 4, 36)
    per_sym = jnp.min(per, axis=-1)                   # (N, 4) all-finite
    return jnp.sum(per_sym * jax.nn.one_hot(sym, 4, dtype=per_sym.dtype),
                   axis=1)


def set_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Targets,
    key: jax.Array,
    loss_weight: Tuple[float, float, float, float] = (5.0, 5.0, 5.0, 1.0),
    num_semcls: int = 9,
    bg_cls_weight: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """outputs: per-iteration stacks (L, B, Q, ...) from PARQDecoder.

    Returns dict with total_loss and components (ref: parq_decoder.py:264-370).
    """
    L, B, Q = outputs["pred_logits"].shape[:3]
    K = targets.labels.shape[1]

    class_weight = jnp.ones((num_semcls + 1,)).at[num_semcls].set(bg_cls_weight)

    # Matching + losses for ALL (iteration, sample) pairs in ONE vmapped
    # call: the LAP's sequential while-loops then run in lockstep across the
    # L·B lanes instead of as L sequential chains (large win — the matcher
    # dominates the train step otherwise).
    LB = L * B
    flat = {k: outputs[k].reshape((LB,) + outputs[k].shape[2:])
            for k in ("pred_logits", "coord_pos", "center_unnormalized",
                      "size_unnormalized", "ortho6d")}
    tile = lambda t: jnp.tile(t, (L,) + (1,) * (t.ndim - 1))
    targets = Targets(*(tile(f) for f in targets))

    def all_pairs(out_l, res):
        assign = res.assign                       # (LB, Q)
        matched = assign >= 0
        a = jnp.clip(assign, 0, K - 1)

        mcount = jnp.sum(matched, axis=1)         # (B,)
        denom = jnp.maximum(mcount, 1).astype(jnp.float32)

        def masked_pair_mean(err):                # err: (B, Q)
            return jnp.sum(err * matched, axis=1) / denom

        # ONE row-wise gather of ALL matched-target fields: an expanded
        # (LB, Q, width) index makes XLA gather element-by-element (~3ms);
        # a broadcast (LB, Q, 1) index over a concatenated (LB, K, 17)
        # table is a 17-lane row slice per pair. labels/sym ride along as
        # f32 lanes (small ints — exact) instead of two more gathers.
        nb = out_l["ortho6d"].shape[0]
        tgt_cat = jnp.concatenate(
            [targets.center, targets.size,
             targets.rot.reshape(nb, K, 9),
             targets.labels.astype(jnp.float32)[..., None],
             targets.sym.astype(jnp.float32)[..., None]], axis=-1)
        g = jnp.take_along_axis(tgt_cat, a[..., None], axis=1)
        tgt_center, tgt_size = g[..., 0:3], g[..., 3:6]
        R_tgt = g[..., 6:15].reshape(nb, Q, 3, 3)
        lab_q = g[..., 15].astype(jnp.int32)               # (LB, Q)
        sym_q = g[..., 16].astype(jnp.int32)

        # center / size L1 (mean over pairs AND coords == mean/3 per pair)
        c_err = jnp.mean(jnp.abs(out_l["center_unnormalized"]
                                 - tgt_center), axis=-1)
        s_err = jnp.mean(jnp.abs(out_l["size_unnormalized"]
                                 - tgt_size), axis=-1)
        center_loss = masked_pair_mean(c_err)
        size_loss = masked_pair_mean(s_err)

        # rotation with symmetry
        R_pred = rotation_matrix_from_ortho6d(
            out_l["ortho6d"].reshape(nb * Q, 6)).reshape(nb, Q, 3, 3)
        r_err = _rotation_loss_sym(
            R_pred.reshape(nb * Q, 3, 3), R_tgt.reshape(nb * Q, 3, 3),
            sym_q.reshape(nb * Q)).reshape(nb, Q)
        r_err = jnp.where(matched, r_err, 0.0)
        rot_loss = jnp.sum(r_err, axis=1) / denom

        # classification CE with background default + punish mask.
        # one-hot contractions instead of class-axis gathers: at ~10
        # classes the multiply-reduce vectorizes on the VPU, where a
        # lane-axis gather lowers element-wise on TPU.
        tgt_cls = jnp.where(matched, lab_q, num_semcls)
        oh = jax.nn.one_hot(tgt_cls, num_semcls + 1, dtype=jnp.float32)
        logp = jax.nn.log_softmax(out_l["pred_logits"], axis=-1)
        ce = -jnp.sum(logp * oh, axis=-1)
        ce = ce * jnp.sum(oh * class_weight, axis=-1)
        punish = res.punish_mask.astype(jnp.float32)
        cat_loss = (jnp.sum(ce * punish, axis=1)
                    / jnp.maximum(jnp.sum(punish, axis=1), 1.0))

        has_match = mcount > 0                    # (LB,)
        w = loss_weight
        comp = {
            "center_loss": jnp.where(has_match, center_loss * w[0], 0.0),
            "size_loss": jnp.where(has_match, size_loss * w[1], 0.0),
            "rot_loss": jnp.where(has_match, rot_loss * w[2], 0.0),
            "cat_loss": jnp.where(has_match, cat_loss * w[3], 0.0),
        }
        return comp, has_match

    res = match_batch(flat["pred_logits"], flat["coord_pos"],
                      targets.labels, targets.center, targets.valid, key)
    comp, has_match = all_pairs(flat, res)
    valid_bs = jnp.sum(has_match.astype(jnp.float32))
    norm = jnp.maximum(valid_bs, 1.0)
    loss_dict = {k: jnp.sum(v) / norm for k, v in comp.items()}
    loss_dict["total_loss"] = sum(loss_dict.values())
    loss_dict["valid_bs"] = valid_bs
    return loss_dict
