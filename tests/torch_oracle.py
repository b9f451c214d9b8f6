"""Dimension-parametric torch oracle for full-model parity tests.

Reference-semantics re-implementation (standard torch layers) of the PARQ
forward: ResNet50-FPN backbone (tests/test_parity_backbone.py) → rayPE →
recurrent decoder with MultiheadAttention + MLP heads
(ref: model/parq_lightning.py:68-95, model/transformer_parq.py:211-337).

Used at toy dims by tests/test_parity_full_model.py and at FULL release
dims (L=8, Q=256, 320x240) by tests/test_release_rehearsal.py.
"""
import math
from typing import NamedTuple, Tuple

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F


class Dims(NamedTuple):
    D: int
    HEADS: int
    FFN: int
    L: int              # decoder iterations
    Q: int              # queries
    NCLS: int
    NSAMP: int
    SCALE: Tuple[float, ...]
    MEAN_SIZE: Tuple[Tuple[float, ...], ...]
    B: int
    T: int
    H0: int             # input image height
    W0: int

    @property
    def H(self):
        return self.H0 // 4

    @property
    def W(self):
        return self.W0 // 4


def t_pos2posemb3d(pos, num=128, temperature=10000):
    pos = pos * (2 * math.pi)
    dim_t = torch.arange(num, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num)
    outs = []
    for i in (1, 0, 2):
        p = pos[..., i, None] / dim_t
        p = torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()),
                        dim=-1).flatten(-2)
        outs.append(p)
    return torch.cat(outs, dim=-1)


def t_inv_sigmoid(x, eps=1e-3):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def t_normalize(p, s):
    return torch.stack([(p[..., 0] - s[0]) / (s[1] - s[0]),
                        (p[..., 1] - s[2]) / (s[3] - s[2]),
                        (p[..., 2] - s[4]) / (s[5] - s[4])], -1)


def t_denormalize(p, s):
    return torch.stack([p[..., 0] * (s[1] - s[0]) + s[0],
                        p[..., 1] * (s[3] - s[2]) + s[2],
                        p[..., 2] * (s[5] - s[4]) + s[4]], -1)


class TorchDecoder(tnn.Module):
    """Reference-semantics recurrent decoder (one shared layer, L
    iterations — ref: model/transformer_parq.py:211-337)."""

    def __init__(self, dims: Dims):
        super().__init__()
        self.dims = dims
        D, HEADS, FFN, Q, NCLS = (dims.D, dims.HEADS, dims.FFN, dims.Q,
                                  dims.NCLS)
        self.pos_enc = tnn.Sequential(tnn.Linear(384, D), tnn.ReLU(),
                                      tnn.Linear(D, D))
        self.self_attn = tnn.MultiheadAttention(D, HEADS, batch_first=True)
        self.cross_attn = tnn.MultiheadAttention(D, HEADS, batch_first=True)
        self.linear1 = tnn.Linear(D, FFN)
        self.linear2 = tnn.Linear(FFN, D)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)
        self.norm3 = tnn.LayerNorm(D)
        self.sem_cls_head = tnn.Conv1d(D, NCLS + 1, 1)
        self.size_head = tnn.Conv1d(D, 3, 1)

        def big_head(out):
            return tnn.Sequential(
                tnn.Conv1d(D, D, 1, bias=False), tnn.GroupNorm(1, D),
                tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Conv1d(D, D, 1, bias=False), tnn.GroupNorm(1, D),
                tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Conv1d(D, out, 1))

        self.center_head = big_head(3)
        self.rotation_head = big_head(6)
        self.refpoint = tnn.Embedding(Q, 3)
        self.register_buffer("mean_size", torch.tensor(dims.MEAN_SIZE))

    def project(self, memory_hw, query_pos, R_cl, t_cl, cam):
        d = self.dims
        w, h, fx, fy, cx, cy = cam
        qc = torch.einsum("btij,bqj->btqi", R_cl, query_pos) + \
            t_cl[:, :, None, :]
        z = qc[..., 2].clamp(min=1e-3)
        u = qc[..., 0] / z * fx + cx
        v = qc[..., 1] / z * fy + cy
        valid = ((qc[..., 2] > 1e-3) & (u >= 0) & (u <= w - 1)
                 & (v >= 0) & (v <= h - 1))
        grid = torch.stack([2 * u / (w - 1) - 1, 2 * v / (h - 1) - 1], -1)
        feats = F.grid_sample(memory_hw, grid.view(d.B * d.T, 1, d.Q, 2),
                              padding_mode="zeros", align_corners=True)
        feats = feats.view(d.B, d.T, d.D, d.Q).permute(0, 1, 3, 2)
        count = valid.float().sum(1).clamp(min=1.0)
        return feats.sum(1) / count[..., None], valid

    def forward(self, memory, R_cl, t_cl, cam):
        d = self.dims
        s = d.SCALE
        memory_hw = memory.permute(0, 1, 4, 2, 3).reshape(
            d.B * d.T, d.D, d.H, d.W)
        memory_tokens = memory.reshape(d.B, d.T * d.H * d.W, d.D)
        ref = torch.sigmoid(self.refpoint.weight)[None].expand(d.B, d.Q, 3)
        outs = []
        for _ in range(d.L):
            pos_feat = self.pos_enc(t_pos2posemb3d(ref))
            pix, _ = self.project(memory_hw, t_denormalize(ref, s), R_cl,
                                  t_cl, cam)
            q = k = pix + pos_feat
            tgt2, _ = self.self_attn(q, k, pix)
            tgt = self.norm1(pix + tgt2)
            tgt2, _ = self.cross_attn(tgt + pos_feat, memory_tokens,
                                      memory_tokens)
            tgt = self.norm2(tgt + tgt2)
            tgt2 = self.linear2(F.relu(self.linear1(tgt)))
            tgt = self.norm3(tgt + tgt2)

            tk = tgt.permute(0, 2, 1)
            cls_logits = self.sem_cls_head(tk).transpose(1, 2)
            center_offset = self.center_head(tk).transpose(1, 2)
            size_scale = self.size_head(tk).transpose(1, 2)
            ortho6d = self.rotation_head(tk).transpose(1, 2)

            center = torch.sigmoid(center_offset + t_inv_sigmoid(ref))
            center_unnorm = t_denormalize(center, s)
            with torch.no_grad():
                prob = torch.softmax(cls_logits, -1)
            size_unnorm = torch.exp(size_scale) * \
                self.mean_size[prob.argmax(-1)]
            outs.append({
                "pred_logits": cls_logits,
                "center_unnormalized": center_unnorm,
                "size_unnormalized": size_unnorm,
                "ortho6d": ortho6d,
                "coord_pos": t_denormalize(ref, s),
            })
            ref = t_normalize(center_unnorm, s).detach()
        return outs


def ray_pe_oracle(enc, cam_feat, T_camera_local, dims: Dims,
                  min_depth=0.25, max_depth=5.25):
    """numpy/torch rayPE mirror (ref: utils/encoding_utils.py:23-101).

    T_camera_local: (B, T, 12) camera-from-local rigid transforms; ray
    points are generated in the camera frame and carried to the local
    frame with the INVERSE transform.
    """
    d = dims
    H, W, NSAMP = d.H, d.W, d.NSAMP
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    pix = np.stack([xx, yy], -1).reshape(-1, 2)
    depths = np.exp(np.log(min_depth) + np.log(max_depth / min_depth)
                    * np.linspace(0, 1, NSAMP)).astype(np.float32)
    pts = np.zeros((d.B, d.T, H, W, NSAMP, 3), np.float32)
    for b in range(d.B):
        for t in range(d.T):
            w_, h_, fx, fy, cx, cy = cam_feat[b, t]
            rays = np.concatenate(
                [(pix - [cx, cy]) / [fx, fy], np.ones((H * W, 1))],
                -1).astype(np.float32)
            p = rays[:, None, :] * depths[None, :, None]
            R = T_camera_local[b, t, :9].reshape(3, 3)
            tv = T_camera_local[b, t, 9:]
            p = (p.reshape(-1, 3) - tv) @ R  # R^T(x - t) = inverse pose
            pts[b, t] = p.reshape(H, W, NSAMP, 3)
    s = d.SCALE
    norm = np.stack([
        (pts[..., 0] - s[0]) / (s[1] - s[0]),
        (pts[..., 1] - s[2]) / (s[3] - s[2]),
        (pts[..., 2] - s[4]) / (s[5] - s[4])], -1)
    clipped = np.clip(norm, 0, 1)
    logit = np.log(np.maximum(clipped, 1e-3)
                   / np.maximum(1 - clipped, 1e-3)).astype(np.float32)
    with torch.no_grad():
        return enc(torch.from_numpy(
            logit.reshape(d.B, d.T, H, W, NSAMP * 3)))


def compose_camera_local(T_camera_pseudoCam, T_world_pseudoCam,
                         T_world_local):
    """T_camera_local = T_camera_pseudoCam @ T_world_pseudoCam⁻¹ @
    T_world_local per (b, t), numpy float64 → (B, T, 12) float32
    (ref: model/transformer_parq.py:240-247)."""
    B, T = T_camera_pseudoCam.shape[:2]
    out = np.zeros((B, T, 12), np.float64)
    for b in range(B):
        Rl = T_world_local[b, 0, :9].reshape(3, 3).astype(np.float64)
        tl = T_world_local[b, 0, 9:].astype(np.float64)
        for t in range(T):
            Rcp = T_camera_pseudoCam[b, t, :9].reshape(3, 3).astype(np.float64)
            tcp = T_camera_pseudoCam[b, t, 9:].astype(np.float64)
            Rwp = T_world_pseudoCam[b, t, :9].reshape(3, 3).astype(np.float64)
            twp = T_world_pseudoCam[b, t, 9:].astype(np.float64)
            # pseudoCam_from_world
            Rpw, tpw = Rwp.T, -Rwp.T @ twp
            # pseudoCam_from_local
            Rpl, tpl = Rpw @ Rl, Rpw @ tl + tpw
            # camera_from_local
            Rcl, tcl = Rcp @ Rpl, Rcp @ tpl + tcp
            out[b, t, :9] = Rcl.reshape(9)
            out[b, t, 9:] = tcl
    return out.astype(np.float32)


def scale_camera(cam, s):
    """Feature-scale camera with the half-pixel-aware principal point
    (ref: resnet_fpn.py:88-90 via wrappers.py:478-488 Camera.scale)."""
    return np.concatenate([cam[..., :4] * s,
                           (cam[..., 4:] + 0.5) * s - 0.5], -1)


def release_state_dict(body, fpn, enc, dec: TorchDecoder):
    """Export the oracle modules in the EXACT parq_release.ckpt key layout
    (ref: utils/weight_convert.py:10-30), incl. the dead decoder.norm that
    real checkpoints carry."""
    sd = {}
    for k, v in body.state_dict().items():
        sd[f"backbone2d.resnet_fpn.body.{k}"] = v.detach().numpy()
    for k, v in fpn.state_dict().items():
        sd[f"backbone2d.resnet_fpn.fpn.{k}"] = v.detach().numpy()
    for k, v in enc.state_dict().items():
        sd[f"add_ray_pe.encoder.{k}"] = v.detach().numpy()
    dpre = "box3d_decoder.parq_module.decoder"
    hpre = "box3d_decoder.mlp_heads"
    mods = {f"{dpre}.position_encoder.0": dec.pos_enc[0],
            f"{dpre}.position_encoder.2": dec.pos_enc[2],
            f"{dpre}.layers.0.self_attn": dec.self_attn,
            f"{dpre}.layers.0.multihead_attn": dec.cross_attn,
            f"{dpre}.layers.0.linear1": dec.linear1,
            f"{dpre}.layers.0.linear2": dec.linear2,
            f"{dpre}.layers.0.norm1": dec.norm1,
            f"{dpre}.layers.0.norm2": dec.norm2,
            f"{dpre}.layers.0.norm3": dec.norm3,
            f"{hpre}.sem_cls_head.layers.0": dec.sem_cls_head,
            f"{hpre}.size_head.layers.0": dec.size_head}
    for prefix, mod in mods.items():
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    for name, mod in (("center_head", dec.center_head),
                      ("rotation_head", dec.rotation_head)):
        for i, v in mod.state_dict().items():
            sd[f"{hpre}.{name}.layers.{i}"] = v.numpy()
    sd["box3d_decoder.refpoint.weight"] = \
        dec.refpoint.weight.detach().numpy()
    # dead decoder-final norm, present in released checkpoints but never
    # applied by the reference forward (DIVERGENCES.md #12)
    sd[f"{dpre}.norm.weight"] = np.ones(dec.dims.D, np.float32)
    sd[f"{dpre}.norm.bias"] = np.zeros(dec.dims.D, np.float32)
    return sd
