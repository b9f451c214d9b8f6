"""END-TO-END numerical parity: the full PARQModel (ResNet50-FPN → rayPE →
recurrent decoder) against a torch oracle composed from the same standard-
torch-layer components used by the per-module parity suites, with ALL
weights routed through the real ``convert_parq_checkpoint`` (the
parq_release.ckpt interchange). This closes the wiring risk the component
oracles can't see: camera scaling, tokenize order, feature+encoding add,
head plumbing (ref: model/parq_lightning.py:68-95).

Small-but-faithful dims: real resnet50 body/FPN (C=1024, D=1024, 4 heads)
with tiny images, 16 queries, 2 iterations.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from test_parity_backbone import (TFPN, TResNet50Body, _oracle_forward,
                                  _randomize_bn_stats)

from parq_tpu.io.torch_convert import convert_parq_checkpoint
from parq_tpu.models import PARQModel
from parq_tpu.train.checkpoint import _merge

D, HEADS, FFN, L, Q, NCLS = 1024, 4, 768, 2, 16, 9
B, T, H0, W0 = 1, 2, 48, 64
H, W = H0 // 4, W0 // 4        # feature size (12, 16)
NSAMP = 64
SCALE = (-3.0, 3.0, -2.0, 0.5, 0.25, 5.25)
MEAN_SIZE = tuple(tuple(float(v) for v in row)
                  for row in np.linspace(0.5, 1.5, (NCLS + 1) * 3)
                  .reshape(NCLS + 1, 3))


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


def t_normalize(p):
    s = SCALE
    return torch.stack([(p[..., 0] - s[0]) / (s[1] - s[0]),
                        (p[..., 1] - s[2]) / (s[3] - s[2]),
                        (p[..., 2] - s[4]) / (s[5] - s[4])], -1)


def t_denormalize(p):
    s = SCALE
    return torch.stack([p[..., 0] * (s[1] - s[0]) + s[0],
                        p[..., 1] * (s[3] - s[2]) + s[2],
                        p[..., 2] * (s[5] - s[4]) + s[4]], -1)


class TorchDecoder(tnn.Module):
    """Reference-semantics recurrent decoder at full width (D=1024)."""

    def __init__(self):
        super().__init__()
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
        self.register_buffer("mean_size", torch.tensor(MEAN_SIZE))

    def project(self, memory_hw, query_pos, R_cl, t_cl, cam):
        w, h, fx, fy, cx, cy = cam
        qc = torch.einsum("btij,bqj->btqi", R_cl, query_pos) + \
            t_cl[:, :, None, :]
        z = qc[..., 2].clamp(min=1e-3)
        u = qc[..., 0] / z * fx + cx
        v = qc[..., 1] / z * fy + cy
        valid = ((qc[..., 2] > 1e-3) & (u >= 0) & (u <= w - 1)
                 & (v >= 0) & (v <= h - 1))
        grid = torch.stack([2 * u / (w - 1) - 1, 2 * v / (h - 1) - 1], -1)
        feats = F.grid_sample(memory_hw, grid.view(B * T, 1, Q, 2),
                              padding_mode="zeros", align_corners=True)
        feats = feats.view(B, T, D, Q).permute(0, 1, 3, 2)
        count = valid.float().sum(1).clamp(min=1.0)
        return feats.sum(1) / count[..., None], valid

    def forward(self, memory, R_cl, t_cl, cam):
        memory_hw = memory.permute(0, 1, 4, 2, 3).reshape(B * T, D, H, W)
        memory_tokens = memory.reshape(B, T * H * W, D)
        ref = torch.sigmoid(self.refpoint.weight)[None].expand(B, Q, 3)
        outs = []
        for _ in range(L):
            pos_feat = self.pos_enc(t_pos2posemb3d(ref))
            pix, _ = self.project(memory_hw, t_denormalize(ref), R_cl,
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
            center_unnorm = t_denormalize(center)
            with torch.no_grad():
                prob = torch.softmax(cls_logits, -1)
            size_unnorm = torch.exp(size_scale) * \
                self.mean_size[prob.argmax(-1)]
            outs.append({
                "pred_logits": cls_logits,
                "center_unnormalized": center_unnorm,
                "size_unnormalized": size_unnorm,
                "ortho6d": ortho6d,
                "coord_pos": t_denormalize(ref),
            })
            ref = t_normalize(center_unnorm).detach()
        return outs


def _ray_pe_oracle(enc, cam_feat, Tcp):
    """numpy/torch rayPE mirror: identity world poses, so
    T_local_cam = Tcp^-1 (ref: encoding_utils.py:23-101)."""
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    pix = np.stack([xx, yy], -1).reshape(-1, 2)
    d = np.exp(np.log(0.25) + np.log(5.25 / 0.25)
               * np.linspace(0, 1, NSAMP)).astype(np.float32)
    pts = np.zeros((B, T, H, W, NSAMP, 3), np.float32)
    for b in range(B):
        for t in range(T):
            w_, h_, fx, fy, cx, cy = cam_feat[b, t]
            rays = np.concatenate(
                [(pix - [cx, cy]) / [fx, fy], np.ones((H * W, 1))],
                -1).astype(np.float32)
            p = rays[:, None, :] * d[None, :, None]
            R = Tcp[b, t, :9].reshape(3, 3)
            tv = Tcp[b, t, 9:]
            p = (p.reshape(-1, 3) - tv) @ R  # R^T(x - t) = inverse pose
            pts[b, t] = p.reshape(H, W, NSAMP, 3)
    s = SCALE
    norm = np.stack([
        (pts[..., 0] - s[0]) / (s[1] - s[0]),
        (pts[..., 1] - s[2]) / (s[3] - s[2]),
        (pts[..., 2] - s[4]) / (s[5] - s[4])], -1)
    clipped = np.clip(norm, 0, 1)
    logit = np.log(np.maximum(clipped, 1e-3)
                   / np.maximum(1 - clipped, 1e-3)).astype(np.float32)
    with torch.no_grad():
        return enc(torch.from_numpy(
            logit.reshape(B, T, H, W, NSAMP * 3)))


def _full_state_dict(body, fpn, enc, dec):
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
    return sd


def test_full_model_end_to_end_parity(rng):
    torch.manual_seed(11)
    body = TResNet50Body().eval()
    fpn = TFPN().eval()
    _randomize_bn_stats(body, np.random.RandomState(3))
    enc = tnn.Sequential(tnn.Linear(NSAMP * 3, D), tnn.ReLU(),
                         tnn.Linear(D, D)).eval()
    dec = TorchDecoder().eval()

    imgs = rng.rand(B, T, H0, W0, 3).astype(np.float32)
    cam = np.tile(np.array([W0, H0, 40.0, 40.0, W0 / 2, H0 / 2],
                           np.float32), (B, T, 1))
    # general camera poses; identity world/pseudoCam frames (pose math has
    # its own general oracles — this test targets the wiring)
    Tcps = []
    for t in range(T):
        th = 0.12 * t
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        Tcps.append(np.concatenate([R.reshape(9),
                                    [0.1 * t, -0.05, 0.1]]).astype(np.float32))
    Tcp = np.broadcast_to(np.stack(Tcps), (B, T, 12)).copy()
    ident = np.tile(np.concatenate([np.eye(3, dtype=np.float32).reshape(9),
                                    np.zeros(3, np.float32)]), (B, T, 1))
    ident1 = ident[:, :1]

    # ---- torch oracle -----------------------------------------------------
    # feature-scale camera with the half-pixel-aware principal point
    # (ref: resnet_fpn.py:88-90 via wrappers.py:478-488 Camera.scale)
    s = 0.25
    cam_feat = np.concatenate([
        cam[..., :4] * s, (cam[..., 4:] + 0.5) * s - 0.5], -1)
    with torch.no_grad():
        feats = _oracle_forward(
            body, fpn,
            torch.from_numpy(imgs.reshape(B * T, H0, W0, 3))
            .permute(0, 3, 1, 2))
        feats = feats.permute(0, 2, 3, 1).view(B, T, H, W, D)
        encoding = _ray_pe_oracle(enc, cam_feat, Tcp)
        memory = feats + encoding
        R_cl = torch.from_numpy(
            Tcp[..., :9].reshape(B, T, 3, 3))
        t_cl = torch.from_numpy(Tcp[..., 9:])
        expect = dec(memory, R_cl, t_cl, tuple(cam_feat[0, 0]))

    # ---- flax model with converted weights ---------------------------------
    model = PARQModel(
        resnet_name="resnet50", image_size=(W0, H0), num_samples=NSAMP,
        dec_dim=D, dec_heads=HEADS, dec_ffn_dim=FFN, dec_layers=L,
        num_queries=Q, num_semcls=NCLS, dropout_rate=0.1,
        scale=SCALE, ray_points_scale=SCALE, mean_size=MEAN_SIZE)
    batch = {
        "rgb_img": jnp.asarray(imgs),
        "camera": jnp.asarray(cam),
        "T_camera_pseudoCam": jnp.asarray(Tcp),
        "T_world_pseudoCam": jnp.asarray(ident),
        "T_world_local": jnp.asarray(ident1),
    }
    vars0 = model.init(jax.random.PRNGKey(0), batch)
    tree = convert_parq_checkpoint(_full_state_dict(body, fpn, enc, dec),
                                   num_heads=HEADS)
    variables = {"params": _merge(vars0["params"], tree["params"]),
                 "frozen": _merge(vars0["frozen"], tree["frozen"])}
    got = model.apply(variables, batch, deterministic=True)

    for l in range(L):
        for key in ("pred_logits", "center_unnormalized",
                    "size_unnormalized", "ortho6d", "coord_pos"):
            np.testing.assert_allclose(
                np.asarray(got[key][l]), expect[l][key].numpy(),
                atol=4e-3, rtol=2e-3, err_msg=f"iteration {l} key {key}")
