"""Per-iteration parity of the FULL decoder path (rayPE excluded; memory
features fed identically) against a torch oracle assembled from standard
torch layers per the reference semantics, with weights converted through the
parq_release.ckpt key layout. This is SURVEY §7.2 step 5: per-iteration box
dicts must match in eval mode."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from parq_tpu.geometry import Camera, Pose
from parq_tpu.models.decoder import PARQDecoder

# small-but-faithful dims (structure identical to release; sizes reduced so
# the CPU oracle stays fast)
D, HEADS, FFN, L, Q, NCLS = 64, 4, 48, 3, 16, 9
B, T, H, W = 2, 3, 12, 16
SCALE = (-3.0, 3.0, -2.0, 0.5, 0.25, 5.25)
MEAN_SIZE = tuple(tuple(float(v) for v in row)
                  for row in np.linspace(0.5, 1.5, (NCLS + 1) * 3)
                  .reshape(NCLS + 1, 3))


def torch_pos2posemb3d(pos, num=128, temperature=10000):
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = torch.arange(num, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num)
    outs = []
    for i in (1, 0, 2):
        p = pos[..., i, None] / dim_t
        p = torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()),
                        dim=-1).flatten(-2)
        outs.append(p)
    return torch.cat(outs, dim=-1)


def torch_inverse_sigmoid(x, eps=1e-3):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def normalize(p):
    s = SCALE
    return torch.stack([(p[..., 0] - s[0]) / (s[1] - s[0]),
                        (p[..., 1] - s[2]) / (s[3] - s[2]),
                        (p[..., 2] - s[4]) / (s[5] - s[4])], -1)


def denormalize(p):
    s = SCALE
    return torch.stack([p[..., 0] * (s[1] - s[0]) + s[0],
                        p[..., 1] * (s[3] - s[2]) + s[2],
                        p[..., 2] * (s[5] - s[4]) + s[4]], -1)


class TorchOracle(tnn.Module):
    """Reference-semantics decoder: recurrent weight-shared layer, pixel-
    aligned grid_sample with view-mean, shared conv1x1 heads, inverse-sigmoid
    center update, detach between iterations."""

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
        """memory_hw: (B*T, C, H, W); query_pos (B, Q, 3) local coords."""
        w, h, fx, fy, cx, cy = cam
        # local -> camera for each view: (B, T, Q, 3)
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
        """memory: (B, T, H, W, D) channels-last."""
        memory_hw = memory.permute(0, 1, 4, 2, 3).reshape(B * T, D, H, W)
        memory_tokens = memory.reshape(B, T * H * W, D)
        ref = torch.sigmoid(self.refpoint.weight)[None].expand(B, Q, 3)
        outs = []
        for _ in range(L):
            pos_feat = self.pos_enc(torch_pos2posemb3d(ref))
            pix, _ = self.project(memory_hw, denormalize(ref), R_cl, t_cl,
                                  cam)
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

            center = torch.sigmoid(center_offset + torch_inverse_sigmoid(ref))
            center_unnorm = denormalize(center)
            with torch.no_grad():
                prob = torch.softmax(cls_logits, -1)
            size_unnorm = torch.exp(size_scale) * \
                self.mean_size[prob.argmax(-1)]
            outs.append({
                "pred_logits": cls_logits,
                "center_unnormalized": center_unnorm,
                "size_unnormalized": size_unnorm,
                "ortho6d": ortho6d,
                "coord_pos": denormalize(ref),
            })
            ref = normalize(center_unnorm).detach()
        return outs


def oracle_state_dict(oracle):
    """Map the oracle's params into the parq_release.ckpt key layout."""
    sd = {}
    dec = "box3d_decoder.parq_module.decoder"
    heads = "box3d_decoder.mlp_heads"
    m = {f"{dec}.position_encoder.0": oracle.pos_enc[0],
         f"{dec}.position_encoder.2": oracle.pos_enc[2],
         f"{dec}.layers.0.linear1": oracle.linear1,
         f"{dec}.layers.0.linear2": oracle.linear2,
         f"{dec}.layers.0.norm1": oracle.norm1,
         f"{dec}.layers.0.norm2": oracle.norm2,
         f"{dec}.layers.0.norm3": oracle.norm3}
    for prefix, mod in m.items():
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()
    for name, attn in (("self_attn", oracle.self_attn),
                       ("multihead_attn", oracle.cross_attn)):
        for k, v in attn.state_dict().items():
            sd[f"{dec}.layers.0.{name}.{k}"] = v.numpy()
    for name, mod in (("sem_cls_head", oracle.sem_cls_head),
                      ("size_head", oracle.size_head)):
        sd[f"{heads}.{name}.layers.0.weight"] = mod.weight.detach().numpy()
        sd[f"{heads}.{name}.layers.0.bias"] = mod.bias.detach().numpy()
    for name, mod in (("center_head", oracle.center_head),
                      ("rotation_head", oracle.rotation_head)):
        for i, v in mod.state_dict().items():
            sd[f"{heads}.{name}.layers.{i}"] = v.numpy()
    sd["box3d_decoder.refpoint.weight"] = \
        oracle.refpoint.weight.detach().numpy()
    # satisfy converter expectations for unrelated groups with minimal stubs
    return sd


def test_full_decoder_per_iteration_parity(rng):
    torch.manual_seed(0)
    oracle = TorchOracle().eval()

    memory = rng.randn(B, T, H, W, D).astype(np.float32) * 0.5
    # per-view camera-from-local transforms with rotation + translation
    Rs, ts = [], []
    for t in range(T):
        th = 0.15 * t
        Rs.append(np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]]))
        ts.append(np.array([0.1 * t, -0.05 * t, 0.2 * t]))
    R_cl = np.broadcast_to(np.stack(Rs), (B, T, 3, 3)).astype(np.float32)
    t_cl = np.broadcast_to(np.stack(ts), (B, T, 3)).astype(np.float32)
    cam = (float(W), float(H), 8.0, 8.0, W / 2, H / 2)

    with torch.no_grad():
        expect = oracle(torch.from_numpy(memory), torch.from_numpy(R_cl),
                        torch.from_numpy(t_cl), cam)

    # convert oracle weights -> flax decoder
    sd = oracle_state_dict(oracle)
    tree = _convert_decoder_only(sd)

    dec = PARQDecoder(
        dim=D, heads=HEADS, ffn_dim=FFN, num_layers=L, dropout_rate=0.1,
        num_queries=Q, num_semcls=NCLS, scale=SCALE, feat_size=(W, H),
        mean_size=MEAN_SIZE, share_weights=True)

    camera = Camera(jnp.broadcast_to(
        jnp.asarray([W, H, 8.0, 8.0, W / 2, H / 2], jnp.float32), (B, T, 6)))
    # feed T_camera_local directly: set T_world_pseudoCam = identity,
    # T_world_local = identity, T_camera_pseudoCam = T_camera_local
    pose_cl = Pose.from_Rt(jnp.asarray(R_cl), jnp.asarray(t_cl))
    ident = Pose.identity((B, T))
    ident1 = Pose.identity((B, 1))

    got = dec.apply({"params": tree["params"]["box3d_decoder"]},
                    jnp.asarray(memory), camera, pose_cl, ident, ident1,
                    deterministic=True)

    for l in range(L):
        for key in ("pred_logits", "center_unnormalized",
                    "size_unnormalized", "ortho6d", "coord_pos"):
            np.testing.assert_allclose(
                np.asarray(got[key][l]), expect[l][key].numpy(),
                atol=2e-3, rtol=1e-3,
                err_msg=f"iteration {l} key {key}")


def _convert_decoder_only(sd):
    """Run the decoder-relevant part of convert_parq_checkpoint."""
    from parq_tpu.io.torch_convert import (_conv1d_as_dense, _head_mlp,
                                           _layer_norm, _linear, _mha,
                                           _mha_split_cross, _set)
    tree = {}
    dec_t = "box3d_decoder.parq_module.decoder"
    it_f = "box3d_decoder/iteration"
    _linear(tree, f"{dec_t}.position_encoder.0", sd,
            f"{it_f}/position_encoder/Dense_0")
    _linear(tree, f"{dec_t}.position_encoder.2", sd,
            f"{it_f}/position_encoder/Dense_1")
    lay_t = f"{dec_t}.layers.0"
    _mha(tree, f"{lay_t}.self_attn", sd, f"{it_f}/layer/self_attn", HEADS)
    _mha_split_cross(tree, f"{lay_t}.multihead_attn", sd,
                     layer_path=f"{it_f}/layer", dec_path="box3d_decoder",
                     num_heads=HEADS)
    _linear(tree, f"{lay_t}.linear1", sd, f"{it_f}/layer/linear1")
    _linear(tree, f"{lay_t}.linear2", sd, f"{it_f}/layer/linear2")
    for n in ("norm1", "norm2", "norm3"):
        _layer_norm(tree, f"{lay_t}.{n}", sd, f"{it_f}/layer/{n}")
    heads_t = "box3d_decoder.mlp_heads"
    _head_mlp(tree, f"{heads_t}.sem_cls_head", sd, f"{it_f}/sem_cls_head", 0)
    _head_mlp(tree, f"{heads_t}.center_head", sd, f"{it_f}/center_head", 2)
    _head_mlp(tree, f"{heads_t}.size_head", sd, f"{it_f}/size_head", 0)
    _head_mlp(tree, f"{heads_t}.rotation_head", sd, f"{it_f}/rotation_head",
              2)
    _set(tree, "params/box3d_decoder/refpoint",
         sd["box3d_decoder.refpoint.weight"])
    return tree
