"""torch → flax checkpoint conversion for the PARQ release layout.

Consumes the exact key layout of ``parq_release.ckpt``
(ref: utils/weight_convert.py:10-30 documents its provenance; top-level
groups are ``backbone2d.*``, ``add_ray_pe.*``, ``box3d_decoder.parq_module.*``,
``box3d_decoder.mlp_heads.*``, ``box3d_decoder.refpoint.*``) and produces the
variable tree of :class:`parq_tpu.models.PARQModel` — ``params`` plus the
``frozen`` collection holding the torchvision FrozenBatchNorm statistics.

Works from a raw ``state_dict`` of numpy arrays, so torch is only needed to
*read* a .ckpt file (``load_torch_state_dict``), not for the mapping itself.
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {key: np.ndarray} (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _linear(tree, prefix_t, sd, path_f):
    _set(tree, f"params/{path_f}/kernel", sd[f"{prefix_t}.weight"].T)
    if f"{prefix_t}.bias" in sd:
        _set(tree, f"params/{path_f}/bias", sd[f"{prefix_t}.bias"])


def _conv2d(tree, prefix_t, sd, path_f):
    w = sd[f"{prefix_t}.weight"]  # (O, I, kh, kw)
    _set(tree, f"params/{path_f}/kernel", w.transpose(2, 3, 1, 0))
    if f"{prefix_t}.bias" in sd:
        _set(tree, f"params/{path_f}/bias", sd[f"{prefix_t}.bias"])


def _conv1d_as_dense(tree, prefix_t, sd, path_f):
    w = sd[f"{prefix_t}.weight"]  # (O, I, 1)
    _set(tree, f"params/{path_f}/kernel", w[:, :, 0].T)
    if f"{prefix_t}.bias" in sd:
        _set(tree, f"params/{path_f}/bias", sd[f"{prefix_t}.bias"])


def _frozen_bn(tree, prefix_t, sd, path_f):
    _set(tree, f"frozen/{path_f}/scale", sd[f"{prefix_t}.weight"])
    _set(tree, f"frozen/{path_f}/bias", sd[f"{prefix_t}.bias"])
    _set(tree, f"frozen/{path_f}/mean", sd[f"{prefix_t}.running_mean"])
    _set(tree, f"frozen/{path_f}/var", sd[f"{prefix_t}.running_var"])


def _layer_norm(tree, prefix_t, sd, path_f):
    _set(tree, f"params/{path_f}/scale", sd[f"{prefix_t}.weight"])
    _set(tree, f"params/{path_f}/bias", sd[f"{prefix_t}.bias"])


def _group_norm(tree, prefix_t, sd, path_f):
    _set(tree, f"params/{path_f}/scale", sd[f"{prefix_t}.weight"])
    _set(tree, f"params/{path_f}/bias", sd[f"{prefix_t}.bias"])


def _mha(tree, prefix_t, sd, path_f, num_heads: int):
    """torch nn.MultiheadAttention → flax MultiHeadDotProductAttention."""
    in_w = sd[f"{prefix_t}.in_proj_weight"]  # (3D, D)
    in_b = sd[f"{prefix_t}.in_proj_bias"]    # (3D,)
    D = in_w.shape[1]
    Dh = D // num_heads
    for i, name in enumerate(["query", "key", "value"]):
        w = in_w[i * D:(i + 1) * D]          # (D, D): y = x @ w.T
        b = in_b[i * D:(i + 1) * D]
        _set(tree, f"params/{path_f}/{name}/kernel",
             w.T.reshape(D, num_heads, Dh))
        _set(tree, f"params/{path_f}/{name}/bias",
             b.reshape(num_heads, Dh))
    ow = sd[f"{prefix_t}.out_proj.weight"]   # (D, D): y = x @ ow.T
    _set(tree, f"params/{path_f}/out/kernel",
         ow.T.reshape(num_heads, Dh, D))
    _set(tree, f"params/{path_f}/out/bias", sd[f"{prefix_t}.out_proj.bias"])


def _mha_split_cross(tree, prefix_t, sd, layer_path: str, dec_path: str,
                     num_heads: int):
    """torch MHA → split layout: q/out in the scanned layer
    (cross_attn_query / cross_attn_out), k/v hoisted to the decoder
    (cross_attn_key / cross_attn_value) — see models/decoder.py."""
    in_w = sd[f"{prefix_t}.in_proj_weight"]
    in_b = sd[f"{prefix_t}.in_proj_bias"]
    D = in_w.shape[1]
    Dh = D // num_heads
    targets = {
        "query": f"{layer_path}/cross_attn_query",
        "key": f"{dec_path}/cross_attn_key",
        "value": f"{dec_path}/cross_attn_value",
    }
    for i, name in enumerate(["query", "key", "value"]):
        w = in_w[i * D:(i + 1) * D]
        b = in_b[i * D:(i + 1) * D]
        _set(tree, f"params/{targets[name]}/kernel",
             w.T.reshape(D, num_heads, Dh))
        _set(tree, f"params/{targets[name]}/bias", b.reshape(num_heads, Dh))
    ow = sd[f"{prefix_t}.out_proj.weight"]
    _set(tree, f"params/{layer_path}/cross_attn_out/kernel",
         ow.T.reshape(num_heads, Dh, D))
    _set(tree, f"params/{layer_path}/cross_attn_out/bias",
         sd[f"{prefix_t}.out_proj.bias"])


def _head_mlp(tree, prefix_t, sd, path_f, num_hidden: int):
    """GenericMLP conv-mode (ref generic_mlp.py layer indexing: per hidden
    block Conv1d,GN,ReLU,Dropout — stride 4; final Conv1d last)."""
    d = 0
    for h in range(num_hidden):
        _conv1d_as_dense(tree, f"{prefix_t}.layers.{4 * h}", sd,
                         f"{path_f}/Dense_{h}")
        _group_norm(tree, f"{prefix_t}.layers.{4 * h + 1}", sd,
                    f"{path_f}/GroupNorm1_{h}")
        d = h + 1
    # small heads (hidden=[]) have no dropout layers at all → final at 0
    final_idx = 4 * num_hidden if num_hidden else 0
    _conv1d_as_dense(tree, f"{prefix_t}.layers.{final_idx}", sd,
                     f"{path_f}/Dense_{d}")


def _convert_resnet_body(tree: dict, sd: Mapping[str, np.ndarray],
                         body_t: str, body_f: str):
    """ResNet body (conv1/bn1 + bottleneck layers) → backbone2d/body.
    `body_t` is the torch key prefix; empty string for a bare torchvision
    state_dict (keys like ``conv1.weight``)."""
    dot = f"{body_t}." if body_t else ""
    _conv2d(tree, f"{dot}conv1", sd, f"{body_f}/conv1")
    _frozen_bn(tree, f"{dot}bn1", sd, f"{body_f}/bn1")
    block_re = re.compile(
        rf"^{re.escape(dot)}layer(\d+)\.(\d+)\.(.+?)\.(weight|bias|running_mean|running_var)$")
    seen_blocks = set()
    for key in sd:
        m = block_re.match(key)
        if not m:
            continue
        L, B = int(m.group(1)), int(m.group(2))
        if (L, B) in seen_blocks:
            continue
        seen_blocks.add((L, B))
        pt = f"{dot}layer{L}.{B}"
        pf = f"{body_f}/layer{L}_{B}"
        for k in (1, 2, 3):
            if f"{pt}.conv{k}.weight" in sd:
                _conv2d(tree, f"{pt}.conv{k}", sd, f"{pf}/conv{k}")
                _frozen_bn(tree, f"{pt}.bn{k}", sd, f"{pf}/bn{k}")
        if f"{pt}.downsample.0.weight" in sd:
            _conv2d(tree, f"{pt}.downsample.0", sd, f"{pf}/downsample_conv")
            _frozen_bn(tree, f"{pt}.downsample.1", sd, f"{pf}/downsample_bn")


def _convert_fpn(tree: dict, sd: Mapping[str, np.ndarray],
                 fpn_t: str, fpn_f: str):
    for i in range(4):
        # torchvision key layouts vary: inner_blocks.{i} or inner_blocks.{i}.0
        for cand in (f"{fpn_t}.inner_blocks.{i}", f"{fpn_t}.inner_blocks.{i}.0"):
            if f"{cand}.weight" in sd:
                _conv2d(tree, cand, sd, f"{fpn_f}/inner_{i}")
                break
        for cand in (f"{fpn_t}.layer_blocks.{i}", f"{fpn_t}.layer_blocks.{i}.0"):
            if f"{cand}.weight" in sd:
                _conv2d(tree, cand, sd, f"{fpn_f}/layer_{i}")
                break


def convert_backbone2d(sd: Mapping[str, np.ndarray],
                       body_t: str = "backbone2d.resnet_fpn.body",
                       fpn_t: str = "backbone2d.resnet_fpn.fpn") -> dict:
    """Backbone-only conversion (body + FPN) — used by the backbone parity
    oracle tests and reusable for partial checkpoints."""
    tree: dict = {}
    _convert_resnet_body(tree, sd, body_t, "backbone2d/body")
    _convert_fpn(tree, sd, fpn_t, "backbone2d/fpn")
    return tree


def convert_torchvision_resnet(sd: Mapping[str, np.ndarray]) -> dict:
    """Bare torchvision ``resnet50(pretrained=True)`` ImageNet state_dict →
    backbone body variables only (FPN and everything else keep their init —
    exactly what ``resnet_fpn_backbone(pretrained=True)`` gives the
    reference at train start, ref: model/resnet_fpn.py:39-41). Use with
    PRETRAINED_PATH to reproduce the reference's warm-start recipe."""
    tree: dict = {}
    _convert_resnet_body(tree, sd, "", "backbone2d/body")
    return tree


def is_torchvision_resnet_sd(sd: Mapping[str, np.ndarray]) -> bool:
    return "conv1.weight" in sd and "layer1.0.conv1.weight" in sd


def convert_parq_checkpoint(sd: Mapping[str, np.ndarray],
                            num_heads: int = 4,
                            share_weights: bool = True) -> dict:
    """Full parq_release.ckpt state_dict → flax variables dict."""
    tree: dict = {}

    # ---- backbone: resnet body -------------------------------------------
    _convert_resnet_body(tree, sd, "backbone2d.resnet_fpn.body",
                         "backbone2d/body")

    # ---- backbone: fpn ----------------------------------------------------
    _convert_fpn(tree, sd, "backbone2d.resnet_fpn.fpn", "backbone2d/fpn")

    # ---- ray PE -----------------------------------------------------------
    _linear(tree, "add_ray_pe.encoder.0", sd, "add_ray_pe/encoder/Dense_0")
    _linear(tree, "add_ray_pe.encoder.2", sd, "add_ray_pe/encoder/Dense_1")

    # ---- decoder ----------------------------------------------------------
    dec_t = "box3d_decoder.parq_module.decoder"
    it_f = ("box3d_decoder/iteration" if share_weights
            else "box3d_decoder/iteration_0")
    _linear(tree, f"{dec_t}.position_encoder.0", sd,
            f"{it_f}/position_encoder/Dense_0")
    _linear(tree, f"{dec_t}.position_encoder.2", sd,
            f"{it_f}/position_encoder/Dense_1")
    lay_t = f"{dec_t}.layers.0"
    _mha(tree, f"{lay_t}.self_attn", sd, f"{it_f}/layer/self_attn", num_heads)
    # cross-attention is split in the TPU build: memory K/V projections are
    # hoisted out of the recurrence (decoder-level), q/out stay in the layer
    _mha_split_cross(tree, f"{lay_t}.multihead_attn", sd,
                     layer_path=f"{it_f}/layer",
                     dec_path="box3d_decoder", num_heads=num_heads)
    _linear(tree, f"{lay_t}.linear1", sd, f"{it_f}/layer/linear1")
    _linear(tree, f"{lay_t}.linear2", sd, f"{it_f}/layer/linear2")
    for n in ("norm1", "norm2", "norm3"):
        _layer_norm(tree, f"{lay_t}.{n}", sd, f"{it_f}/layer/{n}")
    # NOTE: decoder.norm.* exists in the ckpt but is never applied by the
    # reference forward (transformer_parq.py:283-337) — intentionally skipped.

    # ---- heads ------------------------------------------------------------
    heads_t = "box3d_decoder.mlp_heads"
    _head_mlp(tree, f"{heads_t}.sem_cls_head", sd, f"{it_f}/sem_cls_head", 0)
    _head_mlp(tree, f"{heads_t}.center_head", sd, f"{it_f}/center_head", 2)
    _head_mlp(tree, f"{heads_t}.size_head", sd, f"{it_f}/size_head", 0)
    _head_mlp(tree, f"{heads_t}.rotation_head", sd, f"{it_f}/rotation_head", 2)

    _set(tree, "params/box3d_decoder/refpoint",
         sd["box3d_decoder.refpoint.weight"])
    return tree


def load_parq_checkpoint(path: str, num_heads: int = 4,
                         share_weights: bool = True) -> dict:
    return convert_parq_checkpoint(load_torch_state_dict(path),
                                   num_heads=num_heads,
                                   share_weights=share_weights)
