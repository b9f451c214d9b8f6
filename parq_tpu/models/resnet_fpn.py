"""ResNet50 + FPN backbone, channels-last (NHWC), Flax.

Functional re-derivation of torchvision's `resnet_fpn_backbone` as used by the
reference (ref: model/resnet_fpn.py:16-91): ResNet-50 with **frozen**
BatchNorm (torchvision wraps backbone BN in FrozenBatchNorm2d), an FPN over
C2..C5 with a 256-channel pyramid, then the reference's concat trick —
bilinear-resize pyramid levels 0..3 to level-0 resolution and concatenate to
C=1024 (ref: :73-80). ImageNet normalization is applied inside
(ref: :43-49, :65).

Frozen BN statistics/affine live in the separate ``frozen`` variable
collection so the optimizer never sees them; at conversion time torchvision's
(weight, bias, running_mean, running_var) map 1:1.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

RESNET_STAGES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}
BOTTLENECK = {"resnet50", "resnet101", "resnet152"}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine (torchvision
    FrozenBatchNorm2d, eps=1e-5). Variables in collection 'frozen'."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (self.features,)
        scale = self.variable("frozen", "scale",
                              lambda: jnp.ones(shape, jnp.float32)).value
        bias = self.variable("frozen", "bias",
                             lambda: jnp.zeros(shape, jnp.float32)).value
        mean = self.variable("frozen", "mean",
                             lambda: jnp.zeros(shape, jnp.float32)).value
        var = self.variable("frozen", "var",
                            lambda: jnp.ones(shape, jnp.float32)).value
        inv = scale * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * inv
        # apply the per-channel affine in the ACTIVATION dtype: with f32
        # stats parameters, x(bf16) * inv(f32) would promote every BN
        # output to f32 — the whole ResNet then ping-pongs bf16↔f32
        # between convs (the r3 train profile's conv stack ran at ~8% MXU
        # because of it). f32 inputs are untouched (astype no-op).
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


def _conv(features, kernel, stride=1, name=None, dtype=None):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   dtype=dtype, name=name)


class Bottleneck(nn.Module):
    features: int  # internal width; output is 4x
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.stride, name="conv2",
                    dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.features * 4, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.stride,
                             name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenBatchNorm(self.features * 4,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 3, self.stride, name="conv1",
                    dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        if self.downsample:
            identity = _conv(self.features, 1, self.stride,
                             name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenBatchNorm(self.features,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    name_: str = "resnet50"
    dtype: object = None

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        """x: (N, H, W, 3) → [C2, C3, C4, C5] (strides 4, 8, 16, 32)."""
        stages = RESNET_STAGES[self.name_]
        block = Bottleneck if self.name_ in BOTTLENECK else BasicBlock
        expansion = 4 if self.name_ in BOTTLENECK else 1

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool(3, stride 2, pad 1): window padding contributes the
        # reduce init (-inf) — identical to an explicit -inf pad, without
        # materializing the padded tensor (0.8ms/step in the r3 profile)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        feats = []
        width = 64
        for si, blocks in enumerate(stages):
            stride = 1 if si == 0 else 2
            for bi in range(blocks):
                down = bi == 0 and (stride != 1 or si == 0 and expansion != 1)
                x = block(width, stride if bi == 0 else 1, down,
                          dtype=self.dtype, name=f"layer{si + 1}_{bi}")(x)
            feats.append(x)
            width *= 2
        return feats


def torch_nearest_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') semantics on NHWC:
    src = floor(dst * in/out). jax.image.resize('nearest') rounds at
    half-pixel centers instead — a different pixel at non-integer scales
    (e.g. the FPN's c5 8x10 → c4 15x20 at the release resolution), which
    silently broke checkpoint parity in round 1."""
    ih, iw = x.shape[1:3]
    if (ih, iw) == (h, w):
        return x
    idx_h = jnp.floor(jnp.arange(h) * (ih / h)).astype(jnp.int32)
    idx_w = jnp.floor(jnp.arange(w) * (iw / w)).astype(jnp.int32)
    return x[:, idx_h][:, :, idx_w]


class FPN(nn.Module):
    """torchvision FeaturePyramidNetwork: 1x1 laterals → top-down nearest
    upsample + add → 3x3 smoothing convs; 256 channels."""
    out_channels: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Sequence[jnp.ndarray]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name=f"inner_{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway (nearest upsample, exact torch convention)
        outs = [None] * len(laterals)
        prev = laterals[-1]
        outs[-1] = prev
        for i in range(len(laterals) - 2, -1, -1):
            h, w = laterals[i].shape[1:3]
            prev = laterals[i] + torch_nearest_resize(prev, h, w)
            outs[i] = prev
        return [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, dtype=self.dtype, name=f"layer_{i}")(o)
            for i, o in enumerate(outs)
        ]


def _upsample_interleave_1d(x: jnp.ndarray, axis: int, f: int) -> jnp.ndarray:
    """Integer-factor linear upsample along `axis` (half-pixel centers,
    edges clamped — F.interpolate(align_corners=False) semantics, same as
    jax.image.resize('linear') to float rounding) built from shifted
    weighted sums + a phase interleave: pure elementwise + reshape, no
    gather. XLA can fuse this into the FPN concat and keep one layout,
    where the gather-based resize forced a ~1.4 ms copy pair at release
    dims (r4 profile). Phase j of the output samples source offset
    (j+0.5)/f - 0.5 from its cell k, so each phase is a 2-tap lerp of x
    with its clamped left or right neighbor."""
    n = x.shape[axis]

    def sl(s):
        return tuple(s if a == axis else slice(None) for a in range(x.ndim))

    xp = jnp.concatenate([x[sl(slice(0, 1))], x[sl(slice(0, n - 1))]],
                         axis=axis)
    xn = jnp.concatenate([x[sl(slice(1, n))], x[sl(slice(n - 1, n))]],
                         axis=axis)
    phases = []
    for j in range(f):
        off = (j + 0.5) / f - 0.5
        a = jnp.asarray(abs(off), x.dtype)
        phases.append(a * xp + (1 - a) * x if off < 0
                      else (1 - a) * x + a * xn)
    y = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = n * f
    return y.reshape(shape)


def upsample_linear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear NHWC upsample to (h, w): the gather-free interleave form
    when both ratios are integers, jax.image.resize otherwise (the release
    dims' level-3 10x8 → 80x60 has a non-integer 7.5x height ratio)."""
    ih, iw = x.shape[1:3]
    if (ih, iw) == (h, w):
        return x
    if h % ih == 0 and w % iw == 0:
        x = _upsample_interleave_1d(x, 1, h // ih)
        return _upsample_interleave_1d(x, 2, w // iw)
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                            method="linear")


class ResNetFPN(nn.Module):
    """Full backbone: normalize → ResNet → FPN → concat-to-1024 at level 0.

    Input: (B, T, H, W, 3) in [0, 1]. Output: (B, T, H/4, W/4, 4*256).
    """
    resnet_name: str = "resnet50"
    layer: int = 0   # target pyramid level for the concat (stride 4)
    freeze: bool = False
    fpn_channels: int = 256
    dtype: object = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        B, T, H, W, _ = images.shape
        x = images.reshape(B * T, H, W, 3)
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        if self.dtype is not None:
            x = x.astype(self.dtype)

        feats = ResNet(self.resnet_name, dtype=self.dtype, name="body")(x)
        pyr = FPN(self.fpn_channels, dtype=self.dtype, name="fpn")(feats)

        # resize all levels to the target level and concat (ref: :73-80);
        # F.interpolate(mode='bilinear') default align_corners=False ==
        # jax.image.resize 'linear' (half-pixel centers) == the interleave
        # form (to float rounding). [A separable-matmul resize
        # (PARQ_FPN_MM_RESIZE) was A/B'd on-chip in r4 to attack the
        # concat's 1.4ms layout-copy pair and LOST, 930.6 vs 941.7 fps —
        # bench_results/r4/eval_mmresize.log.]
        th, tw = pyr[self.layer].shape[1:3]
        resized = [upsample_linear(p, th, tw) for p in pyr[:4]]
        if self.freeze:
            resized = [jax.lax.stop_gradient(r) for r in resized]
        # [r5: folding the rayPE add into these concat operands
        # (split-add) LOST its A/B 909.6 vs 957.0 eval fps — the enc
        # lane-slice reads broke the upsample/concat fusions; the plain
        # concat + one add op is what XLA schedules best. Don't redo.]
        v = jnp.concatenate(resized, axis=-1)  # (B*T, th, tw, 1024)
        return v.reshape(B, T, th, tw, v.shape[-1])

    def camera_scale_factor(self) -> float:
        return 1.0 / (2 ** (self.layer + 2))
