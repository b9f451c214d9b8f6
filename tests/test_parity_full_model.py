"""END-TO-END numerical parity: the full PARQModel (ResNet50-FPN → rayPE →
recurrent decoder) against a torch oracle composed from the same standard-
torch-layer components used by the per-module parity suites, with ALL
weights routed through the real ``convert_parq_checkpoint`` (the
parq_release.ckpt interchange). This closes the wiring risk the component
oracles can't see: camera scaling, tokenize order, feature+encoding add,
head plumbing (ref: model/parq_lightning.py:68-95).

Small-but-faithful dims: real resnet50 body/FPN (C=1024, D=1024, 4 heads)
with tiny images, 16 queries, 2 iterations. The release-dims (L=8, Q=256,
320×240) dress rehearsal of the same oracle lives in
tests/test_release_rehearsal.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from test_parity_backbone import (TFPN, TResNet50Body, _oracle_forward,
                                  _randomize_bn_stats)
from torch_oracle import (Dims, TorchDecoder, ray_pe_oracle, scale_camera,
                          release_state_dict)

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
DIMS = Dims(D=D, HEADS=HEADS, FFN=FFN, L=L, Q=Q, NCLS=NCLS, NSAMP=NSAMP,
            SCALE=SCALE, MEAN_SIZE=MEAN_SIZE, B=B, T=T, H0=H0, W0=W0)


def test_full_model_end_to_end_parity(rng):
    torch.manual_seed(11)
    body = TResNet50Body().eval()
    fpn = TFPN().eval()
    _randomize_bn_stats(body, np.random.RandomState(3))
    enc = tnn.Sequential(tnn.Linear(NSAMP * 3, D), tnn.ReLU(),
                         tnn.Linear(D, D)).eval()
    dec = TorchDecoder(DIMS).eval()

    imgs = rng.rand(B, T, H0, W0, 3).astype(np.float32)
    cam = np.tile(np.array([W0, H0, 40.0, 40.0, W0 / 2, H0 / 2],
                           np.float32), (B, T, 1))
    # general camera poses; identity world/pseudoCam frames (pose math has
    # its own general oracles — this test targets the wiring). With
    # identity world frames, T_camera_local == T_camera_pseudoCam.
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
    cam_feat = scale_camera(cam, 0.25)
    with torch.no_grad():
        feats = _oracle_forward(
            body, fpn,
            torch.from_numpy(imgs.reshape(B * T, H0, W0, 3))
            .permute(0, 3, 1, 2))
        feats = feats.permute(0, 2, 3, 1).view(B, T, H, W, D)
        encoding = ray_pe_oracle(enc, cam_feat, Tcp, DIMS)
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
    tree = convert_parq_checkpoint(release_state_dict(body, fpn, enc, dec),
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
