"""Full-checkpoint converter structure test: a synthetic state_dict with the
exact parq_release.ckpt key layout converts into a tree that matches the
flagship model's variables (names AND shapes), so a real released checkpoint
will load without key drift."""
import numpy as np
import jax
import pytest

from parq_tpu.io import convert_parq_checkpoint
from parq_tpu.models import PARQModel

D = 1024
HEADS = 4
FFN = 768
RESNET50 = [(64, 3), (128, 4), (256, 6), (512, 3)]  # width, blocks


def fake_state_dict(rng):
    """Random tensors shaped per torch parq_release.ckpt keys."""
    sd = {}

    def t(*shape):
        return rng.randn(*shape).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = np.abs(t(c)) + 0.5

    body = "backbone2d.resnet_fpn.body"
    sd[f"{body}.conv1.weight"] = t(64, 3, 7, 7)
    bn(f"{body}.bn1", 64)
    in_ch = 64
    for li, (width, blocks) in enumerate(RESNET50, start=1):
        for b in range(blocks):
            p = f"{body}.layer{li}.{b}"
            sd[f"{p}.conv1.weight"] = t(width, in_ch if b == 0 else width * 4,
                                        1, 1)
            bn(f"{p}.bn1", width)
            sd[f"{p}.conv2.weight"] = t(width, width, 3, 3)
            bn(f"{p}.bn2", width)
            sd[f"{p}.conv3.weight"] = t(width * 4, width, 1, 1)
            bn(f"{p}.bn3", width * 4)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = t(
                    width * 4, in_ch if li > 1 else 64, 1, 1)
                bn(f"{p}.downsample.1", width * 4)
        in_ch = width * 4

    fpn = "backbone2d.resnet_fpn.fpn"
    for i, cin in enumerate([256, 512, 1024, 2048]):
        sd[f"{fpn}.inner_blocks.{i}.weight"] = t(256, cin, 1, 1)
        sd[f"{fpn}.inner_blocks.{i}.bias"] = t(256)
        sd[f"{fpn}.layer_blocks.{i}.weight"] = t(256, 256, 3, 3)
        sd[f"{fpn}.layer_blocks.{i}.bias"] = t(256)

    sd["add_ray_pe.encoder.0.weight"] = t(D, 192)
    sd["add_ray_pe.encoder.0.bias"] = t(D)
    sd["add_ray_pe.encoder.2.weight"] = t(D, D)
    sd["add_ray_pe.encoder.2.bias"] = t(D)

    dec = "box3d_decoder.parq_module.decoder"
    sd[f"{dec}.position_encoder.0.weight"] = t(D, 384)
    sd[f"{dec}.position_encoder.0.bias"] = t(D)
    sd[f"{dec}.position_encoder.2.weight"] = t(D, D)
    sd[f"{dec}.position_encoder.2.bias"] = t(D)
    for attn in ("self_attn", "multihead_attn"):
        sd[f"{dec}.layers.0.{attn}.in_proj_weight"] = t(3 * D, D)
        sd[f"{dec}.layers.0.{attn}.in_proj_bias"] = t(3 * D)
        sd[f"{dec}.layers.0.{attn}.out_proj.weight"] = t(D, D)
        sd[f"{dec}.layers.0.{attn}.out_proj.bias"] = t(D)
    sd[f"{dec}.layers.0.linear1.weight"] = t(FFN, D)
    sd[f"{dec}.layers.0.linear1.bias"] = t(FFN)
    sd[f"{dec}.layers.0.linear2.weight"] = t(D, FFN)
    sd[f"{dec}.layers.0.linear2.bias"] = t(D)
    for n in ("norm1", "norm2", "norm3"):
        sd[f"{dec}.layers.0.{n}.weight"] = t(D)
        sd[f"{dec}.layers.0.{n}.bias"] = t(D)
    # decoder-final norm: present in released ckpts, unused by the forward
    sd[f"{dec}.norm.weight"] = t(D)
    sd[f"{dec}.norm.bias"] = t(D)

    heads = "box3d_decoder.mlp_heads"
    sd[f"{heads}.sem_cls_head.layers.0.weight"] = t(10, D, 1)
    sd[f"{heads}.sem_cls_head.layers.0.bias"] = t(10)
    sd[f"{heads}.size_head.layers.0.weight"] = t(3, D, 1)
    sd[f"{heads}.size_head.layers.0.bias"] = t(3)
    for name, out in (("center_head", 3), ("rotation_head", 6)):
        sd[f"{heads}.{name}.layers.0.weight"] = t(D, D, 1)
        sd[f"{heads}.{name}.layers.1.weight"] = t(D)
        sd[f"{heads}.{name}.layers.1.bias"] = t(D)
        sd[f"{heads}.{name}.layers.4.weight"] = t(D, D, 1)
        sd[f"{heads}.{name}.layers.5.weight"] = t(D)
        sd[f"{heads}.{name}.layers.5.bias"] = t(D)
        sd[f"{heads}.{name}.layers.8.weight"] = t(out, D, 1)
        sd[f"{heads}.{name}.layers.8.bias"] = t(out)

    sd["box3d_decoder.refpoint.weight"] = t(256, 3)
    return sd


@pytest.mark.slow
def test_converted_tree_matches_flagship_model(rng):
    sd = fake_state_dict(rng)
    tree = convert_parq_checkpoint(sd, num_heads=HEADS, share_weights=True)

    # flagship variables (init on tiny images to keep CPU time sane — param
    # shapes don't depend on the image size)
    model = PARQModel(image_size=(64, 48), num_samples=64)
    from parq_tpu.data.synthetic import device_batch, make_batch
    batch = device_batch(make_batch([0], image_size=(64, 48)))
    variables = model.init(jax.random.PRNGKey(0), batch)

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, key))
            else:
                out[key] = tuple(np.shape(v))
        return out

    got_params = flatten(tree["params"])
    want_params = flatten(variables["params"])
    got_frozen = flatten(tree["frozen"])
    want_frozen = flatten(variables["frozen"])

    missing = sorted(set(want_params) - set(got_params))
    extra = sorted(set(got_params) - set(want_params))
    assert not extra, f"converted params not in model: {extra[:10]}"
    assert not missing, f"model params missing from ckpt: {missing[:10]}"
    for k in want_params:
        assert got_params[k] == want_params[k], (
            f"shape mismatch {k}: ckpt {got_params[k]} vs model "
            f"{want_params[k]}")

    assert set(got_frozen) == set(want_frozen)
    for k in want_frozen:
        assert got_frozen[k] == want_frozen[k], k
