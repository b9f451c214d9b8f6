"""End-to-end model forward smoke tests on tiny shapes (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parq_tpu.models import PARQModel


def tiny_model(**kw):
    defaults = dict(
        resnet_name="resnet18", image_size=(32, 24), num_samples=8,
        fpn_channels=16, tokenizer_out_channels=64,
        dec_dim=64, dec_heads=4, dec_ffn_dim=32, dec_layers=3,
        num_queries=16, num_semcls=9)
    defaults.update(kw)
    return PARQModel(**defaults)


def tiny_batch(B=2, T=3, H=24, W=32, seed=0):
    rng = np.random.RandomState(seed)
    I = np.concatenate([np.eye(3).reshape(9), np.zeros(3)]).astype(np.float32)
    return {
        "rgb_img": jnp.asarray(rng.rand(B, T, H, W, 3), jnp.float32),
        "camera": jnp.broadcast_to(
            jnp.asarray([W, H, 20.0, 20.0, W / 2, H / 2], jnp.float32),
            (B, T, 6)),
        "T_camera_pseudoCam": jnp.broadcast_to(jnp.asarray(I), (B, T, 12)),
        "T_world_pseudoCam": jnp.broadcast_to(jnp.asarray(I), (B, T, 12)),
        "T_world_local": jnp.broadcast_to(jnp.asarray(I), (B, 1, 12)),
    }


def test_forward_shapes_and_finiteness():
    model = tiny_model()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda p, b: model.apply(p, b))(params, batch)
    L, B, Q = 3, 2, 16
    assert out["pred_logits"].shape == (L, B, Q, 10)
    assert out["center_unnormalized"].shape == (L, B, Q, 3)
    assert out["size_unnormalized"].shape == (L, B, Q, 3)
    assert out["ortho6d"].shape == (L, B, Q, 6)
    assert out["coord_pos"].shape == (L, B, Q, 3)
    assert out["center_valid"].shape == (L, B, 3, Q)
    for k, v in out.items():
        assert bool(jnp.isfinite(v).all()), f"non-finite in {k}"
    # sizes positive (exp * positive table)
    assert bool((out["size_unnormalized"] > 0).all())
    # probs normalized
    np.testing.assert_allclose(np.asarray(out["sem_cls_prob"].sum(-1)), 1.0,
                               atol=1e-5)


def test_scan_equals_unrolled_shared_weights():
    """share_weights=True (scan) must equal an unrolled loop reusing the
    same iteration params."""
    m_scan = tiny_model(dec_layers=2, share_weights=True, dropout_rate=0.0)
    batch = tiny_batch(B=1)
    params = m_scan.init(jax.random.PRNGKey(0), batch)
    out_scan = m_scan.apply(params, batch)

    # unrolled: replicate iteration params under iteration_{i}
    m_unroll = tiny_model(dec_layers=2, share_weights=False, dropout_rate=0.0)
    p = params["params"]["box3d_decoder"]
    up = {k: v for k, v in params["params"].items() if k != "box3d_decoder"}
    up["box3d_decoder"] = {
        **{k: v for k, v in p.items() if k != "iteration"},
        "iteration_0": p["iteration"],
        "iteration_1": p["iteration"],
    }
    out_unroll = m_unroll.apply({**params, "params": up}, batch)
    for k in out_scan:
        np.testing.assert_allclose(np.asarray(out_scan[k]),
                                   np.asarray(out_unroll[k]), atol=1e-5,
                                   err_msg=k)


def test_dropout_rng_changes_output():
    model = tiny_model(dropout_rate=0.5)
    batch = tiny_batch(B=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    o1 = model.apply(params, batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1["pred_logits"]),
                           np.asarray(o2["pred_logits"]))
    # deterministic mode is reproducible
    o3 = model.apply(params, batch, deterministic=True)
    o4 = model.apply(params, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(o3["pred_logits"]),
                               np.asarray(o4["pred_logits"]))


def test_gradients_flow():
    model = tiny_model(dropout_rate=0.0)
    batch = tiny_batch(B=1)
    variables = model.init(jax.random.PRNGKey(0), batch)
    params, frozen = variables["params"], variables["frozen"]

    def loss_fn(params):
        out = model.apply({"params": params, "frozen": frozen}, batch)
        return (jnp.sum(out["center_unnormalized"] ** 2)
                + jnp.sum(out["pred_logits"] ** 2) * 1e-3)

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
    # refpoint embedding receives gradient (first-iteration path)
    rp = g["box3d_decoder"]["refpoint"]
    assert float(jnp.abs(rp).sum()) > 0
