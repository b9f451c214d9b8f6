"""Batched-gradient decoder path (fold L iterations into the query axis)
== the sequential scan path, in outputs AND gradients, with and without
dropout. The fold is legal because the recurrence carry is stop_gradient-ed
(ref detaches new reference points, model/transformer_parq.py:331); dropout
draws are bit-identical by construction (per-iteration keys, grouped
draws)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parq_tpu.geometry import Camera, Pose
from parq_tpu.models.decoder import PARQDecoder

B, T, H, W, C = 2, 2, 4, 8, 32
L, Q = 3, 8


def _scene(rng):
    mem = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32))
    cam = Camera(jnp.broadcast_to(
        Camera.from_params(float(W), float(H), 4.0, 4.0, W / 2, H / 2).data,
        (B, T, 6)))
    eye = jnp.concatenate([jnp.eye(3).reshape(9), jnp.zeros(3)])
    Tcp = Pose(jnp.broadcast_to(eye, (B, T, 12)))
    Twp = Pose(jnp.broadcast_to(eye, (B, T, 12)))
    Twl = Pose(jnp.broadcast_to(eye, (B, 1, 12)))
    return mem, cam, Tcp, Twp, Twl


def _decoder(batched: bool, rate: float) -> PARQDecoder:
    return PARQDecoder(dim=C, heads=2, ffn_dim=16, num_layers=L,
                       dropout_rate=rate, num_queries=Q, num_semcls=3,
                       feat_size=(W, H), batched_grad=batched,
                       use_flash=False)


def _outputs(m, params, scene, key):
    mem, cam, Tcp, Twp, Twl = scene
    rngs = {"dropout": key} if key is not None else None
    return m.apply(params, mem, cam, Tcp, Twp, Twl, deterministic=False,
                   rngs=rngs)


def test_batched_outputs_match_scan(rng):
    scene = _scene(rng)
    m_scan, m_bat = _decoder(False, 0.0), _decoder(True, 0.0)
    params = m_scan.init(jax.random.PRNGKey(0), *scene, deterministic=False)
    o1 = _outputs(m_scan, params, scene, None)
    o2 = _outputs(m_bat, params, scene, None)
    assert set(o1) == set(o2)
    for k in o1:
        assert o1[k].shape == o2[k].shape, k
        np.testing.assert_allclose(np.asarray(o1[k], np.float32),
                                   np.asarray(o2[k], np.float32),
                                   atol=1e-4, err_msg=k)


def test_batched_outputs_match_scan_with_dropout(rng):
    """Same dropout rng → identical realizations in both paths (the grouped
    per-iteration draws are the contract the fold depends on)."""
    scene = _scene(rng)
    key = jax.random.PRNGKey(7)
    m_scan, m_bat = _decoder(False, 0.4), _decoder(True, 0.4)
    params = m_scan.init({"params": jax.random.PRNGKey(0), "dropout": key},
                         *scene, deterministic=False)
    o1 = _outputs(m_scan, params, scene, key)
    o2 = _outputs(m_bat, params, scene, key)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k], np.float32),
                                   np.asarray(o2[k], np.float32),
                                   atol=1e-4, err_msg=k)
    # and dropout is actually live: a different key changes the outputs
    o3 = _outputs(m_bat, params, scene, jax.random.PRNGKey(8))
    assert float(jnp.abs(o3["pred_logits"] - o2["pred_logits"]).max()) > 1e-3


@pytest.mark.slow
def test_batched_grads_match_scan(rng):
    scene = _scene(rng)
    key = jax.random.PRNGKey(7)
    m_scan, m_bat = _decoder(False, 0.4), _decoder(True, 0.4)
    params = m_scan.init({"params": jax.random.PRNGKey(0), "dropout": key},
                         *scene, deterministic=False)
    mem = scene[0]

    def loss(m, p, mem_):
        out = m.apply(p, mem_, *scene[1:], deterministic=False,
                      rngs={"dropout": key})
        return sum(jnp.sum(out[k] ** 2) for k in
                   ("pred_logits", "center_unnormalized", "ortho6d",
                    "size_unnormalized"))

    g1 = jax.grad(lambda p, m_: loss(m_scan, p, m_), argnums=(0, 1))(
        params, mem)
    g2 = jax.grad(lambda p, m_: loss(m_bat, p, m_), argnums=(0, 1))(
        params, mem)

    # d(memory): the big broadcast cotangent the fold restructures
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=2e-2, rtol=1e-4)
    # params: compare by norm (elementwise bias grads of softmax inputs
    # cancel to ~0 and have no stable relative error)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g1[0]),
                            jax.tree_util.tree_leaves(g2[0])):
        na = float(jnp.linalg.norm(a))
        nd = float(jnp.linalg.norm(a - b))
        assert nd <= 1e-4 * max(na, 1.0) + 1e-3, \
            f"{jax.tree_util.keystr(path)}: |Δ|={nd} vs |g|={na}"


def test_batched_grad_gate_respects_remat_and_unshared(rng):
    """remat / unshared-weights configs fall back to the scan path and stay
    functional (the batched fold requires shared weights, no remat)."""
    scene = _scene(rng)
    m = PARQDecoder(dim=C, heads=2, ffn_dim=16, num_layers=2,
                    dropout_rate=0.0, num_queries=Q, num_semcls=3,
                    feat_size=(W, H), batched_grad=True, remat=True,
                    use_flash=False)
    params = m.init(jax.random.PRNGKey(0), *scene, deterministic=False)
    out = m.apply(params, *scene, deterministic=False)
    assert out["pred_logits"].shape == (2, B, Q, 4)


@pytest.mark.slow
def test_batched_grad_with_forced_kernels(rng):
    """Batched path with the REAL kernel stack (flash attention + fast
    sampler, interpret mode) and phase-1 aux reuse: outputs and gradients
    == the scan path with the same kernels."""
    scene = _scene(rng)
    key = jax.random.PRNGKey(3)
    C2 = 256  # head_dim must be a lane multiple for the flash gate

    def dec(batched):
        return PARQDecoder(dim=C2, heads=2, ffn_dim=16, num_layers=L,
                           dropout_rate=0.3, num_queries=Q, num_semcls=3,
                           feat_size=(W, H), batched_grad=batched,
                           use_flash=True, force_kernels=True)

    mem = jnp.asarray(np.random.RandomState(1).randn(
        B, T, H, W, C2).astype(np.float32))
    scene = (mem,) + scene[1:]
    m1, m2 = dec(False), dec(True)
    params = m1.init({"params": jax.random.PRNGKey(0), "dropout": key},
                     *scene, deterministic=False)
    o1 = _outputs(m1, params, scene, key)
    o2 = _outputs(m2, params, scene, key)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k], np.float32),
                                   np.asarray(o2[k], np.float32),
                                   atol=2e-4, err_msg=k)

    def loss(m, p, mem_):
        out = m.apply(p, mem_, *scene[1:], deterministic=False,
                      rngs={"dropout": key})
        return sum(jnp.sum(out[k] ** 2) for k in
                   ("pred_logits", "center_unnormalized", "ortho6d",
                    "size_unnormalized"))

    g1 = jax.grad(lambda p, m_: loss(m1, p, m_), argnums=(0, 1))(params, mem)
    g2 = jax.grad(lambda p, m_: loss(m2, p, m_), argnums=(0, 1))(params, mem)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=5e-2, rtol=1e-4)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g1[0]),
                            jax.tree_util.tree_leaves(g2[0])):
        na = float(jnp.linalg.norm(a))
        nd = float(jnp.linalg.norm(a - b))
        assert nd <= 2e-4 * max(na, 1.0) + 1e-3, \
            f"{jax.tree_util.keystr(path)}: |Δ|={nd} vs |g|={na}"


def test_eval_kv_fused_matches_separate_projections(rng):
    """Deterministic forced-kernel path uses the FUSED K/V projection (one
    (C, 2·H·D) matmul, flash kernel reads lane-offset blocks): outputs ==
    the no-flash decoder with identical params."""
    scene = _scene(rng)
    C2 = 256  # head_dim must be a lane multiple for the flash gate

    def dec(use_flash):
        return PARQDecoder(dim=C2, heads=2, ffn_dim=16, num_layers=L,
                           dropout_rate=0.0, num_queries=Q, num_semcls=3,
                           feat_size=(W, H), use_flash=use_flash,
                           force_kernels=use_flash)

    mem = jnp.asarray(np.random.RandomState(2).randn(
        B, T, H, W, C2).astype(np.float32))
    scene = (mem,) + scene[1:]
    m_ref, m_fused = dec(False), dec(True)
    params = m_ref.init(jax.random.PRNGKey(0), *scene, deterministic=True)
    o1 = m_ref.apply(params, *scene, deterministic=True)
    o2 = m_fused.apply(params, *scene, deterministic=True)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k], np.float32),
                                   np.asarray(o2[k], np.float32),
                                   atol=2e-4, err_msg=k)
