"""Fused FPN tail (upsample + concat + rayPE add in one Pallas pass)
vs the reference XLA chain — values, bit-exact phase upsample, grads,
and the model-level gate."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parq_tpu.kernels.fpn_concat_pallas import (
    _phase_upsample_2d, fpn_tail_concat, resize_level3_separable)
from parq_tpu.models.resnet_fpn import upsample_linear


def _inputs(rng, B=2, T=3, h=16, w=24, C=128, dtype=np.float32):
    c0 = jnp.asarray(rng.randn(B * T, h, w, C).astype(dtype))
    c1 = jnp.asarray(rng.randn(B * T, h // 2, w // 2, C).astype(dtype))
    c2 = jnp.asarray(rng.randn(B * T, h // 4, w // 4, C).astype(dtype))
    c3 = jnp.asarray(rng.randn(B * T, 3, 4, C).astype(dtype))  # 16/3 ratio
    enc = jnp.asarray(rng.randn(B, T, h, w, 4 * C).astype(dtype))
    return c0, c1, c2, c3, enc


def _reference(c0, c1, c2, c3, enc):
    B, T, h, w, C4 = enc.shape
    levels = [upsample_linear(p, h, w) for p in (c0, c1, c2, c3)]
    return jnp.concatenate(levels, -1).reshape(B, T, h, w, C4) + enc


def test_fused_tail_matches_xla_chain(rng):
    c0, c1, c2, c3, enc = _inputs(rng)
    B, T, h, w = enc.shape[:4]
    ref = _reference(c0, c1, c2, c3, enc)
    u3 = resize_level3_separable(c3, h, w)
    got = fpn_tail_concat(c0, c1, c2, u3, enc, B, T, True)
    # levels 0-2 + enc are bit-identical; level 3's separable-matmul
    # resize vs jax.image.resize differs only in f32 summation order
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_phase_upsample_bitexact_vs_interleave(rng):
    """The kernel's repeat+roll phase form must be BIT-identical to
    resnet_fpn's stack+reshape interleave (same taps, same dtype)."""
    x2 = jnp.asarray(rng.randn(1, 8, 12, 64).astype(np.float32))
    up2 = _phase_upsample_2d(x2[0], 2, kernel=False)
    assert bool((up2 == upsample_linear(x2, 16, 24)[0]).all())
    up4 = _phase_upsample_2d(x2[0], 4, kernel=False)
    assert bool((up4 == upsample_linear(x2, 32, 48)[0]).all())


def test_fused_tail_grads_match_xla_chain(rng):
    c0, c1, c2, c3, enc = _inputs(rng, B=1, T=2, h=8, w=8, C=32)
    B, T, h, w = enc.shape[:4]

    def loss_fused(c0, c1, c2, c3, enc):
        u3 = resize_level3_separable(c3, h, w)
        out = fpn_tail_concat(c0, c1, c2, u3, enc, B, T, True)
        return jnp.sum(out ** 2 * 0.1)

    def loss_ref(c0, c1, c2, c3, enc):
        return jnp.sum(_reference(c0, c1, c2, c3, enc) ** 2 * 0.1)

    gk = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(c0, c1, c2, c3, enc)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(c0, c1, c2, c3, enc)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_model_gate_fused_vs_xla(rng, monkeypatch):
    """Full PARQ forward with PARQ_FPN_FUSED on vs off (bf16 so the gate
    opens; interpret-mode kernel on CPU) — same detections."""
    from test_model_forward import tiny_batch, tiny_model

    model = tiny_model(image_size=(32, 32),
                       compute_dtype="bfloat16", dropout_rate=0.0)
    batch = tiny_batch(B=1, T=2, H=32, W=32)
    params = model.init(jax.random.PRNGKey(0), batch)

    monkeypatch.setenv("PARQ_FPN_FUSED", "0")
    ref = model.apply(params, batch)
    monkeypatch.setenv("PARQ_FPN_FUSED", "force")  # off-TPU: interpret
    got = model.apply(params, batch)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(ref[k], np.float32),
                                   atol=5e-2, rtol=5e-2,
                                   err_msg=f"output {k}")
