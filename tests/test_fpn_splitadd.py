"""The split-add FPN tail (PARQ_FPN_SPLITADD: the rayPE add folded into
the concat's operands, models/resnet_fpn.py) computes the same math as
`concat(up(levels)) + encoding` (elementwise add commutes with
slice-aligned concat). NOT bit-exact under jit: XLA fuses the moved add
into the upsample's FMA chain with different contraction — observed
deltas are ~1e-6 relative. Outputs and gradients must agree to that
float-fusion tolerance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def tiny_model():
    from parq_tpu.models import PARQModel
    return PARQModel(
        resnet_name="resnet18", image_size=(64, 48), num_samples=8,
        fpn_channels=8, tokenizer_out_channels=32, dec_dim=32,
        dec_heads=4, dec_ffn_dim=16, dec_layers=2, num_queries=8,
        num_semcls=9, dropout_rate=0.0)


def _batch(model, n=2):
    from parq_tpu.data.synthetic import device_batch, make_batch
    return device_batch(make_batch(list(range(n)),
                                   image_size=model.image_size))


def test_splitadd_value_exact_fwd(tiny_model, monkeypatch):
    batch = _batch(tiny_model)
    params = tiny_model.init(jax.random.PRNGKey(0), batch)

    monkeypatch.setenv("PARQ_FPN_SPLITADD", "0")
    plain = jax.jit(lambda b: tiny_model.apply(params, b))(batch)
    monkeypatch.setenv("PARQ_FPN_SPLITADD", "1")
    split = jax.jit(lambda b: tiny_model.apply(params, b))(batch)

    for k in plain:
        np.testing.assert_allclose(np.asarray(plain[k], np.float32),
                                   np.asarray(split[k], np.float32),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def test_splitadd_value_exact_grads(tiny_model, monkeypatch):
    batch = _batch(tiny_model)
    params = tiny_model.init(jax.random.PRNGKey(0), batch)

    def loss(p, b):
        out = tiny_model.apply(p, b)
        return sum(jnp.sum(jnp.square(v.astype(jnp.float32)))
                   for v in out.values())

    monkeypatch.setenv("PARQ_FPN_SPLITADD", "0")
    g_plain = jax.jit(jax.grad(loss))(params, batch)
    monkeypatch.setenv("PARQ_FPN_SPLITADD", "1")
    g_split = jax.jit(jax.grad(loss))(params, batch)

    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_split)
    for (kp, vp), (_, vs) in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vs),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(kp))
