"""fused_detection_heads == the four separate HeadMLP applications,
bitwise (concatenated-kernel matmul columns are independent dots; the
block-diagonal layers add exact zeros; per-head GN statistics stay
separate). Ref heads: model/parq_decoder.py:84-132."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from parq_tpu.models.mlp import HeadMLP, fused_detection_heads

B, N, D, S = 2, 24, 32, 10


class _Separate(nn.Module):
    n_groups: int = 1

    @nn.compact
    def __call__(self, x):
        g = self.n_groups
        return (
            HeadMLP((D, D), 3, name="center_head")(x, n_groups=g),
            HeadMLP((), S, name="sem_cls_head")(x),
            HeadMLP((), 3, name="size_head")(x),
            HeadMLP((D, D), 6, name="rotation_head")(x, n_groups=g),
        )


class _Fused(nn.Module):
    n_groups: int = 1

    @nn.compact
    def __call__(self, x):
        c, l, s, r = fused_detection_heads(
            x,
            HeadMLP((D, D), 3, in_features=D, name="center_head")(),
            HeadMLP((D, D), 6, in_features=D, name="rotation_head")(),
            HeadMLP((), S, in_features=D, name="sem_cls_head")(),
            HeadMLP((), 3, in_features=D, name="size_head")(),
            dtype=jnp.float32, n_groups=self.n_groups)
        return c, l, s, r


@pytest.mark.parametrize("n_groups", [1, 4])
def test_fused_heads_bitwise(rng, n_groups):
    x = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    sep, fus = _Separate(n_groups), _Fused(n_groups)
    params = sep.init(jax.random.PRNGKey(0), x)
    # identical param trees (same names/shapes) → directly reusable
    params2 = fus.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    a = sep.apply(params, x)
    b = fus.apply(params, x)
    for got, want, name in zip(b, a, ["center", "logits", "size", "ortho6d"]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=name)


def test_fused_heads_grads_match(rng):
    x = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    sep, fus = _Separate(), _Fused()
    params = sep.init(jax.random.PRNGKey(0), x)

    def loss(m, p):
        outs = m.apply(p, x)
        return sum(jnp.sum(o ** 2) for o in outs)

    g1 = jax.grad(lambda p: loss(sep, p))(params)
    g2 = jax.grad(lambda p: loss(fus, p))(params)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g1),
                            jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_fused_heads_batched_l2_matches(rng, monkeypatch):
    """PARQ_HEADS_L2=batched (k-batched dot_general layer 2 — the r5 form
    that dodges XLA's slow 1x2-conv rewrite of the block-diagonal matmul)
    computes the same heads as the blockdiag form; partial-sum grouping
    differs, so tolerance not bitwise."""
    x = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    fus = _Fused()
    params = fus.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("PARQ_HEADS_L2", "blockdiag")
    a = jax.jit(lambda p: fus.apply(p, x))(params)
    monkeypatch.setenv("PARQ_HEADS_L2", "batched")
    b = jax.jit(lambda p: fus.apply(p, x))(params)
    for got, want, name in zip(b, a, ["center", "logits", "size", "ortho6d"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5, err_msg=name)
