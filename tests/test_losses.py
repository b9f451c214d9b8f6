"""Set-loss tests: target parsing, perfect-prediction minimum, symmetry
resolution, grad flow, empty-target handling."""
import numpy as np
import jax
import jax.numpy as jnp

from parq_tpu.geometry import Obb3D, Pose, pad_obbs_np, rot_to_6d, roty
from parq_tpu.losses import parse_targets, set_loss


def make_targets(rng, B=2, K=10, n_valid=3):
    boxes = []
    for b in range(B):
        bb3 = np.stack([
            np.stack([-rng.rand(3) - 0.2, rng.rand(3) + 0.2], -1).reshape(6)
            for _ in range(n_valid)])
        Rt = np.broadcast_to(np.eye(3).reshape(9), (n_valid, 9))
        t = rng.randn(n_valid, 3).astype(np.float64)
        pose = np.concatenate([Rt, t], -1)
        sem = rng.randint(0, 9, n_valid).astype(np.float64)
        boxes.append(pad_obbs_np(bb3, pose, sem, max_box=K))
    obbs = Obb3D(jnp.asarray(np.stack(boxes), jnp.float32))
    Twl = Pose.identity((B, 1))
    sym = jnp.zeros((B, 50), jnp.int32)
    return obbs, Twl, sym


def test_parse_targets_masks_and_transforms(rng):
    obbs, Twl, sym = make_targets(rng, B=2, K=10, n_valid=3)
    t = parse_targets(obbs, Twl, sym)
    assert t.valid.shape == (2, 10)
    assert bool(t.valid[:, :3].all()) and not bool(t.valid[:, 3:].any())
    assert np.all(np.asarray(t.labels)[:, 3:] == -1)
    # identity local frame: center_local == box center + translation
    c_obj = np.asarray(obbs.bb3_center_object)
    tr = np.asarray(obbs.T_world_object.t)
    np.testing.assert_allclose(np.asarray(t.center)[:, :3],
                               (c_obj + tr)[:, :3], atol=1e-5)


def perfect_outputs(t, L=2, Q=16, num_semcls=9):
    """Construct predictions that exactly hit the first n_valid targets."""
    B, K = t.labels.shape
    logits = np.full((L, B, Q, num_semcls + 1), -10.0, np.float32)
    logits[..., num_semcls] = 10.0  # default: background
    center = np.zeros((L, B, Q, 3), np.float32)
    size = np.ones((L, B, Q, 3), np.float32)
    o6d = np.tile(rot_to_6d(jnp.eye(3))[None, None, None], (L, B, Q, 1))
    coord = np.full((L, B, Q, 3), 50.0, np.float32)  # far from everything
    lab = np.asarray(t.labels)
    for b in range(B):
        for k in range(K):
            if not bool(t.valid[b, k]):
                continue
            q = k  # use query k for target k
            logits[:, b, q] = -10.0
            logits[:, b, q, lab[b, k]] = 10.0
            center[:, b, q] = np.asarray(t.center[b, k])
            size[:, b, q] = np.asarray(t.size[b, k])
            coord[:, b, q] = np.asarray(t.center[b, k])  # ref point on target
    return {
        "pred_logits": jnp.asarray(logits),
        "center_unnormalized": jnp.asarray(center),
        "size_unnormalized": jnp.asarray(size),
        "ortho6d": jnp.asarray(np.asarray(o6d, np.float32)),
        "coord_pos": jnp.asarray(coord),
    }


def test_perfect_prediction_small_loss(rng):
    obbs, Twl, sym = make_targets(rng, B=2, K=8, n_valid=3)
    t = parse_targets(obbs, Twl, sym)
    out = perfect_outputs(t)
    # size in perfect_outputs is ones; set to true sizes
    loss = set_loss(out, t, jax.random.PRNGKey(0))
    # center/rot/cat should be ~0; size is off (ones vs true) so nonzero
    assert float(loss["center_loss"]) < 1e-4
    assert float(loss["rot_loss"]) < 1e-6
    assert float(loss["cat_loss"]) < 1e-3
    assert float(loss["valid_bs"]) == 2 * 2  # L * B


def test_symmetry_reduces_rot_loss(rng):
    """A prediction rotated 180° about y must incur ~0 rot loss for a
    two-fold-symmetric object but a large one for sym=none."""
    obbs, Twl, _ = make_targets(rng, B=1, K=4, n_valid=1)
    for s, expect_small in [(0, False), (1, True)]:
        sym = jnp.full((1, 50), s, jnp.int32)
        t = parse_targets(obbs, Twl, sym)
        out = perfect_outputs(t, L=1)
        R180 = roty(jnp.pi)
        out["ortho6d"] = jnp.asarray(
            np.tile(np.asarray(rot_to_6d(R180), np.float32)[None, None, None],
                    (1, 1, out["ortho6d"].shape[2], 1)))
        loss = set_loss(out, t, jax.random.PRNGKey(0))
        r = float(loss["rot_loss"])
        if expect_small:
            assert r < 1e-6, r
        else:
            assert r > 0.5, r


def test_empty_targets_zero_loss():
    B, K, L, Q = 2, 8, 2, 16
    obbs = Obb3D(-jnp.ones((B, K, 19)))
    t = parse_targets(obbs, Pose.identity((B, 1)), jnp.zeros((B, 50), jnp.int32))
    out = {
        "pred_logits": jnp.zeros((L, B, Q, 10)),
        "center_unnormalized": jnp.zeros((L, B, Q, 3)),
        "size_unnormalized": jnp.ones((L, B, Q, 3)),
        "ortho6d": jnp.tile(rot_to_6d(jnp.eye(3))[None, None, None],
                            (L, B, Q, 1)),
        "coord_pos": jnp.zeros((L, B, Q, 3)),
    }
    loss = set_loss(out, t, jax.random.PRNGKey(0))
    assert float(loss["total_loss"]) == 0.0
    assert float(loss["valid_bs"]) == 0.0


def test_loss_gradients_finite(rng):
    obbs, Twl, sym = make_targets(rng, B=1, K=6, n_valid=2)
    t = parse_targets(obbs, Twl, sym)
    out = perfect_outputs(t, L=1, Q=8)

    def f(center):
        o = dict(out)
        o["center_unnormalized"] = center
        return set_loss(o, t, jax.random.PRNGKey(0))["total_loss"]

    g = jax.grad(f)(out["center_unnormalized"] + 0.1)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0
