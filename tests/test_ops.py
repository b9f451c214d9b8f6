"""Ops parity tests: grid_sample vs torch, posemb vs reference formula,
LAP vs scipy, pixel-aligned sampling semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parq_tpu.ops.grid_sample import grid_sample_bilinear
from parq_tpu.ops.posemb import pos2posemb3d
from parq_tpu.ops.hungarian import solve_lap, match_single
from parq_tpu.ops.pixel_align import pixel_aligned_features
from parq_tpu.geometry import Camera, Pose


def test_grid_sample_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    N, H, W, C, P = 3, 7, 9, 5, 32
    feats = rng.randn(N, H, W, C).astype(np.float32)
    # grid includes out-of-bounds points to exercise zeros padding
    grid = (rng.rand(N, P, 2).astype(np.float32) * 3.0 - 1.5)

    got = np.asarray(grid_sample_bilinear(jnp.asarray(feats), jnp.asarray(grid)))

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(grid).view(N, 1, P, 2)
    expect = F.grid_sample(t_feats, t_grid, mode="bilinear",
                           padding_mode="zeros", align_corners=True)
    expect = expect.view(N, C, P).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_posemb_matches_reference_formula(rng):
    torch = pytest.importorskip("torch")
    import math

    pos = rng.rand(2, 6, 3).astype(np.float32)

    # torch oracle re-derived from ref transformer_parq.py:45-64
    def oracle(pos):
        pos = torch.from_numpy(pos) * (2 * math.pi)
        num, temp = 128, 10000
        dim_t = torch.arange(num, dtype=torch.float32)
        dim_t = temp ** (2 * (dim_t // 2) / num)
        outs = []
        for i in [1, 0, 2]:  # y, x, z order
            p = pos[..., i, None] / dim_t
            p = torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()),
                            dim=-1).flatten(-2)
            outs.append(p)
        return torch.cat(outs, dim=-1).numpy()

    got = np.asarray(pos2posemb3d(jnp.asarray(pos)))
    np.testing.assert_allclose(got, oracle(pos), atol=1e-5)


def test_solve_lap_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    for K, Q in [(5, 8), (10, 10), (32, 64), (1, 4)]:
        cost = rng.rand(K, Q).astype(np.float32)
        col4row = np.asarray(solve_lap(jnp.asarray(cost)))
        r, c = linear_sum_assignment(cost)
        # optimal costs must agree (assignments may differ on ties)
        got_cost = cost[np.arange(K), col4row].sum()
        exp_cost = cost[r, c].sum()
        assert len(set(col4row.tolist())) == K, "columns must be distinct"
        np.testing.assert_allclose(got_cost, exp_cost, rtol=1e-5)


def test_solve_lap_large_parity(rng):
    from scipy.optimize import linear_sum_assignment
    K, Q = 100, 256
    cost = rng.rand(K, Q).astype(np.float32)
    col4row = np.asarray(solve_lap(jnp.asarray(cost)))
    r, c = linear_sum_assignment(cost)
    np.testing.assert_allclose(cost[np.arange(K), col4row].sum(),
                               cost[r, c].sum(), rtol=1e-5)


def test_match_single_hungarian_parity_with_scipy(rng):
    """Masked on-device matcher reproduces scipy LSA on the same cost."""
    from scipy.optimize import linear_sum_assignment

    Q, K, C = 32, 10, 9
    n_valid = 6
    logits = rng.randn(Q, C + 1).astype(np.float32)
    coord = rng.rand(Q, 3).astype(np.float32)
    labels = np.full(K, -1, np.int32)
    labels[:n_valid] = rng.randint(0, C, n_valid)
    centers = np.zeros((K, 3), np.float32)
    centers[:n_valid] = rng.rand(n_valid, 3) * 4  # far: little proximity
    valid = np.arange(K) < n_valid

    res = match_single(jnp.asarray(logits), jnp.asarray(coord),
                       jnp.asarray(labels), jnp.asarray(centers),
                       jnp.asarray(valid), jax.random.PRNGKey(0))

    # scipy oracle on the unpadded cost (ref matcher formula)
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)
    prob = softmax(logits)
    c_cls = -prob[:, labels[:n_valid]]
    c_bb = np.abs(coord[:, None] - centers[None, :n_valid]).sum(-1)
    cost = 0.25 * c_bb + 2.0 * c_cls
    r, c = linear_sum_assignment(cost)

    assign = np.asarray(res.assign)
    hung = np.asarray(res.is_hungarian)
    # every valid target is matched by exactly one hungarian query
    got_pairs = {(q, assign[q]) for q in range(Q) if hung[q]}
    exp_pairs = set(zip(r.tolist(), c.tolist()))
    got_cost = sum(cost[q, t] for q, t in got_pairs)
    exp_cost = sum(cost[q, t] for q, t in exp_pairs)
    assert len(got_pairs) == n_valid
    np.testing.assert_allclose(got_cost, exp_cost, rtol=1e-4)


def test_match_single_proximity_and_punish(rng):
    """Queries whose ref point is within L1<0.2 of a GT get matched too;
    over-cap ones get punished out of CE."""
    Q, K, C = 40, 4, 9
    logits = np.zeros((Q, C + 1), np.float32)
    coord = np.zeros((Q, 3), np.float32)
    coord[:, 0] = np.linspace(0, 3, Q)  # spread along x
    labels = np.array([0, -1, -1, -1], np.int32)
    centers = np.zeros((K, 3), np.float32)  # GT at origin
    valid = np.array([True, False, False, False])

    res = match_single(jnp.asarray(logits), jnp.asarray(coord),
                       jnp.asarray(labels), jnp.asarray(centers),
                       jnp.asarray(valid), jax.random.PRNGKey(1))
    assign = np.asarray(res.assign)
    inside = np.abs(coord).sum(-1) < 0.2
    # every assigned query is inside the sphere or the hungarian match
    n_assigned = (assign == 0).sum()
    # cap: hungarian 1 + up to 10 proximity
    assert n_assigned <= 11
    assert n_assigned >= min(inside.sum(), 10)
    # punished-out queries are inside but unassigned
    punish = np.asarray(res.punish_mask)
    silenced = ~punish
    assert np.all(inside[silenced])
    assert np.all(assign[silenced] == -1)


def test_match_single_pad_rows_do_not_clobber_last_query(rng):
    """Regression (round-1 verdict Weak #2): pad LAP rows return
    col4row == −1, and jax wraps −1 even under scatter mode='drop', so
    they used to overwrite query Q−1's Hungarian match with −1. Force
    target 0 onto the last query with pad rows present and demand the
    match survives as a *Hungarian* match (proximity rescue would set
    assign but leave is_hungarian False, masking the bug)."""
    Q, K, C = 16, 10, 9
    n_valid = 2
    logits = np.zeros((Q, C + 1), np.float32)   # uniform class cost
    coord = np.full((Q, 3), 5.0, np.float32)
    coord[Q - 1] = [0.0, 0.0, 0.0]   # exact hit on target 0
    coord[0] = [2.0, 2.0, 2.0]       # exact hit on target 1
    labels = np.full(K, -1, np.int32)
    labels[:n_valid] = [0, 1]
    centers = np.full((K, 3), 99.0, np.float32)
    centers[0] = [0.0, 0.0, 0.0]
    centers[1] = [2.0, 2.0, 2.0]
    valid = np.arange(K) < n_valid

    res = match_single(jnp.asarray(logits), jnp.asarray(coord),
                       jnp.asarray(labels), jnp.asarray(centers),
                       jnp.asarray(valid), jax.random.PRNGKey(3))
    assign = np.asarray(res.assign)
    hung = np.asarray(res.is_hungarian)
    assert hung[Q - 1] and assign[Q - 1] == 0, (assign[Q - 1], hung[Q - 1])
    assert hung[0] and assign[0] == 1
    # exactly the two valid targets carry Hungarian matches
    assert hung.sum() == n_valid


def test_match_single_no_targets(rng):
    Q, K, C = 8, 4, 9
    res = match_single(jnp.zeros((Q, C + 1)), jnp.zeros((Q, 3)),
                       jnp.full((K,), -1, jnp.int32), jnp.zeros((K, 3)),
                       jnp.zeros((K,), bool), jax.random.PRNGKey(0))
    assert not np.any(np.asarray(res.assign) >= 0)
    assert np.all(np.asarray(res.punish_mask))


def test_pixel_aligned_features_semantics(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, T, H, W, C, Qn = 2, 3, 6, 8, 4, 5
    feats = rng.randn(B, T, H, W, C).astype(np.float32)
    cam = Camera(jnp.broadcast_to(
        Camera.from_params(float(W), float(H), 4.0, 4.0, W / 2, H / 2).data,
        (B, T, 6)))
    # camera at identity: local == camera frame
    T_cam_local = Pose.identity((B, T))
    qpos = (rng.rand(B, Qn, 3).astype(np.float32) - 0.5) * np.array(
        [2, 2, 1], np.float32) + np.array([0, 0, 2], np.float32)

    got, center_im, valid = pixel_aligned_features(
        jnp.asarray(feats), jnp.asarray(qpos), T_cam_local, cam, (W, H))

    # torch oracle mirroring ref transformer_parq.py:129-161
    q = torch.from_numpy(qpos)
    p2d = q[..., :2] / q[..., 2:].clamp(min=1e-3) * 4.0 + torch.tensor([W / 2, H / 2])
    tvalid = ((q[..., 2] > 1e-3)
              & (p2d[..., 0] >= 0) & (p2d[..., 0] <= W - 1)
              & (p2d[..., 1] >= 0) & (p2d[..., 1] <= H - 1))
    grid = torch.stack([2 * p2d[..., 0] / (W - 1) - 1,
                        2 * p2d[..., 1] / (H - 1) - 1], dim=-1)
    mem = torch.from_numpy(feats).permute(0, 1, 4, 2, 3).reshape(B * T, C, H, W)
    g = grid[:, None].expand(B, T, Qn, 2).reshape(B * T, 1, Qn, 2)
    s = F.grid_sample(mem, g, padding_mode="zeros", align_corners=True)
    s = s.view(B, T, C, Qn).permute(0, 1, 3, 2)  # B T Q C
    summed = s.sum(1)
    cnt = tvalid[:, None].expand(B, T, Qn).float().sum(1) if False else None
    cnt = tvalid.float()[:, None].expand(B, T, Qn).sum(1)
    cnt = torch.where(cnt == 0, torch.ones_like(cnt), cnt)
    expect = (summed / cnt[..., None]).numpy()

    np.testing.assert_allclose(got, expect, atol=1e-5)
    # valid mask: every view identical here
    np.testing.assert_array_equal(np.asarray(valid)[:, 0], tvalid.numpy())


def test_match_single_more_targets_than_queries(rng):
    """K > Q (static): the transposed solve must pick the optimal target
    SUBSET over all valid targets, exactly like scipy's LSA of the (Q, G)
    matrix (not just the first Q targets)."""
    import jax
    from scipy.optimize import linear_sum_assignment
    Q, K, C = 16, 24, 9
    for n_valid in (20, 24, 5):
        logits = rng.randn(Q, C + 1).astype(np.float32)
        coord = rng.uniform(-3, 3, (Q, 3)).astype(np.float32)
        center = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
        labels = rng.randint(0, C, (K,)).astype(np.int32)
        valid = np.arange(K) < n_valid
        res = match_single(jnp.asarray(logits), jnp.asarray(coord),
                           jnp.asarray(labels), jnp.asarray(center),
                           jnp.asarray(valid), jax.random.PRNGKey(0))
        assign = np.asarray(res.assign)
        hung = np.asarray(res.is_hungarian)

        prob = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        c_bbox = np.abs(coord[:, None] - center[None]).sum(-1)
        cost = 0.25 * c_bbox + 2.0 * (-prob[:, labels])
        rows, cols = linear_sum_assignment(cost[:, :n_valid])
        expected = {r: c for r, c in zip(rows, cols)}
        got = {q: int(assign[q]) for q in range(Q) if hung[q]}
        assert got == expected, (n_valid, got, expected)
