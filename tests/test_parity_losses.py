"""Torch-oracle numerical parity for the TRAINING OBJECTIVE (matcher + set
loss) — VERDICT r2 "Next round" #1.

The oracle below is a faithful torch/scipy re-implementation of the
reference's loss stack:

- ``oracle_match``   = utils/matcher.py:51-115  (HungarianMatcherModified,
  including the per-GT punish-mask rebuild and the np.random.choice cap)
- ``oracle_loss``    = model/parq_decoder.py:264-370 (per-(iteration,sample)
  component means, weighted sums, valid_bs normalization, punish-mask CE)
- ``oracle_rot_sym`` = model/parq_decoder.py:205-262
- ``oracle_o6d``     = utils/ortho6d_transforms.py:54-68

Both sides run on IDENTICAL random outputs/targets; every loss component
must agree to ~1e-5. The two documented divergences (DIVERGENCES.md #1) are
asserted as EXPLICIT deltas, not waved through:

1. punish mask: the reference only keeps the LAST GT's cap mask (and none
   of the LAP info); ours silences exactly the capped-out, unmatched
   queries of every GT.
2. zero-GT samples: the reference takes ``len(bool_mask) != 0`` (always Q)
   as "has matches", producing NaN means and then an IndexError on the
   misaligned punish list; ours treats the pair as no-match (zero loss,
   not counted in valid_bs).
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from parq_tpu.losses import set_loss
from parq_tpu.losses.set_loss import Targets
from parq_tpu.ops.hungarian import match_batch

Wt = (5.0, 5.0, 5.0, 1.0)          # ref config/default.py:98
NUM_SEMCLS = 9
COST_CLASS, COST_BBOX = 2.0, 0.25  # ref parq_decoder.py:71
RATIO, MAX_PAD = 0.2, 10


# ---------------------------------------------------------------- oracle --
def oracle_o6d(o6d: torch.Tensor) -> torch.Tensor:
    """ref utils/ortho6d_transforms.py:54-68 (exact, incl. the 1e-8 clamp)."""
    x_raw, y_raw = o6d[:, 0:3], o6d[:, 3:6]

    def norm(v):
        mag = torch.clamp(torch.sqrt(v.pow(2).sum(1)), min=1e-8)
        return v / mag[:, None]

    x = norm(x_raw)
    z = norm(torch.cross(x, y_raw, dim=1))
    y = torch.cross(z, x, dim=1)
    return torch.stack([x, y, z], dim=2)


def oracle_roty(t: float) -> torch.Tensor:
    c, s = np.cos(t), np.sin(t)
    return torch.tensor([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                        dtype=torch.float32)


def oracle_rot_sym(rp: torch.Tensor, rt: torch.Tensor,
                   sym: np.ndarray) -> torch.Tensor:
    """ref parq_decoder.py:205-262 — per-pair symmetry-resolved MSE, then
    mean over pairs."""
    per = []
    for o in range(sym.shape[0]):
        m = {1: 2, 2: 4, 3: 36}.get(int(sym[o]), 0)
        if m:
            cands = [((rp[o] - rt[o] @ oracle_roty(k * 2.0 / m * np.pi)) ** 2
                      ).mean() for k in range(m)]
            per.append(torch.min(torch.stack(cands)))
        else:
            per.append(((rp[o] - rt[o]) ** 2).mean())
    return torch.stack(per).mean()


def oracle_match(logits, coord, tgt):
    """ref utils/matcher.py:51-115 for ONE sample. Returns
    (pred_idx, gt_idx, punish) with the reference's exact semantics:
    punish is rebuilt per GT, so only the LAST GT's cap survives; the cap
    subset uses np.random.choice. Zero-GT returns the reference's
    (bool-mask, empty) pair verbatim."""
    Q = logits.shape[0]
    G = len(tgt["labels"])
    if G == 0:
        return np.zeros(Q, bool), np.zeros(0, np.int64), None
    prob = torch.softmax(torch.from_numpy(logits), -1).numpy()
    c_class = -prob[:, tgt["labels"]]
    c_bbox = np.abs(coord[:, None] - tgt["center"][None]).sum(-1)  # (Q, G)
    cost = COST_BBOX * c_bbox + COST_CLASS * c_class
    rows, cols = linear_sum_assignment(cost)

    pred_parts, gt_parts = [rows], [cols]
    punish = np.ones(Q, bool)
    for j in range(G):
        pred_ind = np.nonzero(c_bbox[:, j] < RATIO)[0]
        punish = np.ones(Q, bool)          # ref bug: re-created per GT
        punish[pred_ind] = False
        if pred_ind.shape[0] > MAX_PAD:
            choose = np.random.choice(pred_ind.shape[0], MAX_PAD,
                                      replace=False)
            pred_ind = pred_ind[choose]
        punish[pred_ind] = True
        pred_parts.append(pred_ind)
        gt_parts.append(np.full(pred_ind.shape[0], j, np.int64))
    p = np.concatenate(pred_parts)
    g = np.concatenate(gt_parts)
    _, first = np.unique(p, return_index=True)  # hungarian pairs come first
    return p[first], g[first], punish


def oracle_loss(out_np, tgt_list, sym_list, match_fn):
    """ref parq_decoder.py:264-370 (exact normalization semantics).

    out_np: dict of (L, B, ...) numpy arrays; match_fn(l, b) -> the
    (pred_idx, gt_idx, punish) triple for that (iteration, sample) pair.
    """
    L, B, Q = out_np["pred_logits"].shape[:3]
    w = torch.ones(NUM_SEMCLS + 1)
    w[NUM_SEMCLS] = 0.1                    # ref parq_decoder.py:46-48
    comp = {"center_loss": 0.0, "size_loss": 0.0, "rot_loss": 0.0,
            "cat_loss": 0.0}
    valid_bs = 0
    for l in range(L):
        for b in range(B):
            pred_idx, gt_idx, punish = match_fn(l, b)
            if len(pred_idx) == 0:         # ref: len(bool mask) == Q != 0!
                continue
            tgt = tgt_list[b]
            if isinstance(pred_idx, np.ndarray) and pred_idx.dtype == bool:
                # reference zero-GT path: empty selections → NaN means,
                # then punish_mask_list[i] IndexError. Reproduce it.
                valid_bs += 1
                sel = torch.zeros((0, 3))
                comp["center_loss"] += sel.mean()  # nan
                raise IndexError(
                    "reference punish_mask_list misalignment (matcher.py:"
                    "113 never appends for zero-GT samples)")
            valid_bs += 1
            o = {k: torch.from_numpy(out_np[k][l, b]) for k in out_np}
            tc = torch.from_numpy(tgt["center"][gt_idx])
            ts = torch.from_numpy(tgt["size"][gt_idx])
            tR = torch.from_numpy(tgt["rot"][gt_idx])
            pi = torch.from_numpy(pred_idx)
            comp["center_loss"] += \
                (o["center_unnormalized"][pi] - tc).abs().mean() * Wt[0]
            comp["size_loss"] += \
                (o["size_unnormalized"][pi] - ts).abs().mean() * Wt[1]
            rp = oracle_o6d(o["ortho6d"][pi])
            comp["rot_loss"] += oracle_rot_sym(
                rp, tR, sym_list[b][gt_idx]) * Wt[2]
            cls_t = torch.full((Q,), NUM_SEMCLS, dtype=torch.int64)
            cls_t[pi] = torch.from_numpy(tgt["labels"][gt_idx])
            ce = torch.nn.functional.cross_entropy(
                o["pred_logits"], cls_t, weight=w, reduction="none")
            pm = torch.from_numpy(punish.astype(np.float32))
            comp["cat_loss"] += (ce * pm).sum() / pm.sum() * Wt[3]
    if valid_bs:
        comp = {k: float(v) / valid_bs for k, v in comp.items()}
    comp["total_loss"] = sum(comp.values())
    comp["valid_bs"] = valid_bs
    return comp


# ------------------------------------------------------------- fixtures --
def random_rotations(rng, n):
    q, _ = np.linalg.qr(rng.randn(n, 3, 3))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    return q.astype(np.float32)


def build_case(rng, B, K, Q, L, n_valid, prox_clusters=()):
    """Random outputs/targets. prox_clusters: list of (b, gt_j, n_queries)
    — place that many reference points inside GT j's proximity sphere."""
    labels = np.full((B, K), -1, np.int32)
    center = rng.uniform(-4, 4, (B, K, 3)).astype(np.float32)
    size = rng.uniform(0.3, 2.0, (B, K, 3)).astype(np.float32)
    rot = np.stack([random_rotations(rng, K) for _ in range(B)])
    sym = rng.randint(0, 4, (B, K)).astype(np.int32)
    valid = np.zeros((B, K), bool)
    for b in range(B):
        nv = n_valid[b]
        valid[b, :nv] = True
        labels[b, :nv] = rng.randint(0, NUM_SEMCLS, nv)
    targets = Targets(
        labels=jnp.asarray(labels), center=jnp.asarray(center),
        size=jnp.asarray(size), rot=jnp.asarray(rot),
        valid=jnp.asarray(valid), sym=jnp.asarray(sym),
        corners_world=jnp.zeros((B, K, 8, 3), jnp.float32))

    out = {
        "pred_logits": rng.randn(L, B, Q, NUM_SEMCLS + 1).astype(np.float32),
        "center_unnormalized":
            rng.uniform(-4, 4, (L, B, Q, 3)).astype(np.float32),
        "size_unnormalized":
            rng.uniform(0.2, 2.2, (L, B, Q, 3)).astype(np.float32),
        "ortho6d": rng.randn(L, B, Q, 6).astype(np.float32),
        "coord_pos": rng.uniform(-4, 4, (L, B, Q, 3)).astype(np.float32),
    }
    # Keep reference points INSIDE the target coordinate range but OUTSIDE
    # every proximity sphere. Far-outside points make the L1 distance
    # exactly separable (|q-t|_1 = Σ|q_i| - sign(q)·t), which makes every
    # assignment equal-cost — scipy and the on-device LAP then tie-break
    # differently (DIVERGENCES.md #9) and component losses diverge. In-range
    # points give generic, tie-free costs.
    for b in range(B):
        cen = center[b, valid[b]]
        if not len(cen):
            continue
        for _ in range(50):
            d = np.abs(out["coord_pos"][:, b, :, None] - cen[None, None]
                       ).sum(-1).min(-1)                     # (L, Q)
            bad = d < 0.3
            if not bad.any():
                break
            out["coord_pos"][:, b][bad] = \
                rng.uniform(-4, 4, (int(bad.sum()), 3)).astype(np.float32)
    qcur = 0
    for b, j, n in prox_clusters:
        for _ in range(n):
            jitter = rng.uniform(-0.05, 0.05, 3).astype(np.float32)
            out["coord_pos"][:, b, qcur % Q] = center[b, j] + jitter
            qcur += 1

    tgt_list = [{"labels": labels[b, :n_valid[b]].astype(np.int64),
                 "center": center[b, :n_valid[b]],
                 "size": size[b, :n_valid[b]],
                 "rot": rot[b, :n_valid[b]]} for b in range(B)]
    sym_list = [sym[b, :n_valid[b]] for b in range(B)]
    return out, targets, tgt_list, sym_list


def ours(out, targets, key=0):
    res = set_loss({k: jnp.asarray(v) for k, v in out.items()}, targets,
                   jax.random.PRNGKey(key))
    return {k: float(v) for k, v in res.items()}


def our_matching(out, targets, key=0):
    """Replicate set_loss's exact match_batch call (flatten L into batch,
    split key) and return (assign, punish) as (L, B, ...) numpy."""
    L, B, Q = out["pred_logits"].shape[:3]
    flat = lambda a: jnp.asarray(a).reshape((L * B,) + a.shape[2:])
    tile = lambda t: jnp.tile(t, (L,) + (1,) * (t.ndim - 1))
    res = match_batch(flat(out["pred_logits"]), flat(out["coord_pos"]),
                      tile(targets.labels), tile(targets.center),
                      tile(targets.valid), jax.random.PRNGKey(key))
    K = targets.labels.shape[1]
    return (np.asarray(res.assign).reshape(L, B, Q),
            np.asarray(res.punish_mask).reshape(L, B, Q))


def assert_components_close(a, b, **kw):
    for k in ("center_loss", "size_loss", "rot_loss", "cat_loss",
              "total_loss", "valid_bs"):
        np.testing.assert_allclose(a[k], b[k], rtol=3e-5, atol=3e-5,
                                   err_msg=k, **kw)


# --------------------------------------------------------------- parity --
def test_parity_random_no_prox(rng):
    """Pure-LAP regime (reference points far from every GT): full-pipeline
    parity, every component ≤3e-5."""
    out, targets, tgt_list, sym_list = build_case(
        rng, B=3, K=12, Q=16, L=3, n_valid=[3, 12, 7])
    oracle = oracle_loss(
        out, tgt_list, sym_list,
        lambda l, b: oracle_match(out["pred_logits"][l, b],
                                  out["coord_pos"][l, b], tgt_list[b]))
    assert_components_close(ours(out, targets), oracle)


def test_parity_with_prox_no_cap(rng):
    """Proximity-extended matches below the cap: deterministic on both
    sides (no random subset), punish mask all-True on both sides."""
    out, targets, tgt_list, sym_list = build_case(
        rng, B=2, K=8, Q=32, L=2, n_valid=[4, 6],
        prox_clusters=[(0, 0, 5), (0, 2, 3), (1, 1, 7)])
    oracle = oracle_loss(
        out, tgt_list, sym_list,
        lambda l, b: oracle_match(out["pred_logits"][l, b],
                                  out["coord_pos"][l, b], tgt_list[b]))
    assert_components_close(ours(out, targets), oracle)


def test_parity_more_targets_than_queries(rng):
    """K > Q (static) with n_valid > Q: scipy picks the optimal Q-subset of
    ALL valid targets; our transposed solve must produce the same loss."""
    out, targets, tgt_list, sym_list = build_case(
        rng, B=2, K=24, Q=16, L=2, n_valid=[20, 24])
    oracle = oracle_loss(
        out, tgt_list, sym_list,
        lambda l, b: oracle_match(out["pred_logits"][l, b],
                                  out["coord_pos"][l, b], tgt_list[b]))
    assert_components_close(ours(out, targets), oracle)


def test_parity_cap_saturation_loss_given_matching(rng):
    """> max_padding queries inside one GT's sphere. The random cap subset
    differs by construction (np.random.choice vs jitted PRNG ranking), so
    full-pipeline equality is not expected — instead feed OUR realized
    (assign, punish) into the torch loss formula and require the losses to
    agree ≤3e-5. This pins every normalization constant (per-pair means,
    punish-sum CE denominator, valid_bs) at saturation."""
    out, targets, tgt_list, sym_list = build_case(
        rng, B=2, K=8, Q=32, L=2, n_valid=[3, 5],
        prox_clusters=[(0, 0, 15), (1, 2, 4)])
    assign, punish = our_matching(out, targets)

    def match_from_ours(l, b):
        pred_idx = np.nonzero(assign[l, b] >= 0)[0]
        return pred_idx, assign[l, b][pred_idx].astype(np.int64), \
            punish[l, b]

    oracle = oracle_loss(out, tgt_list, sym_list, match_from_ours)
    assert_components_close(ours(out, targets), oracle)

    # invariants of our cap: per GT ≤ max_padding proximity-selected,
    # and punished-out queries exist at saturation
    n_inside = 0
    c_bbox = np.abs(out["coord_pos"][0, 0][:, None]
                    - tgt_list[0]["center"][None]).sum(-1)
    n_inside = int((c_bbox[:, 0] < RATIO).sum())
    assert n_inside > MAX_PAD  # the construct actually saturates
    n_silenced = int((~punish[:, 0]).sum(axis=-1).max())
    assert n_silenced >= n_inside - MAX_PAD - 2  # LAP matches may re-enter


def test_parity_release_dims(rng):
    """Full release shapes — L=8 iterations, Q=256 queries, K=100 target
    slots (ref configs/scannet_config.yaml NUM_QUERIES/MAX_NUM_OBJ;
    parq_decoder.py runs the loss over all 8 iterations). The small-dims
    cases above pin the semantics; this one pins the SHAPES — the
    transposed-LAP path at Q>K, the padded-row handling at n_valid≪K,
    and the per-(iteration,sample) normalization at the real
    denominators.

    At 16 independent 256×100 LAP solves, a cost-degenerate alternate
    optimum is statistically unavoidable (observed at seed 0: one (l,b)
    pair with 4 differing pairs at EXACTLY equal total cost — the
    tie-break divergence of DIVERGENCES.md #9). So the assertion is
    split: (a) for every (l,b), OUR assignment's total cost equals
    scipy's optimum ≤1e-5 — pinning LAP optimality at release shapes;
    (b) the torch loss formula evaluated on OUR realized matching equals
    our loss ≤3e-5 — pinning every normalization constant."""
    out, targets, tgt_list, sym_list = build_case(
        rng, B=2, K=100, Q=256, L=8, n_valid=[37, 100])
    assign, punish = our_matching(out, targets)

    for l in range(8):
        for b in range(2):
            tgt = tgt_list[b]
            prob = torch.softmax(
                torch.from_numpy(out["pred_logits"][l, b]), -1).numpy()
            c_class = -prob[:, tgt["labels"]]
            c_bbox = np.abs(out["coord_pos"][l, b][:, None]
                            - tgt["center"][None]).sum(-1)
            cost = COST_BBOX * c_bbox + COST_CLASS * c_class
            rows, cols = linear_sum_assignment(cost)
            opt = cost[rows, cols].sum()
            qi = np.nonzero(assign[l, b] >= 0)[0]
            got = cost[qi, assign[l, b][qi]].sum()
            assert len(qi) == len(rows)          # perfect matching size
            np.testing.assert_allclose(got, opt, rtol=1e-5,
                                       err_msg=f"LAP cost l={l} b={b}")

    def match_from_ours(l, b):
        qi = np.nonzero(assign[l, b] >= 0)[0]
        return qi, assign[l, b][qi].astype(np.int64), punish[l, b]

    oracle = oracle_loss(out, tgt_list, sym_list, match_from_ours)
    assert_components_close(ours(out, targets), oracle)


def test_divergence_punish_mask_explicit(rng):
    """DIVERGENCES.md #1 asserted as an expected DELTA: at cap saturation
    the reference's punish mask (last GT's loop iteration only) is all-True
    when the LAST GT has no capped queries — so its CE punishes the very
    queries the cap excluded. Ours differs in cat_loss ONLY."""
    out, targets, tgt_list, sym_list = build_case(
        rng, B=1, K=8, Q=32, L=1, n_valid=[3],
        prox_clusters=[(0, 0, 15)])     # GT0 saturates; GT2 (last) clean
    np.random.seed(0)
    oracle = oracle_loss(
        out, tgt_list, sym_list,
        lambda l, b: oracle_match(out["pred_logits"][l, b],
                                  out["coord_pos"][l, b], tgt_list[b]))
    ref_punish = oracle_match(out["pred_logits"][0, 0],
                              out["coord_pos"][0, 0], tgt_list[0])[2]
    assert ref_punish.all()            # ref: last GT clean → nothing silenced
    _, our_punish = our_matching(out, targets)
    assert not our_punish.all()        # ours: capped-out queries silenced
    got = ours(out, targets)
    # the documented divergence shows up in the classification term (which
    # queries the CE silences); center/size also shift slightly because the
    # random cap SUBSET differs — that part is covered exactly by
    # test_parity_cap_saturation_loss_given_matching.
    assert abs(got["cat_loss"] - oracle["cat_loss"]) > 1e-4


def test_divergence_zero_gt_explicit(rng):
    """DIVERGENCES.md #1 (zero-GT): the reference path NaNs the component
    means and then crashes on the misaligned punish list; ours returns
    finite losses and excludes the pair from valid_bs."""
    out, targets, tgt_list, sym_list = build_case(
        rng, B=2, K=8, Q=16, L=2, n_valid=[4, 0])
    with pytest.raises(IndexError, match="punish_mask_list"):
        oracle_loss(
            out, tgt_list, sym_list,
            lambda l, b: oracle_match(out["pred_logits"][l, b],
                                      out["coord_pos"][l, b], tgt_list[b]))
    got = ours(out, targets)
    assert np.isfinite(got["total_loss"])
    assert got["valid_bs"] == 2.0      # L × only the non-empty sample
    # and the finite path matches the oracle restricted to sample 0
    oracle = oracle_loss(
        {k: v[:, :1] for k, v in out.items()}, tgt_list[:1], sym_list[:1],
        lambda l, b: oracle_match(out["pred_logits"][l, 0],
                                  out["coord_pos"][l, 0], tgt_list[0]))
    assert_components_close(got, oracle)
