"""On-device linear assignment + the PARQ modified matcher.

The reference calls `scipy.optimize.linear_sum_assignment` on CPU inside the
train step (ref: utils/matcher.py:81) — a D2H sync per iteration per sample.
Here the LAP is solved **on device** with the shortest-augmenting-path
(Jonker–Volgenant) algorithm in fixed-bound `lax` loops, so the whole train
step stays one fused XLA program.

Shapes are static: cost is (K, Q) with K = max targets (padded rows get a
uniform constant cost, which cannot change the optimal assignment of real
rows because every completion of the dummy rows costs the same).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = jnp.float32(1e18)


def solve_lap(cost: jnp.ndarray, n_rows: jnp.ndarray = None) -> jnp.ndarray:
    """Exact min-cost assignment of K rows to Q columns (K <= Q).

    Args:
      cost: (K, Q) float32 finite costs.
      n_rows: optional dynamic count of leading rows to assign (the rest
        stay at −1). The augmenting-path loop is sequential, so skipping
        padded rows is a large win on TPU (typical scenes have ≤10 boxes
        against the static K=100 padding).
    Returns:
      col4row: (K,) int32 — the column assigned to each row (−1 if skipped).
    """
    K, Q = cost.shape
    assert K <= Q, "solve_lap expects rows <= cols (targets <= queries)"
    cost = cost.astype(jnp.float32)
    if n_rows is None:
        n_rows = jnp.int32(K)

    def outer(cur_row, state):
        u, v, col4row, row4col = state

        class Dij(NamedTuple):
            i: jnp.ndarray
            min_val: jnp.ndarray
            sink: jnp.ndarray
            spc: jnp.ndarray     # shortest path cost per column (Q,)
            path: jnp.ndarray    # predecessor row per column (Q,)
            SR: jnp.ndarray      # scanned rows (K,)
            SC: jnp.ndarray      # scanned cols (Q,)

        def dij_cond(d: "Dij"):
            return d.sink < 0

        def dij_body(d: "Dij"):
            SR = d.SR.at[d.i].set(True)
            r = d.min_val + cost[d.i] - u[d.i] - v
            update = (~d.SC) & (r < d.spc)
            path = jnp.where(update, d.i, d.path)
            spc = jnp.where(update, r, d.spc)
            masked = jnp.where(d.SC, INF, spc)
            j = jnp.argmin(masked)
            min_val = masked[j]
            SC = d.SC.at[j].set(True)
            is_free = row4col[j] < 0
            sink = jnp.where(is_free, j, -1)
            i = jnp.where(is_free, d.i, row4col[j])
            return Dij(i, min_val, sink, spc, path, SR, SC)

        init = Dij(
            i=jnp.int32(cur_row),
            min_val=jnp.float32(0.0),
            sink=jnp.int32(-1),
            spc=jnp.full((Q,), INF, jnp.float32),
            path=jnp.full((Q,), -1, jnp.int32),
            SR=jnp.zeros((K,), bool),
            SC=jnp.zeros((Q,), bool),
        )
        d = jax.lax.while_loop(dij_cond, dij_body, init)

        # dual updates (scipy _lsap semantics)
        u = u.at[cur_row].add(d.min_val)
        other = d.SR & (jnp.arange(K) != cur_row)
        u = u + jnp.where(
            other, d.min_val - d.spc[jnp.clip(col4row, 0, Q - 1)], 0.0)
        v = v - jnp.where(d.SC, d.min_val - d.spc, 0.0)

        # augment along the alternating path (bounded by K hops)
        def aug_cond(c):
            _, _, j, done = c
            return ~done

        def aug_body(c):
            col4row_, row4col_, j, _ = c
            i = d.path[j]
            row4col_ = row4col_.at[j].set(i)
            nxt = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            return col4row_, row4col_, nxt, i == cur_row

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body,
            (col4row, row4col, d.sink, jnp.asarray(False)))
        return u, v, col4row, row4col

    u0 = jnp.zeros((K,), jnp.float32)
    v0 = jnp.zeros((Q,), jnp.float32)
    col4row0 = jnp.full((K,), -1, jnp.int32)
    row4col0 = jnp.full((Q,), -1, jnp.int32)

    def w_cond(carry):
        r, _ = carry
        return r < n_rows

    def w_body(carry):
        r, state = carry
        return r + 1, outer(r, state)

    _, (_, _, col4row, _) = jax.lax.while_loop(
        w_cond, w_body, (jnp.int32(0), (u0, v0, col4row0, row4col0)))
    return col4row


class MatchResult(NamedTuple):
    """Per-sample matching, fully masked/static.

    assign: (Q,) int32 — target index matched to each query, -1 if none.
    is_hungarian: (Q,) bool — True where the match came from the exact LAP
      (vs the proximity extension).
    punish_mask: (Q,) bool — queries to include in the classification loss.
    """
    assign: jnp.ndarray
    is_hungarian: jnp.ndarray
    punish_mask: jnp.ndarray


@partial(jax.jit, static_argnames=("cost_class", "cost_bbox", "ratio",
                                   "max_padding"))
def match_single(
    pred_logits: jnp.ndarray,   # (Q, C+1)
    coord_pos: jnp.ndarray,     # (Q, 3) input reference points (ref matcher
                                # matches on these, not predicted centers —
                                # utils/matcher.py:58, transformer_parq.py:278)
    tgt_labels: jnp.ndarray,    # (K,) int32, −1 for pad
    tgt_center: jnp.ndarray,    # (K, 3)
    tgt_valid: jnp.ndarray,     # (K,) bool
    key: jax.Array,
    cost_class: float = 2.0,
    cost_bbox: float = 0.25,
    ratio: float = 0.2,
    max_padding: int = 10,
) -> MatchResult:
    """PARQ modified Hungarian matching for one sample (vmap over batch).

    Semantics follow ref utils/matcher.py:51-115: exact LAP on
    ``cost = cost_bbox * L1(ref, center) + cost_class * (−prob)``, then every
    prediction whose reference point is within `ratio` L1 of a GT is also
    assigned to it, capped at `max_padding` by uniform random subset; capped-
    out predictions are excluded from the CE loss via `punish_mask`.

    Deliberate divergence (documented): the reference's punish mask only
    reflects the *last* GT of the Python loop and is misaligned for empty
    samples (utils/matcher.py:92-113); here it covers all GTs and never
    silences LAP-matched queries.
    """
    Q = pred_logits.shape[0]
    K = tgt_labels.shape[0]

    prob = jax.nn.softmax(pred_logits, axis=-1)            # (Q, C+1)
    labels_safe = jnp.clip(tgt_labels, 0, prob.shape[-1] - 1)
    c_class = -prob[:, labels_safe]                        # (Q, K)
    c_bbox = jnp.sum(jnp.abs(coord_pos[:, None, :] - tgt_center[None, :, :]),
                     axis=-1)                              # (Q, K)
    cost = cost_bbox * c_bbox + cost_class * c_class       # (Q, K)

    if K <= Q:
        # pad rows (invalid targets) get a flat cost — assignment of real
        # rows is unaffected (any completion costs the same). LAP needs
        # rows <= cols; valid targets always precede padding.
        cost_t = jnp.where(tgt_valid[:, None], cost.T, 1e4)   # (K, Q)
        # only iterate the sequential augmenting-path loop over VALID
        # targets (they always precede padding); skipped rows stay −1
        n_valid = jnp.sum(tgt_valid.astype(jnp.int32))
        col4row = solve_lap(cost_t, n_rows=n_valid)           # (K,)

        # scatter: query → target from the LAP. Pad rows have col4row ==
        # −1, and jax WRAPS negative indices even under mode="drop" (−1 →
        # Q−1, silently clobbering the last query's match) — route them to
        # the out-of-bounds index Q, which drop mode genuinely discards.
        hung_assign = jnp.full((Q,), -1, jnp.int32)
        scatter_tgt = jnp.where(tgt_valid,
                                jnp.arange(K, dtype=jnp.int32), -1)
        safe_col = jnp.where(col4row >= 0, col4row, Q)
        hung_assign = hung_assign.at[safe_col].set(scatter_tgt, mode="drop")
        is_hungarian = hung_assign >= 0
    else:
        # More target slots than queries (static): solve the TRANSPOSED
        # problem — rows = queries, cols = targets. Invalid target columns
        # get a flat cost, so the optimum matches as many queries as there
        # are valid targets, over ALL of them (the reference's scipy LSA of
        # the (Q, G) matrix picks the optimal G-subset too — truncating
        # targets to the first Q would not).
        cost_q = jnp.where(tgt_valid[None, :], cost, 1e4)     # (Q, K)
        t4q = solve_lap(cost_q)                               # (Q,)
        matched_valid = jnp.take(tgt_valid, jnp.clip(t4q, 0, K - 1))
        hung_assign = jnp.where((t4q >= 0) & matched_valid, t4q, -1)
        is_hungarian = hung_assign >= 0

    # --- proximity extension -------------------------------------------
    inside = (c_bbox < ratio) & tgt_valid[None, :]          # (Q, K)
    # uniform random subset of ≤ max_padding per target: rank iid uniforms
    rnd = jax.random.uniform(key, (Q, K))
    rnd = jnp.where(inside, rnd, jnp.inf)
    kth = jnp.sort(rnd, axis=0)[max_padding - 1, :]         # (K,)
    n_inside = jnp.sum(inside, axis=0)                      # (K,)
    selected = inside & ((n_inside[None, :] <= max_padding) | (rnd <= kth))

    # first (lowest-index) selected target per query — mirrors the
    # reference's first-occurrence dedup (utils/matcher.py:108-110)
    any_sel = jnp.any(selected, axis=1)
    first_sel = jnp.argmax(selected, axis=1).astype(jnp.int32)
    prox_assign = jnp.where(any_sel, first_sel, -1)

    assign = jnp.where(is_hungarian, hung_assign, prox_assign)

    # punish: exclude capped-out proximity queries from CE
    punish = ~(jnp.any(inside, axis=1) & ~any_sel & ~is_hungarian)

    # no valid targets → nothing matched (ref: utils/matcher.py:70-74)
    has_tgt = jnp.any(tgt_valid)
    assign = jnp.where(has_tgt, assign, -1)
    is_hungarian = is_hungarian & has_tgt
    punish = punish | ~has_tgt
    return MatchResult(assign, is_hungarian, punish)


def match_batch(pred_logits, coord_pos, tgt_labels, tgt_center, tgt_valid,
                key, **kw):
    """vmapped matcher over the batch axis; key is split per sample."""
    B = pred_logits.shape[0]
    keys = jax.random.split(key, B)
    fn = lambda l, c, tl, tc, tv, k: match_single(l, c, tl, tc, tv, k, **kw)
    return jax.vmap(fn)(pred_logits, coord_pos, tgt_labels, tgt_center,
                        tgt_valid, keys)
