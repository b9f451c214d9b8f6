"""Jitted training / eval steps and train-state plumbing.

One fused XLA program per step: forward (backbone + rayPE + scanned decoder)
→ on-device matching → masked set loss → grads → global-norm clip 1.0 →
AdamW with the cosine-restarts schedule. The reference splits this across
Lightning hooks with multiple host syncs (SURVEY §3.1); here nothing touches
the host inside a step.

Data parallelism: jit over a (data, model) mesh with the batch sharded on
`data`; XLA inserts the gradient psum over ICI (the NCCL-allreduce
equivalent, ref SURVEY §2.3).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..geometry import Obb3D, Pose
from ..losses import parse_targets, set_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    frozen: Any                  # FrozenBatchNorm stats — never optimized
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


class FlatAdamWState(struct.PyTreeNode):
    count: jnp.ndarray
    mu: jnp.ndarray      # first moment, one flat f32 buffer
    nu: jnp.ndarray      # second moment, one flat f32 buffer


def flat_adamw(lr_schedule, grad_clip: float = 1.0, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               weight_decay: float = 0.01) -> optax.GradientTransformation:
    """clip-by-global-norm + AdamW over ONE flattened parameter buffer.

    Same math as optax.chain(clip_by_global_norm, adamw) — pinned by
    tests/test_train.py::test_flat_adamw_matches_optax — but the moment/
    clip/update arithmetic runs as a handful of big fused elementwise ops
    over a single (P,) vector instead of ~8 tiny ops × ~200 leaves (the
    per-leaf chains are part of the train step's sub-1ms-fusion tail; XLA
    cannot fuse across leaves). Costs one ravel of the grads and params and
    one unravel of the update (~3 extra HBM passes over the ~240MB params)
    against ~1600 kernel launches saved. TPU.FLAT_OPTIMIZER selects it."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(count=jnp.zeros((), jnp.int32),
                              mu=jnp.zeros_like(flat),
                              nu=jnp.zeros_like(flat))

    def update(grads, state, params):
        g, unravel = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        # optax.clip_by_global_norm: scale by clip/norm only when above
        g_norm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, grad_clip / jnp.maximum(g_norm, 1e-30))
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        cf = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** cf)
        nu_hat = nu / (1.0 - b2 ** cf)
        # optax.scale_by_schedule reads its (pre-increment) own count
        lr = lr_schedule(state.count)
        upd = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p)
        return unravel(upd), FlatAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(lr_schedule, grad_clip: float = 1.0,
                   weight_decay: float = 0.01,
                   accumulate: int = 1,
                   flat: bool = False) -> optax.GradientTransformation:
    """AdamW (torch defaults: β=(0.9,0.999), eps=1e-8, wd=0.01 — the
    reference relies on torch defaults, parq_lightning.py:167-170) with
    global-norm clip (ref: train.py:113 gradient_clip_val=1.0) and optional
    gradient accumulation (ref: TRAINER.ACCUMULATE_GRAD_BATCHES).
    `flat=True` runs the same math over one flattened buffer (flat_adamw)."""
    if flat:
        tx = flat_adamw(lr_schedule, grad_clip=grad_clip,
                        weight_decay=weight_decay)
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=weight_decay),
        )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx


def create_train_state(model, batch, tx, rng) -> TrainState:
    variables = model.init(rng, batch)
    params = variables["params"]
    frozen = variables.get("frozen", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, frozen=frozen,
        opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    loss_weight: Tuple[float, float, float, float] = (5.0, 5.0, 5.0, 1.0)
    num_semcls: int = 9

    @classmethod
    def from_config(cls, cfg):
        return cls(loss_weight=tuple(cfg.MODEL.DECODER.LOSS_WEIGHT),
                   num_semcls=cfg.MODEL.DECODER.NUM_SEMCLS)


def forward_and_loss(apply_fn, params, frozen, batch, key,
                     loss_cfg: LossConfig, deterministic: bool):
    k_drop, k_match = jax.random.split(key)
    rngs = None if deterministic else {"dropout": k_drop}
    outputs = apply_fn({"params": params, "frozen": frozen}, batch,
                       deterministic=deterministic, rngs=rngs)
    if "obbs_padded" not in batch:
        # no GT (demo captures) → zero loss (ref: parq_lightning.py:91-94)
        losses = {"total_loss": jnp.zeros(())}
        return losses, outputs
    targets = parse_targets(Obb3D(batch["obbs_padded"]),
                            Pose(batch["T_world_local"]),
                            batch.get("sym"))
    losses = set_loss(outputs, targets, k_match,
                      loss_weight=loss_cfg.loss_weight,
                      num_semcls=loss_cfg.num_semcls)
    return losses, outputs


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               key: jax.Array, loss_cfg: LossConfig):
    """One optimization step; jit this (donate state for in-place update)."""

    def loss_fn(params):
        losses, _ = forward_and_loss(state.apply_fn, params, state.frozen,
                                     batch, key, loss_cfg,
                                     deterministic=False)
        return losses["total_loss"], losses

    (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    new_state = state.apply_gradients(grads)
    metrics = {k: v for k, v in losses.items()}
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def eval_step(state: TrainState, batch, key, loss_cfg: LossConfig):
    """Forward + loss without gradient; returns (losses, outputs)."""
    return forward_and_loss(state.apply_fn, state.params, state.frozen,
                            batch, key, loss_cfg, deterministic=True)


def make_jitted_train_step(loss_cfg: LossConfig, donate: bool = True):
    return jax.jit(partial(train_step, loss_cfg=loss_cfg),
                   donate_argnums=(0,) if donate else ())


def make_jitted_eval_step(loss_cfg: LossConfig):
    return jax.jit(partial(eval_step, loss_cfg=loss_cfg))
