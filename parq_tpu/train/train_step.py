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


def make_optimizer(lr_schedule, grad_clip: float = 1.0,
                   weight_decay: float = 0.01,
                   accumulate: int = 1) -> optax.GradientTransformation:
    """AdamW (torch defaults: β=(0.9,0.999), eps=1e-8, wd=0.01 — the
    reference relies on torch defaults, parq_lightning.py:167-170) with
    global-norm clip (ref: train.py:113 gradient_clip_val=1.0) and optional
    gradient accumulation (ref: TRAINER.ACCUMULATE_GRAD_BATCHES).

    [A flat-buffer AdamW (ravel_pytree → one fused moment/clip/update over a
    single (P,) vector) was built to attack the per-leaf optimizer chains in
    the train step's sub-1ms-fusion tail and LOST its r4 on-chip A/B
    decisively: 221.5 vs 258.7 train fps (bench_results/r4/train_flatopt.log)
    — the 3 extra HBM passes over ~240MB of params/grads cost far more than
    the fusion saved; XLA already keeps per-leaf chains cheap. Dead end — do
    not rebuild.]"""
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
