"""LR schedule: cosine annealing with warmup and restarts.

Functional re-derivation of the katsura-jp scheduler the reference uses
(ref: utils/train_utils.py:18-145), as a pure ``epoch → lr`` function. The
reference steps it once per epoch (model/parq_lightning.py:197); callers here
evaluate it at ``step // steps_per_epoch`` so the whole schedule stays inside
the jitted train step.

Also replicates the reference's LR autoscaling and min-lr convention
(model/parq_lightning.py:151-199).
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def cosine_warmup_restarts(
    first_cycle_steps: int,
    max_lr: float,
    min_lr: float,
    warmup_steps: int = 0,
    cycle_mult: float = 1.0,
    gamma: float = 1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return lr(epoch). Matches CosineAnnealingWarmupRestarts.get_lr with
    base_lrs = min_lr (ref: train_utils.py:62-97)."""
    assert warmup_steps < first_cycle_steps

    def lr_fn(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(epoch / first_cycle_steps)
            step_in_cycle = epoch - cycle * first_cycle_steps
            cur_cycle_steps = jnp.float32(first_cycle_steps)
        else:
            # ref: train_utils.py:118-136
            n = jnp.floor(
                jnp.log(epoch / first_cycle_steps * (cycle_mult - 1.0) + 1.0)
                / math.log(cycle_mult))
            n = jnp.maximum(n, 0.0)
            start = first_cycle_steps * (cycle_mult ** n - 1.0) / (cycle_mult - 1.0)
            cycle = n
            step_in_cycle = epoch - start
            cur_cycle_steps = first_cycle_steps * cycle_mult ** n

        cycle_max = max_lr * (gamma ** cycle)
        warm = min_lr + (cycle_max - min_lr) * step_in_cycle / max(warmup_steps, 1)
        cos = min_lr + (cycle_max - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (step_in_cycle - warmup_steps)
                          / (cur_cycle_steps - warmup_steps))) / 2.0
        return jnp.where(step_in_cycle < warmup_steps, warm, cos)

    return lr_fn


def build_lr_schedule(cfg, steps_per_epoch: int) -> Callable:
    """Config → lr(step) function, replicating the reference's derivation:
    effective-batch LR autoscale, min-lr convention, cycle split
    (ref: model/parq_lightning.py:151-199)."""
    ebs = (cfg.DATAMODULE.BATCH_SIZE * cfg.TRAINER.NUM_NODES
           * cfg.TRAINER.GPUS * cfg.TRAINER.ACCUMULATE_GRAD_BATCHES)
    base = cfg.OPTIMIZER.LEARNING_RATE
    lr = base * ebs / 256.0 if cfg.OPTIMIZER.AUTOSCALE_LR else base
    lr_min = base / 256.0 if ebs <= 256 else base

    cycle_mult = cfg.OPTIMIZER.CYCLE_MULT
    num_restarts = cfg.OPTIMIZER.NUM_RESTARTS
    total_epochs = cfg.TRAINER.MAX_EPOCHS
    cycle_fractions = [pow(cycle_mult, i) for i in range(num_restarts)]
    epochs_cycle_0 = math.ceil(total_epochs / sum(cycle_fractions))

    epoch_fn = cosine_warmup_restarts(
        epochs_cycle_0, lr, lr_min, cfg.OPTIMIZER.WARMUP_EPOCHS, cycle_mult)

    def step_fn(step):
        return epoch_fn(jnp.asarray(step) // max(steps_per_epoch, 1))

    step_fn.peak_lr = lr
    return step_fn
