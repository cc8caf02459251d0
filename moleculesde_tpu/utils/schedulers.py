"""LR schedules mirroring the reference's five torch schedulers.

Reference finetune scripts choose between CosineAnnealingLR,
CosineAnnealingWarmRestarts, StepLR, ReduceLROnPlateau and a customized
multi-step decay (reference examples/finetune_QM9.py:324-346,
config.py:52-57).  All but plateau are pure step->lr functions built on jnp
ops (they run under jit via optax.scale_by_schedule); plateau is a small
host-side controller.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp


def make_lr_schedule(
    name: str,
    lr: float,
    epochs: int,
    steps_per_epoch: int,
    lr_decay_factor: float = 0.5,
    lr_decay_step_size: int = 100,
    min_lr: float = 1e-6,
    custom_steps: Sequence[int] = (150,),
) -> Callable[[int], jnp.ndarray]:
    """step -> lr schedule (jit-safe; torch epoch-granularity semantics)."""
    if name == "CosineAnnealingLR":
        t_max = max(epochs * steps_per_epoch, 1)

        def sched(step):
            t = jnp.minimum(step, t_max)
            return min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(math.pi * t / t_max))

        return sched

    if name == "CosineAnnealingWarmRestarts":
        t0 = max(epochs * steps_per_epoch // 4, 1)

        def sched(step):
            t = step % t0
            return min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(math.pi * t / t0))

        return sched

    if name == "StepLR":
        decay_steps = max(lr_decay_step_size * steps_per_epoch, 1)

        def sched(step):
            return lr * lr_decay_factor ** (step // decay_steps)

        return sched

    if name == "StepLRCustomized":
        boundaries = jnp.asarray([s * steps_per_epoch for s in custom_steps])

        def sched(step):
            k = (step >= boundaries).sum()
            return lr * lr_decay_factor ** k

        return sched

    if name in ("none", "None", "ReduceLROnPlateau"):
        # plateau is driven by PlateauController at epoch granularity
        def sched(step):
            return jnp.asarray(lr)

        return sched

    raise ValueError(f"unknown lr scheduler {name}")


class PlateauController:
    """Host-side ReduceLROnPlateau (reference finetune_QM9.py:334-339):
    multiply lr by ``factor`` after ``patience`` epochs without val improvement."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 50,
                 min_lr: float = 1e-6):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, val_metric: float) -> float:
        if self.best is None or val_metric < self.best:
            self.best = val_metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr
