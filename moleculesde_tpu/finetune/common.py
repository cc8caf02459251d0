"""Shared finetune train-state plumbing."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class FinetuneState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def adam_with_schedule(
    lr: float,
    schedule: Optional[Callable[[int], float]] = None,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch-style Adam (L2 folded into the gradient) with an lr schedule."""
    lr_fn = schedule if schedule is not None else (lambda _: lr)
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda step: -lr_fn(step)),
    )


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
