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


def finetune_jit(fn, mesh, arg_kinds, out_kinds, axis_name: str = "data"):
    """jit a finetune step: plain ``jax.jit`` when ``mesh is None``, else the
    data-parallel ``parallel.mesh.sharded_jit`` (state replicated, batch
    sharded on the molecule axis; gradient/loss all-reduce inserted by
    GSPMD).  Lazy import keeps ``finetune`` free of a ``parallel`` dependency
    on the single-device path."""
    if mesh is None:
        return jax.jit(fn)
    from moleculesde_tpu.parallel.mesh import sharded_jit

    return sharded_jit(fn, mesh, arg_kinds, out_kinds, axis_name=axis_name)


def adam_with_schedule(
    lr: float,
    schedule: Optional[Callable[[int], float]] = None,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch-style Adam (L2 folded into the gradient) producing *unscaled*
    ascent directions; the learning rate is applied inside the train step so
    host-driven schedules (ReduceLROnPlateau) can change it without retracing.
    The transformation carries ``(lr, schedule)`` via attributes consumed by
    :func:`apply_lr`."""
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(),
    )
    return tx


def resolve_lr(schedule, step, lr_override=None, default_lr: float = 1e-4):
    """Traced per-step learning rate: explicit override (plateau path) wins,
    else the jnp schedule, else the constant default."""
    if lr_override is not None:
        return lr_override
    if schedule is not None:
        return schedule(step)
    return jnp.asarray(default_lr)


def apply_updates_with_lr(params, updates, lr):
    return jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def make_best_tracker(mode: str = "max"):
    """Device-side best-checkpoint tracking: no D2H in the epoch loop.

    Returns ``update(best, metric, payload) -> best`` (jitted tree-select) and
    ``init(metric, payload) -> best``.  ``payload`` is any pytree (params,
    metrics to report at the best epoch, ...).  The reference tracks best-val
    on the host per epoch (finetune_MoleculeNet.py:324-339); on tunneled TPUs
    a host read per epoch permanently degrades dispatch latency, so the
    selection runs on-device and the winner is read once after training.
    """
    sign = 1.0 if mode == "max" else -1.0
    worst = -jnp.inf

    @jax.jit
    def update(best, metric, payload):
        best_metric, best_payload, best_epoch, epoch = best
        better = sign * metric > best_metric
        new_metric = jnp.where(better, sign * metric, best_metric)
        new_payload = jax.tree_util.tree_map(
            lambda n, o: jnp.where(better, n, o), payload, best_payload)
        new_epoch = jnp.where(better, epoch, best_epoch)
        return new_metric, new_payload, new_epoch, epoch + 1

    def init(payload):
        zeros = jax.tree_util.tree_map(jnp.asarray, payload)
        return (jnp.asarray(worst), zeros, jnp.asarray(0, jnp.int32),
                jnp.asarray(1, jnp.int32))

    return init, update
