"""MD17 energy + force finetuning.

TPU re-design of the reference script (reference examples/finetune_MD17.py):
energy from the pooled 3D encoder + head, forces as the negative position
gradient (l.68: ``-autograd.grad(E, positions, create_graph=True)``), loss =
0.05 * L1(E) + 0.95 * L1(F) (l.74; config.py:35-36), optional normalization
of energies/forces by train statistics (l.63-66, 218-232).

In JAX the force path is ``jax.grad`` of the summed energy w.r.t. positions
inside the loss; the outer ``jax.grad`` for training is grad-of-grad, which
composes natively.  Padded atoms are excluded from the force loss and their
force contribution is exactly zero (SchNet's neighbor mask is boolean, so it
carries no gradient).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.finetune.common import (
    FinetuneState,
    adam_with_schedule,
    apply_updates_with_lr,
)
from moleculesde_tpu.finetune.regression import RegressionModel


def create_md17_state(
    model: RegressionModel,
    batch: GraphBatch,
    key: jax.Array,
    lr: float = 1e-4,
    schedule=None,
    weight_decay: float = 0.0,
    pretrained_encoder_params: Optional[Any] = None,
) -> Tuple[FinetuneState, Any]:
    variables = model.init(key, batch)
    params = variables["params"]
    if pretrained_encoder_params is not None:
        params = dict(params)
        params["encoder"] = pretrained_encoder_params
    tx = adam_with_schedule(lr, schedule, weight_decay)
    return FinetuneState(
        params=params, batch_stats={}, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32)), tx


def make_md17_steps(
    model: RegressionModel,
    tx,
    energy_coeff: float = 0.05,
    force_coeff: float = 0.95,
    energy_scale: float = 1.0,
    energy_shift: float = 0.0,
    schedule=None,
    mesh=None,
) -> Tuple[Callable, Callable]:
    """Returns (train_step, eval_step).  ``energy_scale/shift`` implement the
    optional normalization (pred_E_raw = pred * scale + shift).  With
    ``schedule`` the per-step lr is computed inside the jitted step from the
    traced ``state.step`` (no host sync per batch)."""

    def energy_and_forces(params, batch: GraphBatch):
        def energy_of(pos):
            b = batch.replace(positions=pos)
            return model.apply({"params": params}, b).sum()

        pred_e = model.apply({"params": params}, batch)
        forces = -jax.grad(energy_of)(batch.positions)
        forces = forces * batch.node_mask[:, None]
        return pred_e, forces

    def loss_fn(params, batch: GraphBatch, y_e, y_f, graph_mask):
        pred_e, pred_f = energy_and_forces(params, batch)
        gm = graph_mask.astype(pred_e.dtype)
        e_loss = (jnp.abs(pred_e - y_e) * gm).sum() / jnp.maximum(gm.sum(), 1.0)
        nm = batch.node_mask.astype(pred_e.dtype)[:, None]
        f_err = jnp.abs(pred_f - y_f) * nm
        # NaN-force masking at eval parity (finetune_MD17.py:127-130) is a
        # data-level concern; training frames are clean
        f_loss = f_err.sum() / jnp.maximum(nm.sum() * 3, 1.0)
        return energy_coeff * e_loss + force_coeff * f_loss, (e_loss, f_loss)

    def train_step(state: FinetuneState, batch: GraphBatch, y_e, y_f, graph_mask, lr):
        if schedule is not None:
            lr = schedule(state.step)  # traced: no host round-trip per batch
        (loss, (e_loss, f_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, y_e, y_f, graph_mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates_with_lr(state.params, updates, lr)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), {
            "loss": loss, "energy_mae": e_loss, "force_mae": f_loss}

    def eval_step(state: FinetuneState, batch: GraphBatch):
        pred_e, pred_f = energy_and_forces(state.params, batch)
        return pred_e * energy_scale + energy_shift, pred_f * energy_scale

    from moleculesde_tpu.finetune.common import finetune_jit

    return (
        finetune_jit(train_step, mesh,
                     ("repl", "data", "data", "data", "data", "repl"),
                     ("repl", "repl")),
        finetune_jit(eval_step, mesh, ("repl", "data"), "data"),
    )
