"""MoleculeNet 2D classification finetuning.

TPU re-design of the reference script (reference
examples/finetune_MoleculeNet.py): 2D GIN + mean pool + linear head with the
masked BCE over {-1, 0, +1} labels (l.129-144) where 0 marks a missing task
label.  Train/eval are jitted; per-task ROC-AUC with invalid-task skipping is
computed host-side (utils.metrics.roc_auc_per_task).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.finetune.common import (
    FinetuneState,
    adam_with_schedule,
    apply_updates_with_lr,
    bce_with_logits,
)
from moleculesde_tpu.models import GNNGraphPred


def create_classification_state(
    model: GNNGraphPred,
    batch: GraphBatch,
    key: jax.Array,
    lr: float = 1e-4,
    schedule=None,
    weight_decay: float = 0.0,
    pretrained_gnn_params: Optional[Any] = None,
) -> Tuple[FinetuneState, Any]:
    variables = model.init({"params": key, "dropout": key}, batch)
    params = variables["params"]
    if pretrained_gnn_params is not None:
        # load the pretrain checkpoint's model_2D component into the GNN
        # submodule (reference finetune_MoleculeNet.py:70-80)
        params = dict(params)
        params["gnn"] = pretrained_gnn_params
    tx = adam_with_schedule(lr, schedule, weight_decay)
    state = FinetuneState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def make_classification_steps(
    model: GNNGraphPred, tx, schedule=None, mesh=None
) -> Tuple[Callable, Callable]:
    """Returns (train_step, eval_step).  When ``schedule`` is given the
    per-step learning rate is computed *inside* the jitted step from the
    traced ``state.step`` (no host sync per batch); the explicit ``lr``
    argument is then ignored and only serves host-driven schedules
    (ReduceLROnPlateau).  With ``mesh`` the steps run data-parallel: state
    replicated, batch/graph_mask sharded on the molecule axis (the masked-BCE
    denominator, BN batch stats and gradients all-reduce over ICI)."""

    def loss_fn(params, batch_stats, batch: GraphBatch, key, graph_mask):
        pred, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, deterministic=False, use_running_average=False,
            rngs={"dropout": key}, mutable=["batch_stats"])
        y = batch.y
        is_valid = (y != 0) & graph_mask[:, None]
        loss_mat = bce_with_logits(pred, (y + 1) / 2)
        loss = jnp.where(is_valid, loss_mat, 0.0).sum() / jnp.maximum(
            is_valid.sum(), 1)
        return loss, (mut["batch_stats"],)

    def train_step(state: FinetuneState, batch: GraphBatch, key, graph_mask, lr):
        key = jax.random.fold_in(key, state.step)  # one device program per step
        if schedule is not None:
            lr = schedule(state.step)  # traced: no host round-trip per batch
        (loss, (new_bs,)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key, graph_mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates_with_lr(state.params, updates, lr)
        return state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1), loss

    def eval_step(state: FinetuneState, batch: GraphBatch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, deterministic=True, use_running_average=True)

    from moleculesde_tpu.finetune.common import finetune_jit

    return (
        finetune_jit(train_step, mesh,
                     ("repl", "data", "repl", "data", "repl"),
                     ("repl", "repl")),
        finetune_jit(eval_step, mesh, ("repl", "data"), "data"),
    )
