"""QM9 3D regression finetuning.

TPU re-design of the reference script (reference examples/finetune_QM9.py):
SchNet/PaiNN encoder + linear head (PaiNN uses a 2-layer MLP head, reference
painn.py:205-213), z-score target normalization by the train mean/std
(finetune_QM9.py:160-166, 260-265), L1/L2 loss, MAE eval after
denormalization (l.219-223).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.finetune.common import (
    FinetuneState,
    adam_with_schedule,
    apply_updates_with_lr,
)
from moleculesde_tpu.models.layers import xavier_uniform, zeros_init


class RegressionModel(nn.Module):
    """3D encoder + prediction head over pooled representations."""

    encoder: nn.Module
    head: str = "linear"  # "linear" (SchNet) or "mlp" (PaiNN)

    @nn.compact
    def __call__(self, batch: GraphBatch) -> jnp.ndarray:
        pooled, _ = self.encoder(
            batch.atomic_numbers, batch.positions, batch.node_mask,
            batch.num_graphs, batch.n_max)
        if self.head == "linear":
            out = nn.Dense(1, kernel_init=xavier_uniform, bias_init=zeros_init,
                           name="graph_pred_linear")(pooled)
        else:
            h = nn.Dense(pooled.shape[-1] // 2, kernel_init=xavier_uniform,
                         bias_init=zeros_init)(pooled)
            h = nn.silu(h)
            out = nn.Dense(1, kernel_init=xavier_uniform, bias_init=zeros_init)(h)
        return out[:, 0]


def create_regression_state(
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
        # load the pretrain checkpoint's model_3D component
        # (reference finetune_QM9.py:95-108)
        params = dict(params)
        params["encoder"] = pretrained_encoder_params
    tx = adam_with_schedule(lr, schedule, weight_decay)
    return FinetuneState(
        params=params, batch_stats={}, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32)), tx


def make_regression_steps(
    model: RegressionModel, tx, loss_type: str = "mae", schedule=None,
    mesh=None,
) -> Tuple[Callable, Callable]:
    """Returns (train_step, eval_step).  Targets fed to train_step must be
    pre-normalized.  With ``schedule`` the per-step lr is computed inside the
    jitted step from the traced ``state.step`` (the explicit ``lr`` argument
    then only serves host-driven ReduceLROnPlateau).  ``eval_step`` returns
    raw (normalized) per-graph predictions as a device array; callers
    accumulate metrics on device (examples/finetune_qm9.py) so eval loops do
    no per-batch device->host transfer."""

    def loss_fn(params, batch: GraphBatch, y_norm, graph_mask):
        pred = model.apply({"params": params}, batch)
        err = pred - y_norm
        per = jnp.abs(err) if loss_type == "mae" else err ** 2
        m = graph_mask.astype(per.dtype)
        return (per * m).sum() / jnp.maximum(m.sum(), 1.0)

    def train_step(state: FinetuneState, batch: GraphBatch, y_norm, graph_mask, lr):
        if schedule is not None:
            lr = schedule(state.step)  # traced: no host round-trip per batch
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, y_norm, graph_mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates_with_lr(state.params, updates, lr)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), loss

    def eval_step(state: FinetuneState, batch: GraphBatch):
        return model.apply({"params": state.params}, batch)

    from moleculesde_tpu.finetune.common import finetune_jit

    return (
        finetune_jit(train_step, mesh,
                     ("repl", "data", "data", "data", "repl"),
                     ("repl", "repl")),
        finetune_jit(eval_step, mesh, ("repl", "data"), "data"),
    )
