"""Data-parallel scaling over a ``jax.sharding.Mesh``.

The reference is strictly single-device (SURVEY.md section 2: no DDP/NCCL/MPI
anywhere); this module is the TPU-native scaling layer it lacks.  Design per
the scaling-book recipe: pick a mesh, annotate shardings on the batch, let
XLA insert the gradient all-reduce over ICI.  The model (~300-dim) fits on
one chip, so a 1-D ``("data",)`` mesh is the production configuration; the
mesh constructor accepts arbitrary device counts so the same code runs on a
v5e pod slice or on 8 virtual CPU devices in tests.

Batch sharding works because every GraphBatch array's leading axis is a
multiple of ``num_graphs`` (nodes = B * n_max, edges = B * e_max): sharding
axis 0 across the mesh keeps whole molecules on one device, so message
passing never crosses chips and only the loss reductions and the contrastive
logits generate collectives.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.pretrain.train_state import PretrainConfig, PretrainState
from moleculesde_tpu.pretrain.train_step import make_pretrain_step


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_spec(axis_name: str = "data") -> GraphBatch:
    """PartitionSpec pytree for a GraphBatch: shard every array's leading axis."""
    return P(axis_name)


def shard_batch(batch: GraphBatch, mesh: Mesh, axis_name: str = "data") -> GraphBatch:
    """Place a host GraphBatch on the mesh, molecules split across devices."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_pretrain_step(
    models: Dict[str, Any], cfg: PretrainConfig, mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """jit the pretrain step with replicated state and data-sharded batch.

    Under GSPMD the per-device gradients are all-reduced over ICI
    automatically; the returned state stays replicated.
    """
    step_fn = make_pretrain_step(models, cfg, jit=False)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def batch_shardings(batch: GraphBatch):
        return jax.tree_util.tree_map(lambda _: data, batch)

    def sharded_step(state: PretrainState, batch: GraphBatch, key, coeff):
        return step_fn(state, batch, key, coeff)

    # Shardings for the GraphBatch are uniform (leading-axis) so we can use
    # a pytree prefix: state/key/coeff replicated, batch data-sharded.
    return jax.jit(
        sharded_step,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
