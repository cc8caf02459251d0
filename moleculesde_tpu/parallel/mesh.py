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
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    In a multi-process run ``jax.devices()`` already spans every host's
    chips, so the same constructor yields the global pod-slice mesh."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bring-up (SURVEY.md section 2: ``jax.distributed.initialize``
    + per-host data sharding).  No-op for single-process runs; returns the
    resulting process count.

    On TPU pods the three arguments are auto-detected from the environment
    and may be left None; on CPU/GPU clusters pass them explicitly
    (``--dist_coordinator host:port --dist_num_processes N
    --dist_process_id i``)."""
    if num_processes is not None and num_processes <= 1:
        return 1
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count()


def shard_for_process(
    graphs, process_index: Optional[int] = None,
    process_count: Optional[int] = None, equalize: bool = True,
):
    """Deterministic per-host shard of a dataset: strided, disjoint, covering
    (up to the equalizing truncation).

    ``equalize`` trims every shard to the minimum shard size so all
    processes execute the SAME number of (collective) training steps per
    epoch — a multi-process GSPMD program deadlocks if one host runs out of
    batches early.  Works on lists and on packed datasets (uses ``.subset``
    index views, no dict materialization)."""
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index()
    n = len(graphs)
    take = n // process_count if equalize else None
    idx = np.arange(process_index, n, process_count)[:take]
    if hasattr(graphs, "subset"):
        return graphs.subset(idx)
    return [graphs[int(i)] for i in idx]


def global_batch_putter(mesh: Mesh, axis_name: str = "data") -> Callable:
    """Returns ``put(local_batch) -> global GraphBatch`` assembling each
    host's local padded batch into one batch-sharded global ``jax.Array``
    per field (``jax.make_array_from_process_local_data``).

    The flat node-major indexing of GraphBatch (node ``i`` of graph ``b`` at
    ``b * n_max + i``) makes the global view a pure concatenation along axis
    0 — except the edge endpoint arrays, whose flat indices must shift by
    this host's node offset in the global batch.  Padded edges point at the
    local base row; they are masked out by every consumer, so the shift is
    harmless for them.  Single-process meshes take the same path (local ==
    global), so tests and the driver dryrun exercise exactly the
    production code."""
    sharding = NamedSharding(mesh, P(axis_name))
    pid = jax.process_index()

    def put(batch: GraphBatch) -> GraphBatch:
        from moleculesde_tpu.data.compact import CompactBatch

        if isinstance(batch, CompactBatch):
            # compact batches carry graph-LOCAL bond endpoints and leading-
            # axis-B arrays only: global assembly is pure concatenation,
            # no index shifting at all
            assembled = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), batch)
            return assembled.replace(
                num_graphs=batch.num_graphs * jax.process_count())
        node_offset = pid * batch.num_nodes

        def mk(x, offset=0):
            x = np.asarray(x)
            if offset:
                x = x + np.asarray(offset, dtype=x.dtype)
            return jax.make_array_from_process_local_data(sharding, x)

        replaced = dict(
            edge_src=mk(batch.edge_src, node_offset),
            edge_dst=mk(batch.edge_dst, node_offset),
            ext_src=mk(batch.ext_src, node_offset),
            ext_dst=mk(batch.ext_dst, node_offset),
            num_graphs=batch.num_graphs * jax.process_count(),
        )
        for name in ("atom_feats", "node_mask", "positions", "edge_feats",
                     "edge_mask", "ext_attr", "ext_mask", "y", "forces"):
            val = getattr(batch, name)
            replaced[name] = mk(val) if val is not None else None
        return batch.replace(**replaced)

    return put


def batch_spec(axis_name: str = "data") -> GraphBatch:
    """PartitionSpec pytree for a GraphBatch: shard every array's leading axis."""
    return P(axis_name)


def shard_batch(batch: GraphBatch, mesh: Mesh, axis_name: str = "data") -> GraphBatch:
    """Place a host GraphBatch on the mesh, molecules split across devices."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: every host holds the identical full array (flax init is
    PRNG/shape-deterministic), so the local data IS the global replicated
    value.  Device-resident leaves are spread with device-to-device copies
    and assembled via ``make_array_from_single_device_arrays`` — no
    device->host round-trip (on tunneled TPUs the first D2H permanently
    degrades per-program dispatch latency; see CLAUDE.md)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        local_devs = [d for d in mesh.devices.flat
                      if d.process_index == jax.process_index()]

        def rep(x):
            shards = [jax.device_put(x, d) for d in local_devs]
            return jax.make_array_from_single_device_arrays(
                np.shape(x), sharding, shards)

        return jax.tree_util.tree_map(rep, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def sharded_jit(
    fn: Callable,
    mesh: Mesh,
    arg_kinds: Sequence[str],
    out_kinds=None,
    donate_argnums=(),
    axis_name: str = "data",
) -> Callable:
    """jit ``fn`` with per-argument data-parallel shardings.

    ``arg_kinds[i]`` is ``"data"`` (shard argument i's leading axis across
    the mesh; applies as a pytree prefix, so a whole GraphBatch shards
    uniformly) or ``"repl"`` (replicate).  ``out_kinds`` mirrors that for
    outputs: a single kind string applies to the whole output tree, a
    sequence maps over the output tuple; ``None`` lets GSPMD propagate.

    This is the one primitive behind every sharded step/sampler in the
    framework (SURVEY.md section 2: scaling is mesh + sharding annotations +
    XLA collectives, never hand-written comms).  Cross-molecule reductions
    inside ``fn`` (losses, BN batch stats, the corrector's global SNR norm)
    become ICI all-reduces automatically, so numerical parity with the
    single-device program holds to reduction-reorder tolerance.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    kinds = {"data": data, "repl": repl}
    in_sh = tuple(kinds[k] for k in arg_kinds)
    if out_kinds is None:
        out_sh = None
        return jax.jit(fn, in_shardings=in_sh, donate_argnums=donate_argnums)
    if isinstance(out_kinds, str):
        out_sh = kinds[out_kinds]
    else:
        out_sh = tuple(kinds[k] for k in out_kinds)
    return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh,
                   donate_argnums=donate_argnums)


def make_sharded_pretrain_step(
    models: Dict[str, Any], cfg: PretrainConfig, mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """jit the pretrain step with replicated state and data-sharded batch.

    Under GSPMD the per-device gradients are all-reduced over ICI
    automatically; the returned state stays replicated.

    ``cfg.microbatch`` composes: the accumulation scan uses the shard-aligned
    chunk layout (split_microbatches(..., shards=mesh.size)) so each chunk
    takes every device's j-th local block — the scan axis stays unsharded
    and no device idles (a contiguous split would put whole chunks on a
    subset of the mesh).
    """
    step_fn = make_pretrain_step(
        models, cfg, jit=False,
        shards=mesh.size if cfg.microbatch else 1)
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
