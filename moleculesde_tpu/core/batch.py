"""Padded, statically-shaped molecular graph batches.

This is the TPU-native replacement for PyG's ragged concatenated-graph
``Batch`` used throughout the reference (e.g. reference
examples/pretrain_MoleculeSDE.py:125-152 consumes ``batch.x``,
``batch.edge_index``, ``batch.edge_attr``, ``batch.positions``,
``batch.batch``).  Instead of ragged per-batch node/edge counts, every
molecule is padded to a fixed node budget ``n_max`` and fixed edge budgets,
so XLA compiles one program per (batch_size, n_max, e_max) bucket.

Layout convention: node-major-by-graph.  Node ``i`` of graph ``b`` lives at
flat index ``b * n_max + i``.  This makes PyG's ``to_dense_batch``
(reference Geom3D/models/MoleculeSDE/SDE_model_3D_to_2D_node_adj_dense.py:130)
a free ``reshape`` and keeps all segment ops sorted-by-construction.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

# Number of categorical atom / bond features in the OGB molecular featurizer
# (reference uses ogb.utils.features.atom_to_feature_vector /
# bond_to_feature_vector; see reference Geom3D/datasets/dataset_utils.py:73-112).
NUM_ATOM_FEATURES = 9
NUM_BOND_FEATURES = 3
# Cardinality of each OGB categorical atom feature (ogb master
# ogb/utils/features.py `get_atom_feature_dims`).  First entry is the
# 119-way atomic-number class used throughout the reference
# (reference Geom3D/datasets/dataset_utils.py:70 `atom_type_count = 119`).
ATOM_FEATURE_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS = (5, 6, 2)
NUM_ATOM_CLASSES = 119


class GraphBatch(struct.PyTreeNode):
    """A fixed-shape batch of ``num_graphs`` molecules padded to ``n_max`` atoms.

    Array fields (all statically shaped; ``N = num_graphs * n_max``):

    - ``atom_feats``: ``[N, 9]`` int32 OGB categorical atom features; column 0
      is ``atomic_number - 1`` (the 119-class used by 3D models).
    - ``node_mask``: ``[N]`` bool; True for real atoms.
    - ``positions``: ``[N, 3]`` float32 conformer coordinates (zeros when 2D-only).
    - ``edge_src`` / ``edge_dst``: ``[E]`` int32 flat (global) node indices of
      the bond graph, both directions included; padded edges point at node 0.
    - ``edge_feats``: ``[E, 3]`` int32 OGB bond features.
    - ``edge_mask``: ``[E]`` bool.
    - ``ext_src`` / ``ext_dst`` / ``ext_attr`` / ``ext_mask``: the 1/2/3-hop
      "extended" graph (reference Geom3D/datasets/dataset_3D.py:12-35);
      ``ext_attr`` is the small-int edge label fed to the bond-type embedding
      of SDEModel2Dto3D_03/04 (reference SDE_model_2D_to_3D.py:540).  When the
      extended graph is disabled these simply alias the bond graph.
    - ``y``: optional ``[num_graphs, T]`` float32 graph labels.
    - ``forces``: optional ``[N, 3]`` float32 per-atom force labels (MD17).

    Static fields: ``num_graphs``, ``n_max``.
    """

    atom_feats: jnp.ndarray
    node_mask: jnp.ndarray
    positions: jnp.ndarray
    edge_src: jnp.ndarray
    edge_dst: jnp.ndarray
    edge_feats: jnp.ndarray
    edge_mask: jnp.ndarray
    ext_src: jnp.ndarray
    ext_dst: jnp.ndarray
    ext_attr: jnp.ndarray
    ext_mask: jnp.ndarray
    y: Optional[jnp.ndarray] = None
    forces: Optional[jnp.ndarray] = None
    # Dense extended graph ``[B, n_max, n_max]`` (mask bool / attr int32),
    # set by the device-side ingest path (data/compact.py::expand_on_device).
    # When present, the 2D->3D score model uses these directly instead of
    # re-scattering the ``ext_*`` edge lists.
    ext_dense_mask: Optional[jnp.ndarray] = None
    ext_dense_attr: Optional[jnp.ndarray] = None
    num_graphs: int = struct.field(pytree_node=False, default=1)
    n_max: int = struct.field(pytree_node=False, default=32)

    @property
    def num_nodes(self) -> int:
        return self.num_graphs * self.n_max

    @property
    def atomic_numbers(self) -> jnp.ndarray:
        """119-class atomic-number index (= atomic number - 1), ``[N]`` int32."""
        return self.atom_feats[:, 0]

    def node2graph(self) -> jnp.ndarray:
        """Graph id of every (flat) node slot, ``[N]`` int32."""
        return node2graph_ids(self.num_graphs, self.n_max)

    def nodes_per_graph(self) -> jnp.ndarray:
        """Number of real atoms per graph, ``[num_graphs]`` int32."""
        return self.node_mask.reshape(self.num_graphs, self.n_max).sum(axis=1)

    def dense_nodes(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reshape flat per-node data ``[N, ...]`` to dense ``[B, n_max, ...]``.

        Free-of-charge equivalent of PyG ``to_dense_batch`` (reference
        SDE_model_3D_to_2D_node_adj_dense.py:130) thanks to the node-major
        layout.
        """
        return x.reshape((self.num_graphs, self.n_max) + x.shape[1:])

    def dense_adjacency(self, edge_values: jnp.ndarray) -> jnp.ndarray:
        """Scatter per-bond values into a dense ``[B, n_max, n_max]`` adjacency.

        Equivalent of PyG ``to_dense_adj`` with per-edge scalar attributes
        (reference SDE_model_3D_to_2D_node_adj_dense.py:129).  Padded edges
        are routed out-of-bounds and dropped by XLA scatter.
        """
        b = self.edge_src // self.n_max
        i = self.edge_src % self.n_max
        j = self.edge_dst % self.n_max
        # Invalid edges get batch index == num_graphs -> dropped (mode="drop").
        b = jnp.where(self.edge_mask, b, self.num_graphs)
        adj = jnp.zeros(
            (self.num_graphs, self.n_max, self.n_max), dtype=edge_values.dtype
        )
        return adj.at[b, i, j].set(edge_values, mode="drop")


def node2graph_ids(num_graphs: int, n_max: int) -> jnp.ndarray:
    return jnp.repeat(jnp.arange(num_graphs, dtype=jnp.int32), n_max)


def pad_graphs(
    graphs: Sequence[Mapping[str, Any]],
    n_max: int,
    e_max: int,
    ext_e_max: Optional[int] = None,
    num_graphs: Optional[int] = None,
    num_tasks: Optional[int] = None,
    with_forces: bool = False,
) -> GraphBatch:
    """Collate a list of raw numpy graph dicts into one padded ``GraphBatch``.

    Each graph dict carries numpy arrays:
      ``atom_feats [n,9] | node features``, ``edge_index [2,e]``,
      ``edge_feats [e,3]``, optionally ``positions [n,3]``,
      ``ext_edge_index [2,ee]``, ``ext_edge_attr [ee]``, ``y [T]``,
      ``forces [n,3]``.

    Molecules larger than ``n_max`` (or with more edges than the budget) are
    truncated with a warning-free clip — callers should bucket sizes so this
    does not happen in practice.  Host-side (numpy) so it can run in a data
    loader process; the returned arrays are numpy and become device arrays on
    first use inside jit.
    """
    b = num_graphs if num_graphs is not None else len(graphs)
    assert len(graphs) <= b
    if ext_e_max is None:
        ext_e_max = e_max

    atom_feats = np.zeros((b * n_max, NUM_ATOM_FEATURES), dtype=np.int32)
    node_mask = np.zeros((b * n_max,), dtype=bool)
    positions = np.zeros((b * n_max, 3), dtype=np.float32)
    edge_src = np.zeros((b * e_max,), dtype=np.int32)
    edge_dst = np.zeros((b * e_max,), dtype=np.int32)
    edge_feats = np.zeros((b * e_max, NUM_BOND_FEATURES), dtype=np.int32)
    edge_mask = np.zeros((b * e_max,), dtype=bool)
    ext_src = np.zeros((b * ext_e_max,), dtype=np.int32)
    ext_dst = np.zeros((b * ext_e_max,), dtype=np.int32)
    ext_attr = np.zeros((b * ext_e_max,), dtype=np.int32)
    ext_mask = np.zeros((b * ext_e_max,), dtype=bool)

    y = None
    if num_tasks is not None:
        y = np.zeros((b, num_tasks), dtype=np.float32)
    forces = np.zeros((b * n_max, 3), dtype=np.float32) if with_forces else None

    for g_idx, g in enumerate(graphs):
        n = min(int(np.asarray(g["atom_feats"]).shape[0]), n_max)
        base = g_idx * n_max
        af = np.asarray(g["atom_feats"], dtype=np.int32)
        if af.ndim == 1:  # atomic-number-only graphs (MD17)
            full = np.zeros((af.shape[0], NUM_ATOM_FEATURES), dtype=np.int32)
            full[:, 0] = af
            af = full
        atom_feats[base : base + n] = af[:n]
        node_mask[base : base + n] = True
        if "positions" in g and g["positions"] is not None:
            positions[base : base + n] = np.asarray(g["positions"], np.float32)[:n]
        if with_forces and "forces" in g and g["forces"] is not None:
            forces[base : base + n] = np.asarray(g["forces"], np.float32)[:n]
        if y is not None and "y" in g and g["y"] is not None:
            y[g_idx] = np.asarray(g["y"], np.float32).reshape(-1)[: y.shape[1]]

        def _fill(src_arr, dst_arr, attr_arr, mask_arr, eidx, eattr, budget, slot):
            ei = np.asarray(eidx, dtype=np.int32)
            e = ei.shape[1] if ei.size else 0
            keep = np.flatnonzero((ei[0] < n) & (ei[1] < n))[:budget] if e else []
            e = len(keep)
            ebase = g_idx * budget
            if e:
                src_arr[ebase : ebase + e] = ei[0, keep] + base
                dst_arr[ebase : ebase + e] = ei[1, keep] + base
                mask_arr[ebase : ebase + e] = True
                if eattr is not None and attr_arr is not None:
                    ea = np.asarray(eattr)
                    attr_arr[ebase : ebase + e] = ea[keep]

        _fill(
            edge_src, edge_dst, edge_feats, edge_mask,
            g.get("edge_index", np.zeros((2, 0))), g.get("edge_feats"), e_max, g_idx,
        )
        if "ext_edge_index" in g and g["ext_edge_index"] is not None:
            _fill(
                ext_src, ext_dst, ext_attr, ext_mask,
                g["ext_edge_index"], g.get("ext_edge_attr"), ext_e_max, g_idx,
            )
        else:
            # Extended graph disabled: alias the plain bond graph
            # (reference SDE_model_2D_to_3D.py:312-315 falls back to edge_index).
            ei = np.asarray(g.get("edge_index", np.zeros((2, 0))), dtype=np.int32)
            ea = np.asarray(g.get("edge_feats", np.zeros((0, 3))), dtype=np.int32)
            scalar_attr = ea[:, 0] + 1 if ea.size else None
            _fill(ext_src, ext_dst, ext_attr, ext_mask, ei, scalar_attr, ext_e_max, g_idx)

    return GraphBatch(
        atom_feats=atom_feats,
        node_mask=node_mask,
        positions=positions,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_feats=edge_feats,
        edge_mask=edge_mask,
        ext_src=ext_src,
        ext_dst=ext_dst,
        ext_attr=ext_attr,
        ext_mask=ext_mask,
        y=y,
        forces=forces,
        num_graphs=b,
        n_max=n_max,
    )
