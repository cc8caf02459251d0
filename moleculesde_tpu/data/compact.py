"""Compact host batches + on-device featurization (TPU ingest fast path).

The padded :class:`~moleculesde_tpu.core.batch.GraphBatch` ships ~18 MB/batch
at the flagship pretrain sizes (batch 1024, n_max 32) — dominated by the
quadratic extended-graph edge lists (``ext_*``: ``B * n_max^2`` entries).
With the device step at ~5 ms, host->device transfer is the binding
constraint of sustained training (VERDICT r2 #1), especially behind a
network-tunneled TPU.

This module moves featurization onto the TPU:

- :class:`CompactBatch`: the minimal facts of a molecule batch — int16 atom
  features, f32 positions, int16 *graph-local* bond endpoints — ~1.8 MB at
  batch 1024 (10x less H2D traffic).  Bond lists stay padded per-graph
  (``[B, e_max, .]``) so shapes are static.
- :func:`expand_on_device`: inside the jitted train step, rebuilds everything
  the models consume: flat global edge lists for the 2D GNN, and the
  reference's 4-hop extended graph (reference Geom3D/datasets/dataset_3D.py:
  11-34, host numpy port in ``data/extend.py``) as DENSE ``[B, N, N]``
  boolean matrix powers on the MXU — which is the exact form the 2D->3D
  score model wants (``score_2d3d._pair_mask_attr`` previously re-scattered
  the host-built edge lists into this same dense mask).  The host never
  computes the extension at all on this path.
- :func:`collate_compact` / :func:`collate_compact_packed`: host collation
  into a CompactBatch; the packed variant is pure vectorized numpy gathers
  over :class:`~moleculesde_tpu.data.packed.PackedGraphs` flat arrays (no
  per-molecule Python objects).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from moleculesde_tpu.core.batch import (
    GraphBatch,
    NUM_ATOM_FEATURES,
    NUM_BOND_FEATURES,
)


class CompactBatch(struct.PyTreeNode):
    """Minimal statically-shaped batch; expanded on device by
    :func:`expand_on_device`.

    - ``atom_feats``: ``[B, n_max, 9]`` int16 (zero-padded rows)
    - ``positions``: ``[B, n_max, 3]`` float32
    - ``n_atoms``: ``[B]`` int32 real-atom counts (nodes are contiguous)
    - ``edge_index``: ``[B, e_max, 2]`` int16 graph-LOCAL bond endpoints
    - ``edge_feats``: ``[B, e_max, 3]`` int16 OGB bond features
    - ``edge_valid``: ``[B, e_max]`` bool (edges need not be contiguous:
      collation drops bonds touching truncated atoms in place)
    """

    atom_feats: jnp.ndarray
    positions: jnp.ndarray
    n_atoms: jnp.ndarray
    edge_index: jnp.ndarray
    edge_feats: jnp.ndarray
    edge_valid: jnp.ndarray
    y: Optional[jnp.ndarray] = None
    forces: Optional[jnp.ndarray] = None
    num_graphs: int = struct.field(pytree_node=False, default=1)
    n_max: int = struct.field(pytree_node=False, default=32)
    e_max: int = struct.field(pytree_node=False, default=128)
    use_extend: bool = struct.field(pytree_node=False, default=True)


# --------------------------------------------------------------------- device
def dense_extend(
    adj: jnp.ndarray, bond_type: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device 4-hop graph extension, ``[B, N, N]`` dense.

    Exact semantics of the host ``data/extend.py::extend_graph`` (itself the
    port of reference dataset_3D.py:11-34): two rounds of boolean squaring
    minus self-loops give the extended mask; labels are OGB bond type + 1 on
    real bonds and ``10 + hop`` (BFS hops 2..4) on shortcut edges.  The
    boolean powers run as tiny ``[B, 32, 32]`` f32 matmuls on the MXU.
    """
    n = adj.shape[-1]
    off_diag = ~jnp.eye(n, dtype=bool)[None]
    a = adj & off_diag
    af = a.astype(jnp.float32)

    def bsq(x):  # boolean square via matmul
        return jnp.matmul(x.astype(jnp.float32), af) > 0

    b1 = (a | bsq(a)) & off_diag
    b2 = (b1 | (jnp.matmul(b1.astype(jnp.float32), b1.astype(jnp.float32)) > 0)
          ) & off_diag

    # BFS hop distance 1..4 via walk powers (first-appearance = shortest)
    hop = jnp.where(a, 1, 0)
    reach = a
    cur = af
    for k in range(2, 5):
        cur = jnp.matmul(cur, af)
        new = (cur > 0) & ~reach & off_diag
        hop = jnp.where(new & b2, k, hop)
        reach = reach | new
    attr = jnp.where(hop == 1, bond_type, 10 + hop)
    attr = jnp.where(b2, attr, 0).astype(jnp.int32)
    return b2, attr


def expand_on_device(cb: CompactBatch) -> GraphBatch:
    """CompactBatch -> GraphBatch, entirely inside jit (one XLA program with
    the train step; all ops batch-local, so data-parallel sharding of the
    leading axis needs no collectives)."""
    b, n, e = cb.num_graphs, cb.n_max, cb.e_max

    node_mask = (jnp.arange(n) < cb.n_atoms[:, None]).reshape(b * n)
    atom_feats = cb.atom_feats.astype(jnp.int32).reshape(b * n,
                                                         NUM_ATOM_FEATURES)
    positions = cb.positions.reshape(b * n, 3)

    s_l = cb.edge_index[..., 0].astype(jnp.int32)  # [B, e] local
    d_l = cb.edge_index[..., 1].astype(jnp.int32)
    valid = cb.edge_valid
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    edge_src = jnp.where(valid, s_l + base, 0).reshape(b * e)
    edge_dst = jnp.where(valid, d_l + base, 0).reshape(b * e)
    edge_feats = jnp.where(valid[..., None], cb.edge_feats.astype(jnp.int32),
                           0).reshape(b * e, NUM_BOND_FEATURES)
    edge_mask = valid.reshape(b * e)

    # dense bond adjacency + bond-type labels, scatter-free: TPU scatters
    # serialize (the [B, N, N] pred scatter of the host-extended path costs
    # 1.4 ms/step at batch 256 in the device trace), while the same gather
    # expressed as one-hot MXU matmuls over the per-graph padded bond lists
    # is microseconds.  Duplicate bonds would sum their one-hots, so divide
    # the value plane by the pair multiplicity (scatter-set semantics).
    vf = valid.astype(jnp.float32)
    s_oh = jax.nn.one_hot(s_l, n, dtype=jnp.float32) * vf[..., None]  # [B,e,n]
    d_oh = jax.nn.one_hot(d_l, n, dtype=jnp.float32)
    count = jnp.einsum("bes,bed->bsd", s_oh, d_oh)
    adj = count > 0
    val = (cb.edge_feats[..., 0].astype(jnp.float32) + 1.0)
    vsum = jnp.einsum("bes,bed->bsd", s_oh * val[..., None], d_oh)
    btype = jnp.where(
        adj, (vsum / jnp.maximum(count, 1.0) + 0.5), 0.0).astype(jnp.int32)

    if cb.use_extend:
        ext_mask_d, ext_attr_d = dense_extend(adj, btype)
    else:
        ext_mask_d, ext_attr_d = adj, jnp.where(adj, btype, 0)

    return GraphBatch(
        atom_feats=atom_feats, node_mask=node_mask, positions=positions,
        edge_src=edge_src, edge_dst=edge_dst, edge_feats=edge_feats,
        edge_mask=edge_mask,
        # list-form ext aliases the bond graph; the sole ext consumer
        # (score_2d3d._pair_mask_attr) prefers the dense form below
        ext_src=edge_src, ext_dst=edge_dst,
        ext_attr=jnp.where(edge_mask, edge_feats[:, 0] + 1, 0),
        ext_mask=edge_mask,
        ext_dense_mask=ext_mask_d, ext_dense_attr=ext_attr_d,
        y=cb.y,
        forces=(cb.forces.reshape(b * n, 3) if cb.forces is not None else None),
        num_graphs=b, n_max=n,
    )


# ----------------------------------------------------------------------- host
def collate_compact(
    graphs: Sequence[Mapping[str, Any]],
    n_max: int,
    e_max: int,
    num_graphs: Optional[int] = None,
    num_tasks: Optional[int] = None,
    with_forces: bool = False,
    use_extend: bool = True,
) -> CompactBatch:
    """Generic (list-of-dict) compact collation; mirrors
    ``core.batch.pad_graphs`` truncation semantics (atoms clipped at n_max,
    bonds touching clipped atoms or beyond e_max dropped)."""
    b = num_graphs if num_graphs is not None else len(graphs)
    atom = np.zeros((b, n_max, NUM_ATOM_FEATURES), dtype=np.int16)
    pos = np.zeros((b, n_max, 3), dtype=np.float32)
    cnt = np.zeros((b,), dtype=np.int32)
    ei = np.zeros((b, e_max, 2), dtype=np.int16)
    ef = np.zeros((b, e_max, NUM_BOND_FEATURES), dtype=np.int16)
    ev = np.zeros((b, e_max), dtype=bool)
    y = np.zeros((b, num_tasks), dtype=np.float32) if num_tasks else None
    forces = np.zeros((b, n_max, 3), dtype=np.float32) if with_forces else None

    for gi, g in enumerate(graphs):
        af = np.asarray(g["atom_feats"])
        if af.ndim == 1:
            full = np.zeros((af.shape[0], NUM_ATOM_FEATURES), np.int16)
            full[:, 0] = af
            af = full
        n = min(af.shape[0], n_max)
        cnt[gi] = n
        atom[gi, :n] = af[:n]
        if g.get("positions") is not None:
            pos[gi, :n] = np.asarray(g["positions"], np.float32)[:n]
        if with_forces and g.get("forces") is not None:
            forces[gi, :n] = np.asarray(g["forces"], np.float32)[:n]
        if y is not None and g.get("y") is not None:
            yr = np.asarray(g["y"], np.float32).reshape(-1)
            y[gi, : yr.shape[0]] = yr[: y.shape[1]]
        e_idx = np.asarray(g.get("edge_index", np.zeros((2, 0))), np.int64)
        ne = e_idx.shape[1] if e_idx.size else 0
        if ne:
            keep = np.flatnonzero((e_idx[0] < n) & (e_idx[1] < n))[:e_max]
            k = len(keep)
            ei[gi, :k, 0] = e_idx[0, keep]
            ei[gi, :k, 1] = e_idx[1, keep]
            fe = np.asarray(g.get("edge_feats", np.zeros((ne, 3))), np.int16)
            ef[gi, :k] = fe.reshape(-1, NUM_BOND_FEATURES)[keep]
            ev[gi, :k] = True

    return CompactBatch(
        atom_feats=atom, positions=pos, n_atoms=cnt, edge_index=ei,
        edge_feats=ef, edge_valid=ev, y=y, forces=forces,
        num_graphs=b, n_max=n_max, e_max=e_max, use_extend=use_extend)


def collate_compact_packed(
    dataset,
    idx: np.ndarray,
    n_max: int,
    e_max: int,
    num_graphs: Optional[int] = None,
    num_tasks: Optional[int] = None,
    with_forces: bool = False,
    use_extend: bool = True,
) -> CompactBatch:
    """Vectorized compact collation straight off ``PackedGraphs`` flat
    arrays: a handful of fancy-index gathers per batch, no per-molecule
    Python objects (the host side of the sustained-ingest path)."""
    from moleculesde_tpu.data.packed import PackedSubset

    if isinstance(dataset, PackedSubset):
        idx = dataset.indices[np.asarray(idx)]
        packed = dataset.packed
    else:
        idx = np.asarray(idx)
        packed = dataset
    a = packed.arrays
    b = num_graphs if num_graphs is not None else len(idx)
    nb = len(idx)

    no = np.asarray(a["node_offsets"])
    cnt_full = (no[idx + 1] - no[idx]).astype(np.int64)
    cnt = np.minimum(cnt_full, n_max)

    def ragged_gather(starts, counts, cap):
        """(row, col, src) index triples for a [nb, cap] left-packed layout."""
        counts = np.minimum(counts, cap)
        total = int(counts.sum())
        rows = np.repeat(np.arange(nb), counts)
        cum = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=cum[1:])
        cols = np.arange(total) - np.repeat(cum[:-1], counts)
        srcs = np.repeat(starts, counts) + cols
        return rows, cols, srcs

    atom = np.zeros((b, n_max, NUM_ATOM_FEATURES), dtype=np.int16)
    pos = np.zeros((b, n_max, 3), dtype=np.float32)
    cnt_out = np.zeros((b,), dtype=np.int32)
    cnt_out[:nb] = cnt
    r, c, s = ragged_gather(no[idx], cnt, n_max)
    atom[r, c] = a["atom_feats"][s]
    if "positions" in a:
        pos[r, c] = a["positions"][s]
    forces = None
    if with_forces and "forces" in a:
        forces = np.zeros((b, n_max, 3), dtype=np.float32)
        forces[r, c] = a["forces"][s]

    eo = np.asarray(a["edge_offsets"])
    ecnt = np.minimum((eo[idx + 1] - eo[idx]).astype(np.int64), e_max)
    ei = np.zeros((b, e_max, 2), dtype=np.int16)
    ef = np.zeros((b, e_max, NUM_BOND_FEATURES), dtype=np.int16)
    ev = np.zeros((b, e_max), dtype=bool)
    r, c, s = ragged_gather(eo[idx], ecnt, e_max)
    pair = a["edge_index"][s]  # [E, 2] local endpoints
    feats = a["edge_feats"][s]
    # drop (in place) bonds touching atoms clipped by n_max
    ok = (pair[:, 0] < cnt[r]) & (pair[:, 1] < cnt[r])
    ei[r, c] = np.where(ok[:, None], pair, 0)
    ef[r, c] = np.where(ok[:, None], feats, 0)
    ev[r, c] = ok

    y = None
    if num_tasks:
        y = np.zeros((b, num_tasks), dtype=np.float32)
        if "y" in a:
            yv = np.asarray(a["y"][idx], np.float32)
            y[:nb, : yv.shape[1]] = yv[:, :num_tasks]

    return CompactBatch(
        atom_feats=atom, positions=pos, n_atoms=cnt_out, edge_index=ei,
        edge_feats=ef, edge_valid=ev, y=y, forces=forces,
        num_graphs=b, n_max=n_max, e_max=e_max, use_extend=use_extend)
