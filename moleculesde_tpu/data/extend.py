"""Multi-hop graph extension (host-side featurization step).

Numpy re-implementation of the reference's two-round sparse-matmul graph
extension (reference Geom3D/datasets/dataset_3D.py:11-34): starting from the
bond graph A, round one adds A^2 paths, round two squares the union again, so
the extended edge set covers shortcuts up to 4 hops, minus self-loops — done
here with boolean matrix powers (molecules are tiny; dense is fastest).

``extended_edge_attr``: the reference models index an Embedding(100) with
``data.extended_edge_attr`` (reference SDE_model_2D_to_3D.py:540) but the
reference datasets never construct that attribute (the 03/04 variants are
latently broken upstream).  We define it as: OGB bond type + 1 for real
bonds, and ``10 + hop`` for hop-k shortcut edges (k >= 2) — small ints well
inside the 100-row embedding.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def extend_graph(
    n_atoms: int, edge_index: np.ndarray, edge_feats: np.ndarray | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (ext_edge_index [2, E'], ext_edge_attr [E'])."""
    a = np.zeros((n_atoms, n_atoms), dtype=bool)
    if edge_index.size:
        a[edge_index[0], edge_index[1]] = True
    np.fill_diagonal(a, False)

    b1 = a | (a @ a)
    np.fill_diagonal(b1, False)
    b2 = b1 | (b1 @ b1)
    np.fill_diagonal(b2, False)

    # hop distance for attr labels: 1 = real bond, else BFS shortest hops
    bond_type = np.zeros((n_atoms, n_atoms), dtype=np.int64)
    if edge_feats is not None and edge_index.size:
        bond_type[edge_index[0], edge_index[1]] = edge_feats[:, 0].astype(np.int64) + 1

    hop = np.full((n_atoms, n_atoms), 0, dtype=np.int64)
    reach = a.copy()
    cur = a.copy()
    hop[a] = 1
    for k in range(2, 5):
        cur = (cur @ a)
        new = cur & ~reach
        np.fill_diagonal(new, False)
        hop[new & b2] = k
        reach |= new

    src, dst = np.nonzero(b2)
    attr = np.where(hop[src, dst] == 1, bond_type[src, dst], 10 + hop[src, dst])
    return np.stack([src, dst]).astype(np.int32), attr.astype(np.int32)
