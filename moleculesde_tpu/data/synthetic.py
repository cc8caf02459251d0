"""Synthetic molecule generator for tests and benchmarks.

Produces random molecular graphs with the same statistics/shape contract as
the PCQM4Mv2 featurization (OGB categorical features, bonds in both
directions, centered 3D conformer coordinates, 1/2/3-hop extended edges) so
the full pretrain pipeline can be exercised and benchmarked without RDKit or
dataset downloads.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from moleculesde_tpu.core.batch import (
    ATOM_FEATURE_DIMS,
    BOND_FEATURE_DIMS,
    GraphBatch,
    pad_graphs,
)
from moleculesde_tpu.data.extend import extend_graph


def relax_positions(
    pos: np.ndarray,
    edge_index: np.ndarray,
    n_iter: int = 120,
    bond_len: float = 1.5,
    lr: float = 0.05,
    rep_dist: float = 2.0,
) -> np.ndarray:
    """Spring-relax a conformer so geometry reflects the FULL bond topology.

    Gradient descent on a toy force field: every bonded pair (chain AND
    chord) springs toward ``bond_len``; non-bonded pairs closer than
    ``rep_dist`` feel a soft repulsion.  Without this, the raw chain
    random walk ignores chord bonds entirely, making the conformer nearly
    independent of the graph — held-out 2D->3D generation, 3D->2D bond
    recovery, and cross-modal transfer labels are then information-starved
    by construction (the r5 diagnosis of the weak held-out quality and
    chance-level transfer numbers).  After relaxation, bonded distance
    ~``bond_len`` < ``rep_dist`` <= non-bonded distance, so topology is
    recoverable from geometry and chords fold the chain into graph-
    determined compact shapes (up to E(3) and basin multimodality — the
    conformer-multimodality COV/MAT metrics expect exactly that)."""
    n = pos.shape[0]
    if n < 2:
        return pos
    bonded = np.zeros((n, n), dtype=bool)
    bonded[edge_index[0], edge_index[1]] = True
    nonbonded = ~bonded & ~np.eye(n, dtype=bool)
    for _ in range(n_iter):
        d = pos[:, None] - pos[None, :]
        r = np.sqrt((d * d).sum(-1)) + 1e-9
        coef = np.where(bonded, (bond_len - r) / r, 0.0)
        coef += np.where(nonbonded & (r < rep_dist),
                         0.5 * (rep_dist - r) / r, 0.0)
        pos = pos + lr * (coef[..., None] * d).sum(axis=1)
    return (pos - pos.mean(axis=0, keepdims=True)).astype(np.float32)


def random_molecule(
    rng: np.random.Generator,
    n_atoms: int,
    extend: bool = True,
    with_positions: bool = True,
    geometric: bool = False,
) -> dict:
    """A random chain-plus-chords molecule dict (both-direction bond lists).

    ``geometric=True`` seeds the chain as a random walk with ~1.5-length
    bond steps and then spring-relaxes it against the full bond topology
    (:func:`relax_positions`), giving conformers a learnable
    graph->geometry relationship for overfit/quality/transfer studies
    (benchmarks/quality.py, benchmarks/transfer.py)."""
    atom_feats = np.stack(
        [rng.integers(0, d, size=n_atoms) for d in ATOM_FEATURE_DIMS], axis=1
    ).astype(np.int32)
    # chain backbone + a few random chords, deduplicated
    pairs = {(i, i + 1) for i in range(n_atoms - 1)}
    for _ in range(max(0, n_atoms // 3)):
        i, j = rng.integers(0, n_atoms, 2)
        if i != j:
            pairs.add((min(i, j), max(i, j)))
    src, dst = [], []
    for i, j in sorted(pairs):
        src += [i, j]
        dst += [j, i]
    edge_index = np.array([src, dst], dtype=np.int32)
    n_edges = edge_index.shape[1]
    edge_feats = np.stack(
        [rng.integers(0, d, size=n_edges // 2) for d in BOND_FEATURE_DIMS], axis=1
    ).astype(np.int32)
    edge_feats = np.repeat(edge_feats, 2, axis=0)  # same feature both directions

    g = {"atom_feats": atom_feats, "edge_index": edge_index, "edge_feats": edge_feats}
    if with_positions:
        if geometric:
            steps = rng.normal(size=(n_atoms, 3))
            steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
            pos = np.cumsum(1.5 * steps, axis=0).astype(np.float32)
            pos = relax_positions(pos, edge_index)
        else:
            pos = rng.normal(size=(n_atoms, 3)).astype(np.float32) * 1.5
        pos = pos - pos.mean(axis=0, keepdims=True)  # remove_center=True semantics
        g["positions"] = pos
    if extend:
        ext_index, ext_attr = extend_graph(n_atoms, edge_index, edge_feats)
        g["ext_edge_index"] = ext_index
        g["ext_edge_attr"] = ext_attr
    return g


def synthetic_compact_batch(
    num_graphs: int = 8,
    n_max: int = 16,
    e_max: Optional[int] = None,
    min_atoms: int = 4,
    seed: int = 0,
    num_tasks: Optional[int] = None,
    with_forces: bool = False,
):
    """Same random molecules as :func:`synthetic_batch`, collated into the
    production ingest form (:class:`~moleculesde_tpu.data.compact.CompactBatch`
    — minimal host arrays, featurization/extension on device inside the train
    step).  This is what ``examples/pretrain.py`` feeds the step, so benches
    and traces use it for the headline path."""
    from moleculesde_tpu.data.compact import collate_compact

    rng = np.random.default_rng(seed)
    graphs: List[dict] = []
    for _ in range(num_graphs):
        n = int(rng.integers(min_atoms, n_max + 1))
        g = random_molecule(rng, n, extend=False)
        if num_tasks is not None:
            g["y"] = rng.normal(size=(num_tasks,)).astype(np.float32)
        if with_forces:
            g["forces"] = rng.normal(size=(n, 3)).astype(np.float32)
        graphs.append(g)
    return collate_compact(
        graphs, n_max=n_max, e_max=e_max if e_max is not None else 4 * n_max,
        num_tasks=num_tasks, with_forces=with_forces)


def synthetic_batch(
    num_graphs: int = 8,
    n_max: int = 16,
    e_max: Optional[int] = None,
    ext_e_max: Optional[int] = None,
    min_atoms: int = 4,
    seed: int = 0,
    extend: bool = True,
    num_tasks: Optional[int] = None,
    with_forces: bool = False,
) -> GraphBatch:
    rng = np.random.default_rng(seed)
    graphs: List[dict] = []
    for _ in range(num_graphs):
        n = int(rng.integers(min_atoms, n_max + 1))
        g = random_molecule(rng, n, extend=extend)
        if num_tasks is not None:
            g["y"] = rng.normal(size=(num_tasks,)).astype(np.float32)
        if with_forces:
            g["forces"] = rng.normal(size=(n, 3)).astype(np.float32)
        graphs.append(g)
    if e_max is None:
        e_max = 4 * n_max
    if ext_e_max is None:
        ext_e_max = n_max * n_max
    return pad_graphs(
        graphs, n_max=n_max, e_max=e_max, ext_e_max=ext_e_max,
        num_tasks=num_tasks, with_forces=with_forces,
    )
