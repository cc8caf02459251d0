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


def random_molecule(
    rng: np.random.Generator,
    n_atoms: int,
    extend: bool = True,
    with_positions: bool = True,
    geometric: bool = False,
) -> dict:
    """A random chain-plus-chords molecule dict (both-direction bond lists).

    ``geometric=True`` lays the chain out as a random walk with ~1.5-length
    bond steps (instead of i.i.d. Gaussian coordinates), giving conformers a
    learnable graph->geometry relationship for overfit/quality studies
    (benchmarks/quality.py)."""
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
