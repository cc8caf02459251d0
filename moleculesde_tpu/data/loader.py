"""Host batching pipeline: shuffle + fixed-shape padded collation.

The TPU-native replacement for PyG's ragged ``DataLoader`` (reference uses it
at examples/pretrain_MoleculeSDE.py:195).  Every emitted batch has identical
static shapes (one XLA program for the whole epoch); the final partial batch
is padded with fully-masked empty graphs and the loader reports the real
graph count so eval loops can slice predictions.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from moleculesde_tpu.core.batch import GraphBatch, pad_graphs


class GraphLoader:
    """Iterate padded :class:`GraphBatch` objects over a list of graph dicts.

    Yields ``(batch, n_real_graphs)``.  With ``drop_last`` (training), only
    full batches are produced; otherwise the tail batch is padded with empty
    graphs (``n_real_graphs`` < ``batch_size``).
    """

    def __init__(
        self,
        graphs: Sequence[Dict],
        batch_size: int,
        n_max: int,
        e_max: Optional[int] = None,
        ext_e_max: Optional[int] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_tasks: Optional[int] = None,
        with_forces: bool = False,
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.n_max = n_max
        self.e_max = e_max if e_max is not None else 4 * n_max
        self.ext_e_max = ext_e_max if ext_e_max is not None else n_max * n_max
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_tasks = num_tasks
        self.with_forces = with_forces
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[GraphBatch, int]]:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            order = self._rng.permutation(order)
        self._epoch += 1

        bs = self.batch_size
        n_batches = len(self)
        for b in range(n_batches):
            idx = order[b * bs : (b + 1) * bs]
            chunk = [self.graphs[i] for i in idx]
            batch = self._collate(chunk, bs)
            yield batch, len(chunk)

    def _collate(self, chunk, bs):
        # native C++ fast path (native/collate.cpp), numpy fallback
        from moleculesde_tpu.data.native_collate import native_pad_graphs

        batch = native_pad_graphs(
            chunk, n_max=self.n_max, e_max=self.e_max,
            ext_e_max=self.ext_e_max, num_graphs=bs,
            num_tasks=self.num_tasks, with_forces=self.with_forces)
        if batch is not None:
            return batch
        return pad_graphs(
            chunk, n_max=self.n_max, e_max=self.e_max,
            ext_e_max=self.ext_e_max, num_graphs=bs,
            num_tasks=self.num_tasks, with_forces=self.with_forces)


def max_atoms(graphs: Sequence[Dict]) -> int:
    return max(int(np.asarray(g["atom_feats"]).shape[0]) for g in graphs)


def suggest_buckets(graphs: Sequence[Dict], candidates=(16, 32, 64, 128)) -> int:
    """Smallest power-of-two-ish bucket covering every molecule."""
    m = max_atoms(graphs)
    for c in candidates:
        if m <= c:
            return c
    return m
