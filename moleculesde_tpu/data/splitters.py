"""Dataset splitters: Bemis-Murcko scaffold, random scaffold, random, QM9 fixed.

Index-level re-implementation of the reference splitters (reference
examples/splitters.py) operating on plain index lists instead of PyG dataset
slices — the semantics (sort orders, cutoffs, RNG draws) are preserved so the
resulting index partitions are comparable with the reference.
"""

from __future__ import annotations

import random as _random
from typing import List, Optional, Sequence, Tuple

import numpy as np

Split = Tuple[np.ndarray, np.ndarray, np.ndarray]


def generate_scaffold(smiles: str, include_chirality: bool = True) -> str:
    """Bemis-Murcko scaffold SMILES (ref splitters.py:12-18)."""
    from rdkit.Chem.Scaffolds import MurckoScaffold

    return MurckoScaffold.MurckoScaffoldSmiles(
        smiles=smiles, includeChirality=include_chirality)


def scaffold_split(
    smiles_list: Sequence[str],
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    task_labels: Optional[np.ndarray] = None,
    null_value: float = 0,
) -> Split:
    """Deterministic scaffold split (ref splitters.py:21-108): group by
    scaffold, order groups by (size, first index) descending, then greedily
    fill train/valid/test up to the fraction cutoffs."""
    np.testing.assert_almost_equal(frac_train + frac_valid + frac_test, 1.0)

    if task_labels is not None:
        keep = [i for i, y in enumerate(task_labels) if y != null_value]
    else:
        keep = list(range(len(smiles_list)))

    all_scaffolds = {}
    for i in keep:
        scaffold = generate_scaffold(smiles_list[i], include_chirality=True)
        all_scaffolds.setdefault(scaffold, []).append(i)
    all_scaffolds = {k: sorted(v) for k, v in all_scaffolds.items()}
    scaffold_sets = [
        v for _, v in sorted(
            all_scaffolds.items(), key=lambda x: (len(x[1]), x[1][0]), reverse=True)
    ]

    n = len(keep)
    train_cutoff = frac_train * n
    valid_cutoff = (frac_train + frac_valid) * n
    train_idx: List[int] = []
    valid_idx: List[int] = []
    test_idx: List[int] = []
    for s in scaffold_sets:
        if len(train_idx) + len(s) > train_cutoff:
            if len(train_idx) + len(valid_idx) + len(s) > valid_cutoff:
                test_idx.extend(s)
            else:
                valid_idx.extend(s)
        else:
            train_idx.extend(s)
    return np.array(train_idx), np.array(valid_idx), np.array(test_idx)


def random_scaffold_split(
    smiles_list: Sequence[str],
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 0,
) -> Split:
    """Scaffold groups permuted randomly then filled greedily
    (ref splitters.py:111-178)."""
    rng = np.random.RandomState(seed)
    scaffolds = {}
    for i, smiles in enumerate(smiles_list):
        scaffold = generate_scaffold(smiles, include_chirality=True)
        scaffolds.setdefault(scaffold, []).append(i)
    scaffold_sets = rng.permutation(
        np.array(list(scaffolds.values()), dtype=object))

    n_total_valid = int(np.floor(frac_valid * len(smiles_list)))
    n_total_test = int(np.floor(frac_test * len(smiles_list)))
    train_idx: List[int] = []
    valid_idx: List[int] = []
    test_idx: List[int] = []
    for s in scaffold_sets:
        if len(valid_idx) + len(s) <= n_total_valid:
            valid_idx.extend(s)
        elif len(test_idx) + len(s) <= n_total_test:
            test_idx.extend(s)
        else:
            train_idx.extend(s)
    return np.array(train_idx), np.array(valid_idx), np.array(test_idx)


def random_split(
    num_mols: int,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 42,
    task_labels: Optional[np.ndarray] = None,
    null_value: float = 0,
) -> Split:
    """Plain random split (ref splitters.py:181-243; python-random shuffle)."""
    np.testing.assert_almost_equal(frac_train + frac_valid + frac_test, 1.0)
    if task_labels is not None:
        keep = [i for i, y in enumerate(task_labels) if y != null_value]
    else:
        keep = list(range(num_mols))
    all_idx = list(keep)
    _random.seed(seed)
    _random.shuffle(all_idx)
    n = len(all_idx)
    n_train = int(frac_train * n)
    n_valid = int(frac_valid * n)
    return (
        np.array(all_idx[:n_train]),
        np.array(all_idx[n_train : n_train + n_valid]),
        np.array(all_idx[n_train + n_valid :]),
    )


def qm9_random_customized_01(num_mols: int, seed: int = 0) -> Split:
    """110k/10k/rest permutation split (ref splitters.py:246-299)."""
    rng = np.random.RandomState(seed)
    all_idx = rng.permutation(num_mols)
    n_train, n_valid = 110000, 10000
    if num_mols < n_train + n_valid:  # small-subset fallback, same proportions
        n_train = int(num_mols * 110000 / 130831)
        n_valid = int(num_mols * 10000 / 130831)
    return (
        all_idx[:n_train],
        all_idx[n_train : n_train + n_valid],
        all_idx[n_train + n_valid :],
    )


def qm9_random_customized_02(num_mols: int, seed: int = 0) -> Split:
    """100k/~rest/10% permutation split (ref splitters.py:302-351)."""
    rng = np.random.RandomState(seed)
    all_idx = rng.permutation(num_mols)
    n_train = 100000
    n_test = int(0.1 * num_mols)
    if num_mols < n_train + n_test:
        n_train = int(num_mols * 100000 / 130831)
    n_valid = num_mols - n_train - n_test
    return (
        all_idx[:n_train],
        all_idx[n_train : n_train + n_valid],
        all_idx[n_train + n_valid :],
    )


def md17_split(num_frames: int, n_train: int = 1000, n_valid: int = 1000,
               seed: int = 42) -> Split:
    """Shuffled 1000/1000/rest frame split (ref dataset_MD17.py:74-78).
    Falls back to 60/20/20 proportions for sets smaller than the fixed
    counts (synthetic smoke runs)."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(num_frames)
    if num_frames <= n_train + n_valid:
        n_train = int(num_frames * 0.6)
        n_valid = int(num_frames * 0.2)
    return (
        idx[:n_train],
        idx[n_train : n_train + n_valid],
        idx[n_train + n_valid :],
    )
