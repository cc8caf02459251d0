import numpy as np
import pytest

from moleculesde_tpu.core.batch import pad_graphs
from moleculesde_tpu.data.native_collate import native_available, native_pad_graphs
from moleculesde_tpu.data.synthetic import random_molecule

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native collate lib unavailable")


def _graphs(n=6, seed=0, forces=False, tasks=None):
    rng = np.random.default_rng(seed)
    gs = []
    for _ in range(n):
        g = random_molecule(rng, int(rng.integers(3, 10)))
        if tasks:
            g["y"] = rng.normal(size=(tasks,)).astype(np.float32)
        if forces:
            g["forces"] = rng.normal(
                size=(g["atom_feats"].shape[0], 3)).astype(np.float32)
        gs.append(g)
    return gs


def test_native_matches_numpy_collation():
    graphs = _graphs(6, seed=1, forces=True, tasks=2)
    kwargs = dict(n_max=10, e_max=40, ext_e_max=100, num_graphs=8,
                  num_tasks=2, with_forces=True)
    ref = pad_graphs(graphs, **kwargs)
    nat = native_pad_graphs(graphs, **kwargs)
    assert nat is not None
    for field in ["atom_feats", "node_mask", "positions", "edge_src",
                  "edge_dst", "edge_feats", "edge_mask", "ext_src", "ext_dst",
                  "ext_attr", "ext_mask", "y", "forces"]:
        a = np.asarray(getattr(ref, field))
        b = np.asarray(getattr(nat, field))
        np.testing.assert_array_equal(a, b, err_msg=field)
    assert nat.num_graphs == ref.num_graphs and nat.n_max == ref.n_max


def test_native_truncation_matches():
    graphs = _graphs(3, seed=2)
    ref = pad_graphs(graphs, n_max=5, e_max=8, ext_e_max=12)
    nat = native_pad_graphs(graphs, n_max=5, e_max=8, ext_e_max=12)
    for field in ["atom_feats", "node_mask", "edge_src", "edge_dst",
                  "edge_mask", "ext_src", "ext_dst", "ext_mask"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, field)), np.asarray(getattr(nat, field)),
            err_msg=field)


def test_native_faster_than_numpy():
    import time

    graphs = _graphs(256, seed=3)
    kwargs = dict(n_max=16, e_max=64, ext_e_max=256)
    # warmup both
    native_pad_graphs(graphs, **kwargs)
    pad_graphs(graphs, **kwargs)
    t0 = time.time()
    for _ in range(3):
        native_pad_graphs(graphs, **kwargs)
    t_native = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        pad_graphs(graphs, **kwargs)
    t_numpy = time.time() - t0
    # the native path should never be slower (typically 3-10x faster)
    assert t_native < t_numpy * 1.5
