import os
import tempfile

import numpy as np
import pytest

from moleculesde_tpu.data.datasets import (
    QM9_CONVERSION,
    HARTREE2EV,
    load_md17,
    load_moleculenet_labels,
    parse_qm9_thermo_file,
    qm9_targets_from_table,
)
from moleculesde_tpu.data.extend import extend_graph
from moleculesde_tpu.data.loader import GraphLoader, suggest_buckets
from moleculesde_tpu.data.splitters import (
    md17_split,
    qm9_random_customized_01,
    qm9_random_customized_02,
    random_split,
)
from moleculesde_tpu.data.synthetic import random_molecule


def test_extend_graph_path():
    """5-node path graph: matches the reference's inline smoke check
    (dataset_3D.py:137-179) — extension adds 2/3/4-hop shortcuts."""
    edge_index = np.array([[0, 1, 1, 2, 2, 3, 3, 4], [1, 0, 2, 1, 3, 2, 4, 3]])
    ext, attr = extend_graph(5, edge_index)
    pairs = set(zip(ext[0].tolist(), ext[1].tolist()))
    # all off-diagonal pairs of a 5-path are within 4 hops
    expected = {(i, j) for i in range(5) for j in range(5) if i != j}
    assert pairs == expected
    # no self loops
    assert all(i != j for i, j in pairs)
    # 1-hop edges keep bond-type labels (0 here since no edge_feats given)
    hop1 = [a for (i, j), a in zip(zip(ext[0], ext[1]), attr) if abs(i - j) == 1]
    assert all(a == 0 for a in hop1)
    hop2 = [a for (i, j), a in zip(zip(ext[0], ext[1]), attr) if abs(i - j) == 2]
    assert all(a == 12 for a in hop2)


def test_extend_graph_attrs_with_bonds():
    edge_index = np.array([[0, 1], [1, 0]])
    edge_feats = np.array([[2, 0, 1], [2, 0, 1]], dtype=np.int32)
    ext, attr = extend_graph(3, edge_index, edge_feats)
    d = {(i, j): a for i, j, a in zip(ext[0], ext[1], attr)}
    assert d[(0, 1)] == 3  # bond type + 1


def test_random_split_partitions():
    tr, va, te = random_split(100, seed=42)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert set(tr) | set(va) | set(te) == set(range(100))


def test_qm9_splits_subset_fallback():
    tr, va, te = qm9_random_customized_01(1000, seed=0)
    assert len(tr) + len(va) + len(te) == 1000
    assert len(set(tr) & set(va)) == 0
    tr2, va2, te2 = qm9_random_customized_02(1000, seed=0)
    assert len(tr2) + len(va2) + len(te2) == 1000


def test_md17_split():
    tr, va, te = md17_split(5000)
    assert len(tr) == 1000 and len(va) == 1000 and len(te) == 3000


def test_md17_loader_roundtrip(tmp_path):
    n_frames, n_atoms = 7, 5
    rng = np.random.default_rng(0)
    path = tmp_path / "aspirin_dft.npz"
    np.savez(
        path,
        E=rng.normal(size=(n_frames, 1)),
        F=rng.normal(size=(n_frames, n_atoms, 3)),
        R=rng.normal(size=(n_frames, n_atoms, 3)),
        z=np.array([6, 6, 8, 1, 1]),
    )
    graphs, stats = load_md17(str(path))
    assert len(graphs) == n_frames
    g = graphs[0]
    np.testing.assert_array_equal(g["atom_feats"], [5, 5, 7, 0, 0])
    assert g["positions"].shape == (n_atoms, 3)
    assert g["forces"].shape == (n_atoms, 3)
    assert np.isfinite(stats["energy_mean"])


def test_qm9_target_conversion():
    raw = np.zeros((2, 12))
    raw[0] = [1, 2, -0.2, -0.1, 0.1, 3, 0.5, -10, -10, -10, -10, 4]
    counts = [{1: 2, 6: 1}, {8: 1}]
    therm = {"u0": {1: -0.5, 6: -37.8}, "zpve": {1: 0.01, 6: 0.1},
             "u298": {}, "h298": {}, "g298": {}, "cv": {}}
    out = qm9_targets_from_table(raw, counts, therm, calculate_thermo=True)
    assert out.shape == (2, 13)
    # gap_02 = lumo - homo, converted to eV
    np.testing.assert_allclose(out[0, 12], (-0.1 - -0.2) * HARTREE2EV, rtol=1e-5)
    # u0 minus thermo refs then eV conversion
    expected_u0 = (-10 - (2 * -0.5 + 1 * -37.8)) * HARTREE2EV
    np.testing.assert_allclose(out[0, 7], expected_u0, rtol=1e-5)
    # mu unconverted
    np.testing.assert_allclose(out[0, 0], 1.0, rtol=1e-6)


def test_qm9_thermo_parse(tmp_path):
    p = tmp_path / "atomref.txt"
    p.write_text("# header\nH 0.01 -0.5 -0.49 -0.5 -0.51 0.0\nC 0.1 -37.8 -37.7 -37.8 -37.9 0.0\nXX 1 2 3\n")
    therm = parse_qm9_thermo_file(str(p))
    assert therm["zpve"][1] == 0.01
    assert therm["u0"][6] == -37.8


def test_moleculenet_label_convention(tmp_path):
    pd = pytest.importorskip("pandas")
    csv = tmp_path / "tox21.csv"
    cols = ["NR-AR", "NR-AR-LBD", "NR-AhR", "NR-Aromatase", "NR-ER",
            "NR-ER-LBD", "NR-PPAR-gamma", "SR-ARE", "SR-ATAD5", "SR-HSE",
            "SR-MMP", "SR-p53"]
    df = pd.DataFrame({
        "smiles": ["CCO", "CCC"],
        **{c: [1.0, 0.0] for c in cols},
    })
    df.loc[1, "NR-AR"] = np.nan
    df.to_csv(csv, index=False)
    smiles, labels = load_moleculenet_labels("tox21", str(csv))
    assert smiles == ["CCO", "CCC"]
    assert labels.shape == (2, 12)
    assert labels[0, 0] == 1.0
    assert labels[1, 1] == -1.0  # 0 -> -1
    assert labels[1, 0] == 0.0   # nan -> 0


def test_graph_loader_shapes_and_tail():
    rng = np.random.default_rng(1)
    graphs = [random_molecule(rng, int(rng.integers(3, 9))) for _ in range(10)]
    loader = GraphLoader(graphs, batch_size=4, n_max=8, shuffle=True,
                         drop_last=False, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    sizes = [n for _, n in batches]
    assert sorted(sizes) == [2, 4, 4]
    for batch, n_real in batches:
        assert batch.num_graphs == 4
        assert batch.atom_feats.shape == (32, 9)
        # empty pad graphs fully masked
        per_graph = np.asarray(batch.nodes_per_graph())
        assert (per_graph[:n_real] > 0).all()
        assert (per_graph[n_real:] == 0).all()


def test_graph_loader_drop_last_and_shuffle_determinism():
    rng = np.random.default_rng(2)
    graphs = [random_molecule(rng, 5) for _ in range(10)]
    l1 = GraphLoader(graphs, batch_size=4, n_max=8, seed=7)
    l2 = GraphLoader(graphs, batch_size=4, n_max=8, seed=7)
    assert len(l1) == 2
    b1 = [np.asarray(b.atom_feats) for b, _ in l1]
    b2 = [np.asarray(b.atom_feats) for b, _ in l2]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)


def test_suggest_buckets():
    rng = np.random.default_rng(3)
    graphs = [random_molecule(rng, 20) for _ in range(3)]
    assert suggest_buckets(graphs) == 32


def test_bfs_subgraph_mask():
    from moleculesde_tpu.data.masking import apply_subgraph_mask, bfs_subgraph_mask

    rng = np.random.default_rng(0)
    # 10-node path graph
    ei = np.array([[i for i in range(9)] + [i + 1 for i in range(9)],
                   [i + 1 for i in range(9)] + [i for i in range(9)]])
    kept, masked = bfs_subgraph_mask(10, ei, mask_ratio=0.3, rng=rng)
    assert len(kept) == 7 and len(masked) == 3
    assert set(kept) | set(masked) == set(range(10))
    assert set(kept) & set(masked) == set()

    g = random_molecule(rng, 8)
    g2 = apply_subgraph_mask(g, 0.25, seed=1)
    assert "masked_atom_indices" in g2
    assert "masked_atom_indices" not in g
    assert len(g2["masked_atom_indices"]) == 8 - int(8 * 0.75)


def test_bucketed_loader():
    from moleculesde_tpu.data.loader import BucketedGraphLoader

    rng = np.random.default_rng(4)
    graphs = [random_molecule(rng, n) for n in
              list(rng.integers(3, 8, 20)) + list(rng.integers(9, 16, 12))]
    loader = BucketedGraphLoader(graphs, batch_size=4, buckets=(8, 16),
                                 shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 5 + 3
    seen_shapes = {b.n_max for b, _ in batches}
    assert seen_shapes == {8, 16}
    total = 0
    for b, n_real in batches:
        assert b.atom_feats.shape[0] == 4 * b.n_max
        per_graph = np.asarray(b.nodes_per_graph())
        assert (per_graph[:n_real] <= b.n_max).all()
        total += n_real
    assert total == 32


def test_nx_roundtrip():
    pytest.importorskip("networkx")
    from moleculesde_tpu.data.nx_convert import graph_to_nx, nx_to_graph

    rng = np.random.default_rng(5)
    g = random_molecule(rng, 6)
    nxg = graph_to_nx(g)
    assert nxg.number_of_nodes() == 6
    back = nx_to_graph(nxg)
    np.testing.assert_array_equal(back["atom_feats"], g["atom_feats"])
    np.testing.assert_allclose(back["positions"], g["positions"], atol=1e-6)
    # undirected edge sets match
    orig = {tuple(sorted(p)) for p in zip(g["edge_index"][0], g["edge_index"][1])}
    rt = {tuple(sorted(p)) for p in zip(back["edge_index"][0], back["edge_index"][1])}
    assert orig == rt


def test_loader_reports_drop_last_counts(capsys):
    from moleculesde_tpu.data.loader import BucketedGraphLoader, GraphLoader
    from moleculesde_tpu.data.synthetic import random_molecule

    rng = np.random.default_rng(0)
    graphs = [random_molecule(rng, 6, extend=False) for _ in range(10)]
    loader = GraphLoader(graphs, batch_size=4, n_max=8, drop_last=True)
    list(loader)
    out = capsys.readouterr().out
    assert "discards 2/10" in out
    assert loader.last_epoch_dropped == 2

    # bucketed: sub-loaders stay quiet, parent reports per-bucket counts
    graphs = ([random_molecule(rng, 6, extend=False) for _ in range(5)]
              + [random_molecule(rng, 12, extend=False) for _ in range(7)])
    bloader = BucketedGraphLoader(graphs, batch_size=4, buckets=(8, 16))
    list(bloader)
    out = capsys.readouterr().out
    assert "bucket 8: 1" in out and "bucket 16: 3" in out
    assert out.count("discards") == 1


def test_loader_warns_on_budget_truncation():
    from moleculesde_tpu.data.loader import GraphLoader
    from moleculesde_tpu.data.synthetic import random_molecule

    rng = np.random.default_rng(1)
    graphs = [random_molecule(rng, 12, extend=False) for _ in range(4)]
    loader = GraphLoader(graphs, batch_size=4, n_max=8, e_max=64,
                         shuffle=False, drop_last=False)
    with pytest.warns(UserWarning, match="truncating molecules"):
        batches = list(loader)
    assert len(batches) == 1
    # warned once only
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        list(loader)  # second epoch: no re-warn
