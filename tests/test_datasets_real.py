"""Real-data loader rehearsal: the RDKit-dependent parse loops of
data/datasets.py driven end-to-end over committed raw-format fixtures
(tests/fixtures/, VERDICT r2 #4).

Without RDKit installed, a duck-typed stand-in (tests/rdkit_stub.py: a real
V2000 SDF parser + toy SMILES) is injected as ``rdkit``; with real RDKit
these same tests run the genuine chemistry path unchanged (the fixtures are
valid V2000/CSV).  See README "Real-data runbook" for the full corpora.
"""

import os
import shutil

import numpy as np
import pytest

import rdkit_stub

rdkit_stub.install()

from moleculesde_tpu.data.datasets import (  # noqa: E402
    HARTREE2EV,
    load_moleculenet,
    load_pcqm4mv2,
    load_qm9,
    parse_qm9_thermo_file,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def test_load_qm9_fixture_skips_and_thermo():
    graphs, smiles = load_qm9(os.path.join(FIXTURES, "qm9"))
    # 6 records: one malformed (index 4), one uncharacterized (index 2)
    assert len(graphs) == 4
    assert len(smiles) == 4
    for g in graphs:
        assert g["y"].shape == (13,)
        assert np.all(np.isfinite(g["y"]))
        # pretrain-view centering (dataset_3D.py:120-122)
        np.testing.assert_allclose(g["positions"].mean(axis=0),
                                   np.zeros(3), atol=1e-4)

    # cross-check labels against the raw CSV: gap_02 = (lumo - homo) * Ha2eV,
    # u0 thermo-corrected by per-atom reference energies
    import pandas as pd

    df = pd.read_csv(os.path.join(FIXTURES, "qm9", "raw", "gdb9.sdf.csv"))
    therm = parse_qm9_thermo_file(
        os.path.join(FIXTURES, "qm9", "raw", "atomref.txt"))
    kept = [0, 1, 3, 5]  # 2 uncharacterized, 4 malformed
    for g, row in zip(graphs, kept):
        lumo, homo = df["lumo"][row], df["homo"][row]
        np.testing.assert_allclose(g["y"][12], (lumo - homo) * HARTREE2EV,
                                   rtol=1e-5)
        zs = g["atom_feats"][:, 0] + 1  # feature 0 = atomic number - 1
        corr = sum(therm["u0"].get(int(z), 0.0) for z in zs)
        np.testing.assert_allclose(
            g["y"][7], (df["u0"][row] - corr) * HARTREE2EV, rtol=1e-5)


def test_load_pcqm4mv2_fixture_packed_streaming(tmp_path):
    root = tmp_path / "pcqm4mv2"
    shutil.copytree(os.path.join(FIXTURES, "pcqm4mv2"), root)
    ds = load_pcqm4mv2(str(root))
    # 5 records, one malformed -> 4 molecules, packed + memmap-reloaded
    from moleculesde_tpu.data.packed import PackedGraphs

    assert isinstance(ds, PackedGraphs)
    assert len(ds) == 4
    import gzip

    with gzip.open(root / "raw" / "data.csv.gz", "rt") as f:
        gaps = [float(l.split(",")[2]) for l in f.read().splitlines()[1:]]
    kept = [0, 1, 3, 4]  # record 2 malformed; gap indexed by SDF position
    for k, row in enumerate(kept):
        np.testing.assert_allclose(ds[k]["y"][0], gaps[row], rtol=1e-5)
        g = ds[k]
        assert g["ext_edge_index"].shape[0] == 2  # extension ran
        assert np.all(np.isfinite(g["positions"]))
    # second call hits the packed cache (no SDF parse)
    os.remove(root / "raw" / "pcqm4m-v2-train.sdf")
    ds2 = load_pcqm4mv2(str(root))
    assert len(ds2) == 4


def test_load_pcqm4mv2_max_molecules(tmp_path):
    root = tmp_path / "pcqm4mv2"
    shutil.copytree(os.path.join(FIXTURES, "pcqm4mv2"), root)
    ds = load_pcqm4mv2(str(root), max_molecules=2)
    assert len(ds) == 2


def test_load_moleculenet_fixture_drop_and_labels():
    graphs, smiles = load_moleculenet(
        "bbbp", os.path.join(FIXTURES, "moleculenet", "bbbp", "raw",
                             "bbbp.csv.gz"))
    # 6 rows, one unparseable SMILES dropped
    assert len(graphs) == 5
    assert "XX(=" not in smiles
    # {1 -> 1, 0 -> -1, nan -> 0} convention (ref dataset_MoleculeNet_2D.py)
    labels = [float(g["y"][0]) for g in graphs]
    assert labels == [1.0, -1.0, 0.0, 1.0, -1.0]


def _real_rdkit() -> bool:
    import sys

    return getattr(sys.modules.get("rdkit"), "__file__", None) is not None


@pytest.mark.skipif(not _real_rdkit(), reason=(
    "requires real RDKit (the stub has no scaffold/MMFF chemistry)"))
def test_real_rdkit_scaffolds():  # pragma: no cover - needs RDKit image
    from moleculesde_tpu.data.splitters import generate_scaffold

    assert generate_scaffold("c1ccccc1CC") == generate_scaffold("c1ccccc1CCC")
