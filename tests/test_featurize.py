"""Golden tests for the RDKit-independent data core (VERDICT round-1 #3/#5).

The featurizer re-implements the OGB vocabularies as static tables
(data/featurize.py; reference Geom3D/datasets/dataset_utils.py:73-112
delegating to ogb.utils.features).  Neither RDKit nor OGB is installed in
this image, so the tests drive `atom_to_feature_vector` /
`bond_to_feature_vector` / `mol_to_graph_2d/3d` through duck-typed stub
atoms/bonds against hand-computed OGB feature vectors, and the scaffold
splitters through an injected `generate_scaffold`.
"""

import numpy as np
import pytest

from moleculesde_tpu.data import featurize
from moleculesde_tpu.data import splitters


class StubAtom:
    def __init__(self, z, chiral="CHI_UNSPECIFIED", degree=0, charge=0,
                 num_h=0, rad=0, hyb="SP3", arom=False, ring=False):
        self._d = dict(z=z, chiral=chiral, degree=degree, charge=charge,
                       num_h=num_h, rad=rad, hyb=hyb, arom=arom, ring=ring)

    def GetAtomicNum(self): return self._d["z"]
    def GetChiralTag(self): return self._d["chiral"]
    def GetTotalDegree(self): return self._d["degree"]
    def GetFormalCharge(self): return self._d["charge"]
    def GetTotalNumHs(self): return self._d["num_h"]
    def GetNumRadicalElectrons(self): return self._d["rad"]
    def GetHybridization(self): return self._d["hyb"]
    def GetIsAromatic(self): return self._d["arom"]
    def IsInRing(self): return self._d["ring"]


class StubBond:
    def __init__(self, i, j, btype="SINGLE", stereo="STEREONONE", conj=False):
        self.i, self.j = i, j
        self._btype, self._stereo, self._conj = btype, stereo, conj

    def GetBeginAtomIdx(self): return self.i
    def GetEndAtomIdx(self): return self.j
    def GetBondType(self): return self._btype
    def GetStereo(self): return self._stereo
    def GetIsConjugated(self): return self._conj


class StubConformer:
    def __init__(self, pos):
        self._pos = np.asarray(pos, dtype=np.float64)

    def GetPositions(self): return self._pos


class StubMol:
    def __init__(self, atoms, bonds, conformers=()):
        self._atoms, self._bonds = atoms, bonds
        self._confs = list(conformers)

    def GetAtoms(self): return self._atoms
    def GetBonds(self): return self._bonds
    def GetConformer(self, idx=0): return self._confs[idx]


def test_atom_feature_vector_golden():
    """Hand-computed OGB 9-dim vectors (ogb/utils/features.py tables; the
    reference asserts feature[0] == atomic_number - 1, dataset_utils.py:78-80)."""
    a = StubAtom(z=6, chiral="CHI_TETRAHEDRAL_CW", degree=3, charge=-1,
                 num_h=2, rad=1, hyb="SP2", arom=True, ring=False)
    assert featurize.atom_to_feature_vector(a) == [5, 1, 3, 4, 2, 1, 1, 1, 0]

    # a plain sp3 ring carbon
    c = StubAtom(z=6, degree=4, num_h=2, ring=True)
    assert featurize.atom_to_feature_vector(c) == [5, 0, 4, 5, 2, 0, 2, 0, 1]

    # nitrogen, +1 charge, aromatic
    n = StubAtom(z=7, degree=3, charge=1, hyb="SP2", arom=True, ring=True)
    assert featurize.atom_to_feature_vector(n) == [6, 0, 3, 6, 0, 0, 1, 1, 1]


def test_atom_feature_vector_misc_fallbacks():
    """Out-of-vocabulary values hit the trailing 'misc' index, as in OGB's
    safe_index."""
    a = StubAtom(z=119, chiral="CHI_OTHER", degree=15, charge=7, num_h=12,
                 rad=7, hyb="UNSPECIFIED")
    v = featurize.atom_to_feature_vector(a)
    assert v == [118, 3, 11, 11, 9, 5, 5, 0, 0]


def test_bond_feature_vector_golden():
    b = StubBond(0, 1, btype="DOUBLE", stereo="STEREOZ", conj=True)
    assert featurize.bond_to_feature_vector(b) == [1, 1, 1]
    b2 = StubBond(0, 1, btype="AROMATIC", stereo="STEREOE", conj=True)
    assert featurize.bond_to_feature_vector(b2) == [3, 2, 1]
    b3 = StubBond(0, 1, btype="DATIVE")  # unknown type -> misc
    assert featurize.bond_to_feature_vector(b3) == [4, 0, 0]


def _water_like():
    atoms = [StubAtom(z=8, degree=2, num_h=2),
             StubAtom(z=1, degree=1), StubAtom(z=1, degree=1)]
    bonds = [StubBond(0, 1), StubBond(0, 2)]
    return atoms, bonds


def test_mol_to_graph_2d_both_directions():
    atoms, bonds = _water_like()
    g = featurize.mol_to_graph_2d(StubMol(atoms, bonds))
    assert g["atom_feats"].shape == (3, 9)
    assert g["atom_feats"][0, 0] == 7  # oxygen: z-1
    # each bond emitted in both directions in (i,j),(j,i) order
    # (reference dataset_utils.py:88-95)
    np.testing.assert_array_equal(g["edge_index"],
                                  [[0, 1, 0, 2], [1, 0, 2, 0]])
    assert g["edge_feats"].shape == (4, 3)
    np.testing.assert_array_equal(g["edge_feats"][0], g["edge_feats"][1])


def test_mol_to_graph_2d_no_bonds():
    g = featurize.mol_to_graph_2d(StubMol([StubAtom(z=2)], []))
    assert g["edge_index"].shape == (2, 0)
    assert g["edge_feats"].shape == (0, 3)


def test_mol_to_graph_2d_extend():
    """extend=True produces the 1/2/3-hop shortcut graph
    (reference dataset_3D.py:12-35 via data/extend.py)."""
    atoms = [StubAtom(z=6, degree=2) for _ in range(4)]
    bonds = [StubBond(i, i + 1) for i in range(3)]  # path graph 0-1-2-3
    g = featurize.mol_to_graph_2d(StubMol(atoms, bonds), extend=True)
    pairs = set(zip(g["ext_edge_index"][0].tolist(),
                    g["ext_edge_index"][1].tolist()))
    # 2-hop (0,2) and 3-hop (0,3) shortcuts appear
    assert (0, 2) in pairs and (0, 3) in pairs


def test_mol_to_graph_3d_centering():
    atoms, bonds = _water_like()
    pos = [[1.0, 0.0, 0.0], [2.0, 0.0, 0.0], [3.0, 3.0, 0.0]]
    mol = StubMol(atoms, bonds, [StubConformer(pos)])
    g = featurize.mol_to_graph_3d(mol, remove_center=True, extend=False)
    np.testing.assert_allclose(g["positions"].mean(axis=0), 0.0, atol=1e-6)
    g2 = featurize.mol_to_graph_3d(mol, remove_center=False, extend=False)
    np.testing.assert_allclose(g2["positions"], np.asarray(pos, np.float32))


# ---------------------------------------------------------------------------
# scaffold splitters with an injected scaffold function
# ---------------------------------------------------------------------------


@pytest.fixture
def fake_scaffolds(monkeypatch):
    # smiles string IS the scaffold label
    monkeypatch.setattr(splitters, "generate_scaffold",
                        lambda s, include_chirality=True: s.split(":")[0])


def test_scaffold_split_greedy_fill(fake_scaffolds):
    """Greedy (size, first-index)-descending fill against the reference index
    semantics (reference examples/splitters.py:21-108)."""
    smiles = (["A:%d" % i for i in range(4)]      # scaffold A: idx 0-3
              + ["B:%d" % i for i in range(3)]    # B: idx 4-6
              + ["C:%d" % i for i in range(2)]    # C: idx 7-8
              + ["D:0"])                          # D: idx 9
    tr, va, te = splitters.scaffold_split(smiles)
    # cutoffs: train 8.0, valid 9.0 -> A,B -> train; C overflows into valid;
    # D still fits train
    assert tr.tolist() == [0, 1, 2, 3, 4, 5, 6, 9]
    assert va.tolist() == [7, 8]
    assert te.tolist() == []


def test_scaffold_split_tiebreak_and_test_bucket(fake_scaffolds):
    """Equal-size scaffolds order by first index DESCENDING (reverse sort on
    (size, first)); overfull groups spill to test."""
    # P: idx 0,5 ; Q: idx 1,2 ; R: idx 3,4 -- all size 2
    smiles = ["P:a", "Q:a", "Q:b", "R:a", "R:b", "P:b"]
    tr, va, te = splitters.scaffold_split(
        smiles, frac_train=0.4, frac_valid=0.3, frac_test=0.3)
    # order: R (first=3), Q (first=1), P (first=0); cutoffs 2.4 / 4.2
    assert tr.tolist() == [3, 4]
    assert va.tolist() == [1, 2]
    assert te.tolist() == [0, 5]


def test_scaffold_split_task_label_filter(fake_scaffolds):
    smiles = ["A:0", "A:1", "B:0", "B:1"]
    labels = np.array([1.0, 0.0, 1.0, 1.0])  # index 1 is null -> excluded
    tr, va, te = splitters.scaffold_split(smiles, task_labels=labels)
    all_idx = sorted(tr.tolist() + va.tolist() + te.tolist())
    assert all_idx == [0, 2, 3]


def test_random_scaffold_split_group_integrity(fake_scaffolds):
    smiles = ["%s:%d" % (chr(65 + i % 5), i) for i in range(40)]
    tr, va, te = splitters.random_scaffold_split(smiles, seed=3)
    groups = {}
    for i, s in enumerate(smiles):
        groups.setdefault(s.split(":")[0], set()).add(i)
    split_of = {}
    for name, idx in (("tr", tr), ("va", va), ("te", te)):
        for i in idx:
            split_of[int(i)] = name
    assert len(split_of) == 40
    for members in groups.values():
        assert len({split_of[i] for i in members}) == 1  # never split a group
