"""RDKit molecule -> padded-array featurization (host side).

Mirrors the reference featurizers (reference Geom3D/datasets/dataset_utils.py:
``mol_to_graph_data_obj_simple_2D`` l.73-112 and ``..._3D`` l.115-169), which
delegate per-atom/per-bond features to OGB's ``atom_to_feature_vector`` /
``bond_to_feature_vector``.  The OGB vocabularies are reproduced here as
static tables (ogb master ogb/utils/features.py) so the featurizer has no OGB
dependency; RDKit itself is imported lazily and gated — every function raises
a clear error when RDKit is unavailable (this image ships without it), and
the rest of the framework (synthetic data, training, sampling) runs fine
without ever importing this module.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from moleculesde_tpu.data.extend import extend_graph


def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401

        return Chem
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "RDKit is required for molecule featurization but is not "
            "installed. Precompute graphs elsewhere or use the synthetic "
            "data pipeline (moleculesde_tpu.data.synthetic)."
        ) from e


# --- OGB categorical vocabularies (ogb/utils/features.py) --------------------
CHIRALITY = [
    "CHI_UNSPECIFIED", "CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW", "CHI_OTHER",
]
DEGREE = list(range(11)) + ["misc"]
FORMAL_CHARGE = list(range(-5, 6)) + ["misc"]
NUM_H = list(range(9)) + ["misc"]
NUM_RADICAL_E = list(range(5)) + ["misc"]
HYBRIDIZATION = ["SP", "SP2", "SP3", "SP3D", "SP3D2", "misc"]
BOND_TYPE = ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC", "misc"]
BOND_STEREO = [
    "STEREONONE", "STEREOZ", "STEREOE", "STEREOCIS", "STEREOTRANS", "STEREOANY",
]


def _safe_index(table, value) -> int:
    try:
        return table.index(value)
    except ValueError:
        return len(table) - 1


def atom_to_feature_vector(atom) -> List[int]:
    """9-dim OGB atom features; feature 0 == atomic_number - 1 (asserted by the
    reference at dataset_utils.py:78-80)."""
    return [
        atom.GetAtomicNum() - 1,
        _safe_index(CHIRALITY, str(atom.GetChiralTag())),
        _safe_index(DEGREE, atom.GetTotalDegree()),
        _safe_index(FORMAL_CHARGE, atom.GetFormalCharge()),
        _safe_index(NUM_H, atom.GetTotalNumHs()),
        _safe_index(NUM_RADICAL_E, atom.GetNumRadicalElectrons()),
        _safe_index(HYBRIDIZATION, str(atom.GetHybridization())),
        int(atom.GetIsAromatic()),
        int(atom.IsInRing()),
    ]


def bond_to_feature_vector(bond) -> List[int]:
    """3-dim OGB bond features."""
    return [
        _safe_index(BOND_TYPE, str(bond.GetBondType())),
        _safe_index(BOND_STEREO, str(bond.GetStereo())),
        int(bond.GetIsConjugated()),
    ]


def mol_to_graph_2d(mol, extend: bool = False) -> Dict[str, np.ndarray]:
    """RDKit mol -> graph dict (both-direction bonds), matching the reference
    2D featurizer (dataset_utils.py:73-112)."""
    atom_feats = np.array(
        [atom_to_feature_vector(a) for a in mol.GetAtoms()], dtype=np.int32
    ).reshape(-1, 9)

    src, dst, efeat = [], [], []
    for bond in mol.GetBonds():
        i, j = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        f = bond_to_feature_vector(bond)
        src += [i, j]
        dst += [j, i]
        efeat += [f, f]
    edge_index = np.array([src, dst], dtype=np.int32).reshape(2, -1)
    edge_feats = np.array(efeat, dtype=np.int32).reshape(-1, 3)

    g = {"atom_feats": atom_feats, "edge_index": edge_index, "edge_feats": edge_feats}
    if extend:
        ext_index, ext_attr = extend_graph(len(atom_feats), edge_index, edge_feats)
        g["ext_edge_index"] = ext_index
        g["ext_edge_attr"] = ext_attr
    return g


def mol_to_graph_3d(
    mol, conformer_idx: int = 0, remove_center: bool = True, extend: bool = True
) -> Dict[str, np.ndarray]:
    """RDKit mol with conformer -> graph dict with centered positions,
    matching the reference 3D featurizer (dataset_utils.py:115-169) plus the
    pretrain-view centering (dataset_3D.py:120-122)."""
    g = mol_to_graph_2d(mol, extend=extend)
    conf = mol.GetConformer(conformer_idx)
    pos = np.asarray(conf.GetPositions(), dtype=np.float32)
    if remove_center:
        pos = pos - pos.mean(axis=0, keepdims=True)
    g["positions"] = pos
    return g


def smiles_to_graph_2d(smiles: str, extend: bool = False) -> Optional[Dict[str, np.ndarray]]:
    """SMILES -> 2D graph dict; None for unparseable molecules (matching the
    MoleculeNet loaders' skip-on-failure behavior)."""
    Chem = _require_rdkit()
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    return mol_to_graph_2d(mol, extend=extend)


def smiles_to_graph_3d_mmff(
    smiles: str, num_conformers: int = 5, remove_center: bool = True,
    extend: bool = True,
) -> Optional[Dict[str, np.ndarray]]:
    """SMILES -> 3D graph via MMFF94s conformer generation with 2D-coordinate
    fallback (reference dataset_utils.py:35-65: embed multiple conformers,
    keep the lowest-energy one; on failure fall back to Compute2DCoords)."""
    Chem = _require_rdkit()
    from rdkit.Chem import AllChem

    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    mol = Chem.AddHs(mol)
    try:
        AllChem.EmbedMultipleConfs(mol, num_conformers)
        results = AllChem.MMFFOptimizeMoleculeConfs(mol, mmffVariant="MMFF94s")
        energies = [r[1] for r in results]
        best = int(np.argmin(energies))
    except Exception:
        AllChem.Compute2DCoords(mol)
        best = 0
    return mol_to_graph_3d(mol, conformer_idx=best, remove_center=remove_center,
                           extend=extend)
