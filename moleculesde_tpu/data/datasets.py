"""Dataset loaders: PCQM4Mv2, QM9, MD17, MoleculeNet-2D.

Host-side (numpy) re-implementations of the reference dataset classes
(reference Geom3D/datasets/).  Each loader produces a list of plain graph
dicts consumable by :func:`moleculesde_tpu.core.batch.pad_graphs` /
:class:`moleculesde_tpu.data.loader.GraphLoader`, replacing the reference's
PyG ``InMemoryDataset`` blobs.  Loaders that need RDKit (SMILES/SDF parsing)
import it lazily; MD17 is pure numpy.  Nothing here downloads — point the
loaders at locally staged raw files (this image has no network egress).
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# CODATA hartree->eV (scipy.constants value used by the reference,
# dataset_QM9.py:94-96)
HARTREE2EV = 27.211386245988

QM9_TARGET_FIELD = [
    "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
    "u0", "u298", "h298", "g298", "cv", "gap_02",
]
# per-target unit conversion (reference dataset_QM9.py:96-110)
QM9_CONVERSION = {
    "mu": 1.0, "alpha": 1.0, "homo": HARTREE2EV, "lumo": HARTREE2EV,
    "gap": HARTREE2EV, "gap_02": HARTREE2EV, "r2": 1.0, "zpve": HARTREE2EV,
    "u0": HARTREE2EV, "u298": HARTREE2EV, "h298": HARTREE2EV,
    "g298": HARTREE2EV, "cv": 1.0,
}
# targets with per-atom thermochemical reference energies (dataset_QM9.py:171-173)
QM9_THERMO_TARGETS = ["zpve", "u0", "u298", "h298", "g298", "cv"]
QM9_ATOM_DICT = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9}

# MoleculeNet task counts (reference examples/util.py:183-199)
MOLECULENET_NUM_TASKS = {
    "tox21": 12, "hiv": 1, "bace": 1, "bbbp": 1, "clintox": 2, "sider": 27,
    "toxcast": 617, "muv": 17, "esol": 1, "freesolv": 1, "lipophilicity": 1,
    "malaria": 1, "cep": 1, "pcba": 92, "donor": 1,
}

# classification CSV task columns (reference dataset_MoleculeNet_2D.py loaders)
_MOLECULENET_COLUMNS = {
    "tox21": (
        "smiles",
        ["NR-AR", "NR-AR-LBD", "NR-AhR", "NR-Aromatase", "NR-ER", "NR-ER-LBD",
         "NR-PPAR-gamma", "SR-ARE", "SR-ATAD5", "SR-HSE", "SR-MMP", "SR-p53"],
    ),
    "hiv": ("smiles", ["HIV_active"]),
    "bace": ("mol", ["Class"]),
    "bbbp": ("smiles", ["p_np"]),
    "clintox": ("smiles", ["FDA_APPROVED", "CT_TOX"]),
    "sider": ("smiles", None),     # all columns except smiles
    "toxcast": ("smiles", None),
    "muv": ("smiles", None),       # MUV-* columns
    "esol": ("smiles", ["measured log solubility in mols per litre"]),
    "freesolv": ("smiles", ["expt"]),
    "lipophilicity": ("smiles", ["exp"]),
    "malaria": ("smiles", ["activity"]),
    "cep": ("smiles", ["PCE"]),
}
_REGRESSION_DATASETS = {"esol", "freesolv", "lipophilicity", "malaria", "cep"}


# --------------------------------------------------------------------- MD17
def load_md17(npz_path: str) -> Tuple[List[Dict], Dict[str, np.ndarray]]:
    """Load an MD17 trajectory npz (keys E, F, R, z) into per-frame graph
    dicts ``{atom_feats(z-1), positions, y=E, forces=F}``
    (reference Geom3D/datasets/dataset_MD17.py:38-72)."""
    raw = np.load(npz_path)
    energies = np.asarray(raw["E"]).reshape(-1)
    forces = np.asarray(raw["F"])
    positions = np.asarray(raw["R"])
    z = np.asarray(raw["z"]).astype(np.int32)
    graphs = []
    for i in range(len(energies)):
        graphs.append({
            "atom_feats": (z - 1).astype(np.int32),  # 119-class index
            "positions": positions[i].astype(np.float32),
            "y": np.array([energies[i]], dtype=np.float32),
            "forces": forces[i].astype(np.float32),
            "edge_index": np.zeros((2, 0), dtype=np.int32),
            "edge_feats": np.zeros((0, 3), dtype=np.int32),
        })
    stats = {
        "energy_mean": energies.mean(), "energy_std": energies.std(),
        "force_mean": np.abs(forces).mean(),
    }
    return graphs, stats


# ---------------------------------------------------------------------- QM9
def parse_qm9_thermo_file(path: str) -> Dict[str, Dict[int, float]]:
    """Parse atomref.txt per-atom thermochemical energies
    (reference dataset_QM9.py:170-200)."""
    therm = {t: {} for t in QM9_THERMO_TARGETS}
    with open(path) as f:
        for line in f:
            split = line.split()
            if not split or split[0] not in QM9_ATOM_DICT:
                continue
            charge = QM9_ATOM_DICT[split[0]]
            for target, value in zip(QM9_THERMO_TARGETS, split[1:]):
                therm[target][charge] = float(value)
    return therm


def qm9_targets_from_table(
    raw_targets: np.ndarray,
    atom_counts: Sequence[Dict[int, int]],
    therm: Optional[Dict[str, Dict[int, float]]] = None,
    calculate_thermo: bool = True,
) -> np.ndarray:
    """Assemble the 13-target QM9 label matrix: add gap_02 = lumo - homo,
    subtract per-atom thermochemical energies, apply Hartree->eV conversions
    (reference dataset_QM9.py:202-260).

    ``raw_targets``: [n, 12] in pd_target_field order (mu..cv).
    ``atom_counts``: per-molecule {atomic_number: count}.
    """
    n = raw_targets.shape[0]
    out = np.zeros((n, 13), dtype=np.float64)
    out[:, :12] = raw_targets
    out[:, 12] = raw_targets[:, 3] - raw_targets[:, 2]  # gap_02 = lumo - homo

    for t_idx, name in enumerate(QM9_TARGET_FIELD):
        if calculate_thermo and therm is not None and name in QM9_THERMO_TARGETS:
            for mol_idx in range(n):
                for charge, count in atom_counts[mol_idx].items():
                    out[mol_idx, t_idx] -= therm[name].get(charge, 0.0) * count
        out[:, t_idx] *= QM9_CONVERSION[name]
    return out.astype(np.float32)


def load_qm9(
    root: str,
    calculate_thermo: bool = True,
    extend: bool = True,
    remove_center: bool = True,
) -> Tuple[List[Dict], List[str]]:
    """Load QM9 from raw gdb9 files under ``root/raw/``: gdb9.sdf +
    gdb9.sdf.csv + uncharacterized.txt + atomref.txt
    (reference dataset_QM9.py:202-295).  Requires RDKit.
    Returns (graph dicts with 13-target y, smiles list)."""
    import pandas as pd

    from rdkit import Chem

    from moleculesde_tpu.data.featurize import mol_to_graph_3d

    raw = os.path.join(root, "raw")
    df = pd.read_csv(os.path.join(raw, "gdb9.sdf.csv"))
    pd_fields = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
                 "u0", "u298", "h298", "g298", "cv"]
    raw_targets = df[pd_fields].to_numpy()

    # molecules flagged uncharacterized (3,054; reference dataset_QM9.py:213-215)
    with open(os.path.join(raw, "uncharacterized.txt")) as f:
        skip = {int(x.split()[0]) - 1 for x in f.read().split("\n")[9:-2]}

    therm = None
    atomref_path = os.path.join(raw, "atomref.txt")
    if calculate_thermo and os.path.exists(atomref_path):
        therm = parse_qm9_thermo_file(atomref_path)

    suppl = Chem.SDMolSupplier(
        os.path.join(raw, "gdb9.sdf"), removeHs=False, sanitize=False)
    graphs: List[Dict] = []
    smiles_list: List[str] = []
    kept_counts: List[Dict[int, int]] = []
    kept_rows: List[int] = []
    for i, mol in enumerate(suppl):
        if i in skip or mol is None:
            continue
        try:
            g = mol_to_graph_3d(mol, remove_center=remove_center, extend=extend)
        except Exception:
            continue
        counts: Dict[int, int] = {}
        for a in mol.GetAtoms():
            counts[a.GetAtomicNum()] = counts.get(a.GetAtomicNum(), 0) + 1
        graphs.append(g)
        kept_counts.append(counts)
        kept_rows.append(i)
        smiles_list.append(Chem.MolToSmiles(mol))

    targets = qm9_targets_from_table(
        raw_targets[kept_rows], kept_counts, therm, calculate_thermo)
    for g, y in zip(graphs, targets):
        g["y"] = y
    return graphs, smiles_list


# ---------------------------------------------------------------- PCQM4Mv2
def load_pcqm4mv2(
    root: str,
    max_molecules: Optional[int] = None,
    extend: bool = True,
    remove_center: bool = True,
    packed: bool = True,
):
    """Load the PCQM4Mv2 pretraining set from ``root/raw/data.csv.gz`` +
    ``root/raw/pcqm4m-v2-train.sdf`` (reference dataset_PCQM4Mv2.py:45-77).
    Requires RDKit for the first pass.  Each graph carries the HOMO-LUMO gap
    as y.

    With ``packed`` (default), the one-off featurization streams into a
    :class:`moleculesde_tpu.data.packed.PackedGraphs` flat-array cache under
    ``root/packed_<variant>/`` (the TPU equivalent of the reference's
    ``geometric_data_processed.pt`` collated blob) and reloads memory-mapped
    in seconds — at 3.4M molecules a per-molecule dict list does not fit in
    RAM.
    """

    def build():
        import pandas as pd

        from rdkit import Chem

        from moleculesde_tpu.data.featurize import mol_to_graph_3d

        raw = os.path.join(root, "raw")
        df = pd.read_csv(os.path.join(raw, "data.csv.gz"))
        gaps = df["homolumogap"].to_numpy()

        suppl = Chem.SDMolSupplier(
            os.path.join(raw, "pcqm4m-v2-train.sdf"), removeHs=False,
            sanitize=True)
        count = 0
        for i, mol in enumerate(suppl):
            if max_molecules is not None and count >= max_molecules:
                break
            if mol is None:
                continue
            try:
                g = mol_to_graph_3d(mol, remove_center=remove_center,
                                    extend=extend)
            except Exception:
                continue
            g["y"] = np.array([gaps[i]], dtype=np.float32)
            count += 1
            yield g

    if not packed:
        return list(build())
    from moleculesde_tpu.data.packed import pack_or_load

    tag = f"packed_ext{int(extend)}" + (
        f"_n{max_molecules}" if max_molecules else "")
    return pack_or_load(os.path.join(root, tag), build)


# -------------------------------------------------------------- MoleculeNet
def load_moleculenet_labels(dataset: str, csv_path: str) -> Tuple[List[str], np.ndarray]:
    """Read (smiles, labels) from a MoleculeNet CSV.  Classification labels
    follow the reference's {1 -> 1, 0 -> -1, nan -> 0} masked-BCE convention
    (reference dataset_MoleculeNet_2D.py, e.g. _load_tox21_dataset l.146-160);
    regression labels are raw floats."""
    import pandas as pd

    opener = gzip.open if csv_path.endswith(".gz") else open
    with opener(csv_path, "rt") as f:
        df = pd.read_csv(f)

    smiles_col, task_cols = _MOLECULENET_COLUMNS[dataset]
    if task_cols is None:
        if dataset == "muv":
            task_cols = [c for c in df.columns if c.startswith("MUV-")]
        else:  # sider / toxcast: every column but smiles
            task_cols = [c for c in df.columns if c != smiles_col]
    smiles = df[smiles_col].tolist()
    labels = df[task_cols]
    if dataset not in _REGRESSION_DATASETS:
        labels = labels.replace(0, -1).fillna(0)
    values = labels.to_numpy(dtype=np.float32).reshape(len(smiles), -1)
    return smiles, values


def load_moleculenet(
    dataset: str, csv_path: str, extend: bool = False
) -> Tuple[List[Dict], List[str]]:
    """SMILES CSV -> 2D graph dicts with y labels; molecules RDKit cannot
    parse are dropped (reference behavior).  Requires RDKit."""
    from moleculesde_tpu.data.featurize import smiles_to_graph_2d

    smiles, labels = load_moleculenet_labels(dataset, csv_path)
    graphs: List[Dict] = []
    kept_smiles: List[str] = []
    for s, y in zip(smiles, labels):
        g = smiles_to_graph_2d(s, extend=extend)
        if g is None or g["atom_feats"].shape[0] == 0:
            continue
        g["y"] = y
        graphs.append(g)
        kept_smiles.append(s)
    return graphs, kept_smiles
