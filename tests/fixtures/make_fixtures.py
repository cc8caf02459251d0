"""Generate the committed raw-format mini-fixtures (run once; outputs are
checked in).  Formats mirror the real corpora consumed by data/datasets.py:

- qm9/raw/: gdb9.sdf (V2000, one malformed record), gdb9.sdf.csv,
  uncharacterized.txt (9-line header + index rows + 2-line footer, the exact
  slice layout of reference dataset_QM9.py:213-215), atomref.txt.
- pcqm4mv2/raw/: pcqm4m-v2-train.sdf + data.csv.gz (homolumogap column).
- moleculenet/bbbp/raw/: bbbp.csv.gz ({1,0,nan} labels + one bad SMILES).
"""

import gzip
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
rng = np.random.default_rng(0)

CHAINS = ["CCO", "CCN", "CCCC", "CO", "NCCF", "CCOC"]


def molblock(smiles, title):
    els = list(smiles)
    na, nb = len(els), len(els) - 1
    lines = [title, "  fixture", "",
             f"{na:3d}{nb:3d}  0  0  0  0  0  0  0  0999 V2000"]
    for el in els:
        x, y, z = rng.normal(scale=2.0, size=3)
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {el:<3s} 0  0  0  0  0  0")
    for i in range(nb):
        lines.append(f"{i + 1:3d}{i + 2:3d}  1  0")
    lines.append("M  END")
    return "\n".join(lines) + "\n$$$$\n"


def write_sdf(path, smiles_list, malformed_at=None):
    with open(path, "w") as f:
        for i, s in enumerate(smiles_list):
            if i == malformed_at:
                f.write("broken\n  fixture\n\n  not a counts line\n$$$$\n")
            else:
                f.write(molblock(s, f"mol_{i + 1}"))


def main():
    # ------------------------------------------------------------------ QM9
    qm9 = os.path.join(HERE, "qm9", "raw")
    os.makedirs(qm9, exist_ok=True)
    write_sdf(os.path.join(qm9, "gdb9.sdf"), CHAINS, malformed_at=4)
    cols = ["mol_id", "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
            "u0", "u298", "h298", "g298", "cv"]
    with open(os.path.join(qm9, "gdb9.sdf.csv"), "w") as f:
        f.write(",".join(cols) + "\n")
        for i in range(len(CHAINS)):
            vals = np.round(rng.normal(size=12), 4)
            f.write(f"gdb_{i + 1}," + ",".join(str(v) for v in vals) + "\n")
    with open(os.path.join(qm9, "uncharacterized.txt"), "w") as f:
        f.write("\n" * 8 + "index line header\n")   # 9 header lines
        f.write("     3   gdb_3 uncharacterized\n")  # skip 0-based index 2
        f.write("footer\n")  # the [9:-2] slice drops 'footer' + trailing ''
    with open(os.path.join(qm9, "atomref.txt"), "w") as f:
        f.write("# element  zpve u0 u298 h298 g298 cv\n")
        for el, vals in [("H", (0.01, -0.5, -0.49, -0.49, -0.51, 0.0)),
                         ("C", (0.1, -37.8, -37.8, -37.8, -37.8, 0.0)),
                         ("N", (0.1, -54.5, -54.5, -54.5, -54.5, 0.0)),
                         ("O", (0.1, -75.0, -75.0, -75.0, -75.0, 0.0)),
                         ("F", (0.1, -99.7, -99.7, -99.7, -99.7, 0.0))]:
            f.write(el + " " + " ".join(str(v) for v in vals) + "\n")

    # ------------------------------------------------------------- PCQM4Mv2
    pcq = os.path.join(HERE, "pcqm4mv2", "raw")
    os.makedirs(pcq, exist_ok=True)
    write_sdf(os.path.join(pcq, "pcqm4m-v2-train.sdf"), CHAINS[:5],
              malformed_at=2)
    with gzip.open(os.path.join(pcq, "data.csv.gz"), "wt") as f:
        f.write("idx,smiles,homolumogap\n")
        for i, s in enumerate(CHAINS[:5]):
            f.write(f"{i},{s},{np.round(rng.uniform(1, 8), 4)}\n")

    # ----------------------------------------------------------- MoleculeNet
    mn = os.path.join(HERE, "moleculenet", "bbbp", "raw")
    os.makedirs(mn, exist_ok=True)
    with gzip.open(os.path.join(mn, "bbbp.csv.gz"), "wt") as f:
        f.write("num,name,p_np,smiles\n")
        rows = [("1", "a", "1", "CCO"), ("2", "b", "0", "CCN"),
                ("3", "bad", "1", "XX(="), ("4", "d", "", "CO"),
                ("5", "e", "1", "NCCF"), ("6", "f", "0", "CCCC")]
        for r in rows:
            f.write(",".join(r) + "\n")
    print("fixtures written under", HERE)


if __name__ == "__main__":
    main()
