"""Full-chain CLI rehearsal over raw-format data (VERDICT r3 #4).

test_datasets_real.py rehearses the *loaders*; these tests drive the actual
CLI dataset branches (examples/pretrain.py::load_graphs QM9/PCQM4Mv2,
finetune_qm9/moleculenet/md17 real-data paths, both sample CLIs) end to end
in subprocesses with tests/rdkit_stub.py pre-installed, over either the
committed fixtures (tests/fixtures/) or slightly larger generated-on-the-fly
raw dirs where the splitters need more molecules than the fixtures carry.

Reference contracts: dataset_PCQM4Mv2.py:45-77, dataset_QM9.py:202-260,
dataset_MD17.py:38-78, dataset_MoleculeNet_2D.py.
"""

import gzip
import os
import shutil
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIXTURES = os.path.join(HERE, "fixtures")

sys.path.insert(0, FIXTURES)
from make_fixtures import molblock, write_sdf  # noqa: E402


def _run(script, *args, timeout=900):
    """Run an examples/ CLI in a subprocess with the rdkit stub installed
    BEFORE the CLI's lazy ``from rdkit import Chem`` imports resolve."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # fast CPU startup
    env["JAX_PLATFORMS"] = "cpu"
    path = os.path.join(REPO, "examples", script)
    examples = os.path.join(REPO, "examples")
    boot = (
        # examples/ first: the CLIs do `from config import parse_args`,
        # resolved from the script dir when run as `python examples/x.py`
        f"import sys; sys.path.insert(0, {HERE!r}); "
        f"sys.path.insert(0, {examples!r}); "
        "import rdkit_stub; rdkit_stub.install(); "
        f"sys.argv = [{script!r}] + {list(args)!r}; "
        f"import runpy; runpy.run_path({path!r}, run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", boot], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


TINY = ["--epochs=1", "--emb_dim=16", "--num_layer=2", "--dropout_ratio=0",
        "--n_max=12", "--SchNet_num_interactions=2",
        "--SchNet_num_gaussians=8", "--SchNet_num_filters=8"]


def _chains(n, seed=7):
    rng = np.random.default_rng(seed)
    els = np.array(list("CNOF"))
    return ["".join(rng.choice(els, size=int(rng.integers(3, 9))))
            for _ in range(n)]


def _write_qm9(data_dir, n=20):
    """A QM9 raw dir with ``n`` records in the committed fixture's exact
    format (V2000 sdf + 12-target csv + uncharacterized + atomref)."""
    raw = os.path.join(data_dir, "QM9", "raw")
    os.makedirs(raw)
    chains = _chains(n)
    write_sdf(os.path.join(raw, "gdb9.sdf"), chains)
    rng = np.random.default_rng(1)
    cols = ["mol_id", "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
            "u0", "u298", "h298", "g298", "cv"]
    with open(os.path.join(raw, "gdb9.sdf.csv"), "w") as f:
        f.write(",".join(cols) + "\n")
        for i in range(n):
            vals = np.round(rng.normal(size=12), 4)
            f.write(f"gdb_{i + 1}," + ",".join(str(v) for v in vals) + "\n")
    with open(os.path.join(raw, "uncharacterized.txt"), "w") as f:
        f.write("\n" * 8 + "index line header\n")
        f.write("     2   gdb_2 uncharacterized\n")
        f.write("footer\n")
    shutil.copy(os.path.join(FIXTURES, "qm9", "raw", "atomref.txt"),
                os.path.join(raw, "atomref.txt"))


def test_pretrain_qm9_then_finetune_qm9(tmp_path):
    """pretrain --dataset=QM9 over a raw-format dir, then its checkpoint
    into finetune_qm9's real-dataset branch (z-norm, MAE, schedulers)."""
    data = tmp_path / "data"
    _write_qm9(str(data), n=20)
    out = tmp_path / "pre"
    r = _run("pretrain.py", "--dataset=QM9", f"--input_data_dir={data}",
             "--batch_size=4", "--max_molecules=16", *TINY,
             f"--output_model_dir={out}")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "CL Loss" in r.stdout
    ckpt = out / "model_complete.msgpack"
    assert ckpt.exists()

    r2 = _run("finetune_qm9.py", "--dataset=QM9", f"--input_data_dir={data}",
              "--task=gap", "--split=random", "--batch_size=4", *TINY,
              f"--input_model_file={ckpt}")
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "loaded pretrained model_3D" in r2.stdout
    assert "best val" in r2.stdout


def test_pretrain_pcqm4mv2_then_sample_both_directions(tmp_path):
    """pretrain --dataset=pcqm4mv2 over the committed fixture (malformed
    record drop path), then conformer generation AND graph generation from
    the checkpoint over the same fixture molecules."""
    out = tmp_path / "pre"
    r = _run("pretrain.py", "--dataset=pcqm4mv2",
             f"--input_data_dir={FIXTURES}", "--batch_size=4", *TINY,
             f"--output_model_dir={out}")
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = out / "model_complete.msgpack"
    assert ckpt.exists()

    gen = tmp_path / "gen"
    r2 = _run("sample_2d_to_3d.py", "--dataset=pcqm4mv2",
              f"--input_data_dir={FIXTURES}", "--end=2",
              "--num_repeat_SDE_inference=2",
              "--num_diffusion_timesteps_2Dto3D_inference=4", "--steps_pos=1",
              *TINY, f"--input_model_file={ckpt}",
              f"--output_model_dir={gen}")
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "conformers" in r2.stdout

    gen2 = tmp_path / "gen2"
    r3 = _run("sample_3d_to_2d.py", "--dataset=pcqm4mv2",
              f"--input_data_dir={FIXTURES}", "--end=4",
              "--num_diffusion_timesteps_3Dto2D_inference=4", "--steps_pos=1",
              *TINY, f"--input_model_file={ckpt}",
              f"--output_model_dir={gen2}")
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert "generated" in r3.stdout


def test_finetune_moleculenet_bbbp_scaffold(tmp_path):
    """finetune_moleculenet's real-dataset branch: csv.gz load, bad-SMILES
    drop, {0->-1, nan->0} label mapping, deterministic scaffold split."""
    raw = tmp_path / "bbbp" / "raw"
    raw.mkdir(parents=True)
    chains = _chains(24, seed=11)
    rng = np.random.default_rng(2)
    with gzip.open(raw / "bbbp.csv.gz", "wt") as f:
        f.write("num,name,p_np,smiles\n")
        for i, s in enumerate(chains):
            label = "" if i == 5 else str(int(rng.integers(0, 2)))
            smiles = "XX(=" if i == 9 else s  # one unparseable row
            f.write(f"{i},m{i},{label},{smiles}\n")
    r = _run("finetune_moleculenet.py", "--dataset=bbbp",
             f"--input_data_dir={tmp_path}", "--batch_size=4",
             "--max_molecules=20", *TINY)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "best train" in r.stdout


def test_finetune_md17_npz(tmp_path):
    """finetune_md17's real-dataset branch: npz trajectory load, 1000/1000
    split fallback, force = -grad E training, NaN-masked eval."""
    raw = tmp_path / "MD17" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(3)
    n_frames, n_atoms = 20, 6
    np.savez(raw / "aspirin_dft.npz",
             z=np.array([6, 6, 8, 1, 1, 1], dtype=np.int64),
             R=rng.normal(scale=1.5, size=(n_frames, n_atoms, 3)),
             E=rng.normal(loc=-400.0, size=(n_frames,)),
             F=rng.normal(size=(n_frames, n_atoms, 3)))
    r = _run("finetune_md17.py", "--dataset=MD17", "--task=aspirin",
             f"--input_data_dir={tmp_path}", "--MD17_train_batch_size=4",
             "--max_molecules=16", *TINY)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "F MAE" in r.stdout
