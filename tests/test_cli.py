"""End-to-end CLI smoke tests (tiny synthetic configs, subprocess-isolated)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=900):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # fast CPU startup
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.join(REPO, "examples", script), *args]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                          cwd=REPO, env=env)


COMMON = ["--dataset=synthetic", "--synthetic_molecules=32", "--epochs=1",
          "--batch_size=8", "--emb_dim=16", "--num_layer=2",
          "--dropout_ratio=0", "--n_max=10", "--SchNet_num_interactions=2",
          "--SchNet_num_gaussians=8", "--SchNet_num_filters=8"]


def test_pretrain_cli(tmp_path):
    r = _run("pretrain.py", *COMMON, f"--output_model_dir={tmp_path}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CL Loss" in r.stdout
    assert (tmp_path / "model_complete.msgpack").exists()
    assert (tmp_path / "model_complete_final.msgpack").exists()
    assert (tmp_path / "train_state.msgpack").exists()


def test_pretrain_cli_buckets(tmp_path):
    r = _run("pretrain.py", *COMMON, "--buckets", "6", "10",
             f"--output_model_dir={tmp_path}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CL Loss" in r.stdout


def test_finetune_moleculenet_cli():
    r = _run("finetune_moleculenet.py", *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best train" in r.stdout


def test_finetune_qm9_cli():
    r = _run("finetune_qm9.py", *COMMON, "--split=random")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best val" in r.stdout


def test_finetune_md17_cli():
    r = _run("finetune_md17.py", *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "F MAE" in r.stdout


def test_sample_2d_to_3d_cli(tmp_path):
    r = _run("sample_2d_to_3d.py", *COMMON, "--end=2",
             "--num_repeat_SDE_inference=2",
             "--num_diffusion_timesteps_2Dto3D_inference=4",
             "--steps_pos=1",
             f"--output_model_dir={tmp_path}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "conformers" in r.stdout
    assert any(f.name.startswith("2D_to_3D") for f in tmp_path.iterdir())


def test_sample_3d_to_2d_cli(tmp_path):
    r = _run("sample_3d_to_2d.py", *COMMON, "--end=8",
             "--num_diffusion_timesteps_3Dto2D_inference=4",
             "--steps_pos=1",
             f"--output_model_dir={tmp_path}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "generated" in r.stdout


def test_pretrain_then_finetune_checkpoint_handoff(tmp_path):
    """The pretrain checkpoint's model_2D/model_3D components load into the
    finetune CLIs (the reference's cross-script checkpoint contract)."""
    r = _run("pretrain.py", *COMMON, f"--output_model_dir={tmp_path}")
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = str(tmp_path / "model_complete.msgpack")
    r2 = _run("finetune_moleculenet.py", *COMMON, f"--input_model_file={ckpt}")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "loaded pretrained model_2D" in r2.stdout
    r3 = _run("finetune_qm9.py", *COMMON, "--split=random",
              f"--input_model_file={ckpt}")
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "loaded pretrained model_3D" in r3.stdout
