"""Pretrain->finetune transfer study (VERDICT r4 missing #2).

The reference's downstream value proposition is that MoleculeSDE pretraining
improves finetuned property prediction (reference
examples/finetune_MoleculeNet.py:70-80 and finetune_QM9.py:95-108 load the
pretrain checkpoint into the task encoder; README_checkpoints.md maps
checkpoints to paper tables 2/3/4).  This study closes that loop at
synthetic-fixture scale with the SAME finetune machinery the CLIs use:

1. Pretrain GIN + SchNet + both SDEs on geometric synthetic molecules
   (benchmarks/quality.py::train_quality_models — the quality-study corpus).
2. Downstream tasks on FRESH molecules from the same generator (disjoint
   seed), small training sets so representation quality matters:
   - ``cls_2d``  (MoleculeNet analogue): GIN + mean-pool + linear head,
     masked-BCE, predicting a 3D-derived binary label (radius of gyration
     above the pool median) from the 2D graph alone.  ROC-AUC.
   - ``reg_3d``  (QM9 analogue): SchNet + linear head, z-scored L1 loss,
     predicting a topology-derived target (number of chord bonds) from the
     conformer alone.  MAE.
   Both tasks are cross-modal on purpose: the pretraining objective aligns
   the 2D and 3D views, which is exactly the signal a from-scratch encoder
   does not have.
3. Each task runs pretrained-init vs scratch-init over several seeds with
   identical budgets (same data order, same LR, same epochs).

Run:  python benchmarks/transfer.py            (TPU; ~minutes)
      TRANSFER_STEPS=300 TRANSFER_EMB=32 ...   (toy knobs; tests use these)

Prints one JSON line per (task, seed, arm) and a summary with means and the
pretrained-scratch delta.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, List, Optional

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def radius_of_gyration(pos: np.ndarray) -> float:
    c = pos - pos.mean(axis=0, keepdims=True)
    return float(np.sqrt((c ** 2).sum(axis=1).mean()))


def n_chords(g: dict) -> float:
    """Bonds beyond the chain backbone (synthetic.py builds chain + chords)."""
    n = g["atom_feats"].shape[0]
    return float(g["edge_index"].shape[1] // 2 - (n - 1))


def spring_energy_forces(pos: np.ndarray, edge_index: np.ndarray,
                         bond_len: float = 1.5, rep_dist: float = 2.0):
    """Exact energy and forces of the generator's toy force field
    (data/synthetic.py::relax_positions — whose descent direction IS
    -grad E) evaluated at ``pos``.  E = sum_{i<j bonded} 0.5 (r - L)^2 +
    sum_{i<j nonbonded, r<rep} 0.25 (rep - r)^2."""
    n = pos.shape[0]
    bonded = np.zeros((n, n), dtype=bool)
    bonded[edge_index[0], edge_index[1]] = True
    nonbonded = ~bonded & ~np.eye(n, dtype=bool)
    d = pos[:, None] - pos[None, :]
    r = np.sqrt((d * d).sum(-1)) + 1e-9
    close = nonbonded & (r < rep_dist)
    # full-matrix sums count each pair twice -> halve the pair constants
    energy = 0.25 * (np.where(bonded, (r - bond_len) ** 2, 0.0)).sum()
    energy += 0.125 * (np.where(close, (rep_dist - r) ** 2, 0.0)).sum()
    coef = np.where(bonded, (bond_len - r) / r, 0.0)
    coef += np.where(close, 0.5 * (rep_dist - r) / r, 0.0)
    forces = (coef[..., None] * d).sum(axis=1)
    return float(energy), forces.astype(np.float32)


def make_downstream_pool(n_mols: int, n_max: int, seed: int) -> List[dict]:
    from moleculesde_tpu.data.synthetic import random_molecule

    rng = np.random.default_rng(seed)
    return [random_molecule(rng, int(rng.integers(max(n_max // 2, 4),
                                                  n_max + 1)),
                            geometric=True)
            for _ in range(n_mols)]


def finetune_cls2d(ctx: Dict, graphs_train: List[dict], graphs_eval: List[dict],
                   pretrained: bool, seed: int, epochs: int, lr: float,
                   batch_size: int = 16) -> float:
    """GIN 2D classification (reference finetune_MoleculeNet.py flow):
    returns eval ROC-AUC."""
    from sklearn.metrics import roc_auc_score

    from moleculesde_tpu.data.loader import GraphLoader
    from moleculesde_tpu.finetune import (
        create_classification_state, make_classification_steps)
    from moleculesde_tpu.models import GNNGraphPred

    cfg = ctx["cfg"]
    n_max, e_max = ctx["n_max"], ctx["e_max"]
    model = GNNGraphPred(num_tasks=1, num_layers=cfg.num_layer,
                         emb_dim=cfg.emb_dim, jk=cfg.jk,
                         gnn_type=cfg.gnn_type)
    loader = GraphLoader(graphs_train, batch_size=batch_size, n_max=n_max,
                         e_max=e_max, shuffle=True, drop_last=True,
                         seed=seed, num_tasks=1)
    key = jax.random.PRNGKey(seed)
    init_batch, _ = next(iter(loader))
    pre = ctx["trained"][0]["model_2D"] if pretrained else None
    state, tx = create_classification_state(model, init_batch, key, lr=lr,
                                            pretrained_gnn_params=pre)
    train_step, eval_step = make_classification_steps(model, tx)
    lr_dev = jnp.asarray(lr)
    for _ in range(epochs):
        for batch, n_real in loader:
            gm = np.arange(batch.num_graphs) < n_real
            state, _ = train_step(state, jax.device_put(batch), key, gm, lr_dev)
    def auc_on(graphs):
        ld = GraphLoader(graphs, batch_size=batch_size, n_max=n_max,
                         e_max=e_max, shuffle=False, drop_last=False,
                         seed=seed, num_tasks=1)
        ys, ss = [], []
        for batch, n_real in ld:
            pred = np.asarray(eval_step(state, jax.device_put(batch)))
            ys.append(np.asarray(batch.y)[:n_real, 0])
            ss.append(pred[:n_real, 0])
        y = (np.concatenate(ys) + 1) / 2  # {-1,+1} -> {0,1}
        return float(roc_auc_score(y, np.concatenate(ss)))

    # train metric alongside eval: separates failure-to-fit from
    # failure-to-generalize (r5 diagnosis aid)
    return auc_on(graphs_eval), auc_on(graphs_train)


def finetune_reg3d(ctx: Dict, graphs_train: List[dict], graphs_eval: List[dict],
                   pretrained: bool, seed: int, epochs: int, lr: float,
                   batch_size: int = 16) -> float:
    """SchNet 3D regression (reference finetune_QM9.py flow): returns eval
    MAE on the raw target scale."""
    from moleculesde_tpu.data.loader import GraphLoader
    from moleculesde_tpu.finetune import (
        create_regression_state, make_regression_steps)
    from moleculesde_tpu.finetune.regression import RegressionModel
    from moleculesde_tpu.models import SchNet

    cfg = ctx["cfg"]
    n_max, e_max = ctx["n_max"], ctx["e_max"]
    encoder = SchNet(hidden_channels=cfg.emb_dim,
                     num_filters=cfg.schnet_num_filters,
                     num_interactions=cfg.schnet_num_interactions,
                     num_gaussians=cfg.schnet_num_gaussians,
                     cutoff=cfg.schnet_cutoff, readout=cfg.schnet_readout)
    model = RegressionModel(encoder=encoder, head="linear")
    loader = GraphLoader(graphs_train, batch_size=batch_size, n_max=n_max,
                         e_max=e_max, shuffle=True, drop_last=True,
                         seed=seed, num_tasks=1)
    key = jax.random.PRNGKey(seed)
    init_batch, _ = next(iter(loader))
    pre = ctx["trained"][0]["model_3D"] if pretrained else None
    state, tx = create_regression_state(model, init_batch, key, lr=lr,
                                        pretrained_encoder_params=pre)
    train_step, eval_step = make_regression_steps(model, tx, loss_type="mae")
    # z-norm by the train statistics (reference finetune_QM9.py:160-166)
    y_tr = np.array([g["y"][0] for g in graphs_train])
    mean, std = float(y_tr.mean()), float(max(y_tr.std(), 1e-6))
    lr_dev = jnp.asarray(lr)
    for _ in range(epochs):
        for batch, n_real in loader:
            gm = np.arange(batch.num_graphs) < n_real
            y_norm = (batch.y[:, 0] - mean) / std
            state, _ = train_step(state, jax.device_put(batch),
                                  jnp.asarray(y_norm), gm, lr_dev)
    def mae_on(graphs):
        ld = GraphLoader(graphs, batch_size=batch_size, n_max=n_max,
                         e_max=e_max, shuffle=False, drop_last=False,
                         seed=seed, num_tasks=1)
        errs = []
        for batch, n_real in ld:
            pred = np.asarray(eval_step(state, jax.device_put(batch)))[:n_real]
            y = np.asarray(batch.y)[:n_real, 0]
            errs.append(np.abs(pred * std + mean - y))
        return float(np.concatenate(errs).mean())

    return mae_on(graphs_eval), mae_on(graphs_train)


def finetune_frc3d(ctx: Dict, graphs_train: List[dict], graphs_eval: List[dict],
                   pretrained: bool, seed: int, epochs: int, lr: float,
                   batch_size: int = 16) -> float:
    """SchNet MD17-style energy + force finetuning (reference
    finetune_MD17.py flow: loss = 0.05 L1(E) + 0.95 L1(F), forces as the
    negative position gradient): returns eval force MAE."""
    from moleculesde_tpu.data.loader import GraphLoader
    from moleculesde_tpu.finetune.md17 import (
        create_md17_state, make_md17_steps)
    from moleculesde_tpu.finetune.regression import RegressionModel
    from moleculesde_tpu.models import SchNet

    cfg = ctx["cfg"]
    n_max, e_max = ctx["n_max"], ctx["e_max"]
    encoder = SchNet(hidden_channels=cfg.emb_dim,
                     num_filters=cfg.schnet_num_filters,
                     num_interactions=cfg.schnet_num_interactions,
                     num_gaussians=cfg.schnet_num_gaussians,
                     cutoff=cfg.schnet_cutoff, readout=cfg.schnet_readout)
    model = RegressionModel(encoder=encoder, head="linear")
    loader = GraphLoader(graphs_train, batch_size=batch_size, n_max=n_max,
                         e_max=e_max, shuffle=True, drop_last=True,
                         seed=seed, num_tasks=1, with_forces=True)
    key = jax.random.PRNGKey(seed)
    init_batch, _ = next(iter(loader))
    pre = ctx["trained"][0]["model_3D"] if pretrained else None
    state, tx = create_md17_state(model, init_batch, key, lr=lr,
                                  pretrained_encoder_params=pre)
    train_step, eval_step = make_md17_steps(model, tx)
    lr_dev = jnp.asarray(lr)
    for _ in range(epochs):
        for batch, n_real in loader:
            gm = np.arange(batch.num_graphs) < n_real
            state, _ = train_step(state, jax.device_put(batch),
                                  batch.y[:, 0], batch.forces, gm, lr_dev)

    def fmae_on(graphs):
        ld = GraphLoader(graphs, batch_size=batch_size, n_max=n_max,
                         e_max=e_max, shuffle=False, drop_last=False,
                         seed=seed, num_tasks=1, with_forces=True)
        errs = []
        for batch, n_real in ld:
            _, pf = eval_step(state, jax.device_put(batch))
            nm = np.asarray(batch.node_mask).reshape(batch.num_graphs, -1)
            pf = np.asarray(pf).reshape(batch.num_graphs, -1, 3)
            yf = np.asarray(batch.forces).reshape(batch.num_graphs, -1, 3)
            for i in range(n_real):
                errs.append(np.abs(pf[i][nm[i]] - yf[i][nm[i]]).mean())
        return float(np.mean(errs))

    return fmae_on(graphs_eval), fmae_on(graphs_train)


def run_transfer(
    pretrain_steps: int = 2000,
    n_pretrain: int = 256,
    n_max: int = 16,
    emb_dim: int = 128,
    pretrain_batch: int = 64,
    n_train: int = 48,
    n_eval: int = 256,
    epochs: int = 30,
    lr: float = 1e-3,
    seeds=(0, 1, 2),
    pretrain_seed: int = 0,
    cfg_overrides: Optional[Dict] = None,
    log=print,
) -> Dict:
    from benchmarks.quality import train_quality_models

    ctx = train_quality_models(n_mols=n_pretrain, n_max=n_max,
                               emb_dim=emb_dim, steps=pretrain_steps,
                               batch_size=pretrain_batch, seed=pretrain_seed,
                               cfg_overrides=cfg_overrides, log=log)

    rows = []
    for seed in seeds:
        # fresh downstream molecules, disjoint from the pretraining corpus
        pool = make_downstream_pool(n_train + n_eval, n_max,
                                    seed=10_000 + seed)
        rgs = np.array([radius_of_gyration(g["positions"]) for g in pool])
        med = float(np.median(rgs))
        cls_pool = []
        for g, rg in zip(pool, rgs):
            gc = dict(g)
            gc["y"] = np.array([1.0 if rg > med else -1.0], np.float32)
            cls_pool.append(gc)
        reg_pool = []
        for g in pool:
            gr = dict(g)
            gr["y"] = np.array([n_chords(g)], np.float32)
            reg_pool.append(gr)
        # MD17 analogue: off-equilibrium frames of the generator's exact
        # spring force field (relaxed geometry + Gaussian displacement)
        frc_rng = np.random.default_rng(20_000 + seed)
        frc_pool = []
        for g in pool:
            gf = dict(g)
            pert = (g["positions"] + frc_rng.normal(
                scale=0.3, size=g["positions"].shape)).astype(np.float32)
            e, f = spring_energy_forces(pert, g["edge_index"])
            gf["positions"] = pert
            gf["y"] = np.array([e], np.float32)
            gf["forces"] = f
            frc_pool.append(gf)

        for task, fn, pool_t in (("cls_2d", finetune_cls2d, cls_pool),
                                 ("reg_3d", finetune_reg3d, reg_pool),
                                 ("frc_3d", finetune_frc3d, frc_pool)):
            tr, ev = pool_t[:n_train], pool_t[n_train:]
            for arm in ("scratch", "pretrained"):
                metric, train_metric = fn(ctx, tr, ev, arm == "pretrained",
                                          seed, epochs, lr)
                row = {"task": task, "seed": seed, "arm": arm,
                       "metric": round(metric, 4),
                       "train_metric": round(train_metric, 4)}
                rows.append(row)
                log(json.dumps(row))

    summary = {}
    for task, better in (("cls_2d", "higher"), ("reg_3d", "lower"),
                         ("frc_3d", "lower")):
        s = np.array([r["metric"] for r in rows
                      if r["task"] == task and r["arm"] == "scratch"])
        p = np.array([r["metric"] for r in rows
                      if r["task"] == task and r["arm"] == "pretrained"])
        summary[task] = {
            "scratch_mean": round(float(s.mean()), 4),
            "scratch_std": round(float(s.std()), 4),
            "pretrained_mean": round(float(p.mean()), 4),
            "pretrained_std": round(float(p.std()), 4),
            "delta": round(float(p.mean() - s.mean()), 4),
            "better": better,
            "pretrained_wins": int(((p > s) if better == "higher"
                                    else (p < s)).sum()),
            "n_seeds": len(s),
        }
    return {"rows": rows, "summary": summary}


def main():
    res = run_transfer(
        pretrain_steps=int(os.environ.get("TRANSFER_PRETRAIN_STEPS", 2000)),
        n_pretrain=int(os.environ.get("TRANSFER_PRETRAIN_MOLS", 256)),
        n_max=int(os.environ.get("TRANSFER_NMAX", 16)),
        emb_dim=int(os.environ.get("TRANSFER_EMB", 128)),
        pretrain_batch=int(os.environ.get("TRANSFER_PRETRAIN_BATCH", 64)),
        n_train=int(os.environ.get("TRANSFER_TRAIN", 48)),
        n_eval=int(os.environ.get("TRANSFER_EVAL", 256)),
        epochs=int(os.environ.get("TRANSFER_EPOCHS", 30)),
        lr=float(os.environ.get("TRANSFER_LR", 1e-3)),
        seeds=tuple(int(s) for s in os.environ.get(
            "TRANSFER_SEEDS", "0,1,2").split(",")),
    )
    print(json.dumps({"metric": "transfer", **res["summary"]}))


if __name__ == "__main__":
    main()
