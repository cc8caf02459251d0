"""MoleculeNet 2D classification finetuning CLI.

TPU re-design of the reference script (reference
examples/finetune_MoleculeNet.py): 2D GIN + mean pool + linear head, scaffold
split 80/10/10, masked BCE over {-1, 0, +1} labels, per-task ROC-AUC with
invalid-task skipping, best-val checkpointing.

Examples:
  python examples/finetune_moleculenet.py --dataset=synthetic --epochs=2
  python examples/finetune_moleculenet.py --dataset=tox21 \
      --input_data_dir=/data/molecule_net --input_model_file=ckpt.msgpack
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from config import parse_args

from moleculesde_tpu.data.datasets import MOLECULENET_NUM_TASKS
from moleculesde_tpu.data.loader import GraphLoader, suggest_buckets
from moleculesde_tpu.finetune import (
    create_classification_state,
    make_classification_steps,
)
from moleculesde_tpu.models import GNNGraphPred
from moleculesde_tpu.utils.checkpoints import (
    load_pretrain_checkpoint,
    save_pretrain_checkpoint,
)
from moleculesde_tpu.utils.metrics import MetricsLogger, roc_auc_per_task
from moleculesde_tpu.utils.schedulers import make_lr_schedule


def load_data(args):
    if args.dataset == "synthetic":
        from moleculesde_tpu.data.splitters import random_split
        from moleculesde_tpu.data.synthetic import random_molecule

        num_tasks = 3
        rng = np.random.default_rng(args.seed)
        graphs = []
        for _ in range(args.synthetic_molecules or 256):
            g = random_molecule(rng, int(rng.integers(4, args.n_max + 1)), extend=False)
            g["y"] = rng.choice([-1.0, 1.0], size=(num_tasks,))
            graphs.append(g)
        split = random_split(len(graphs), seed=args.seed)
        return graphs, num_tasks, split
    from moleculesde_tpu.data.datasets import load_moleculenet
    from moleculesde_tpu.data.splitters import scaffold_split

    num_tasks = MOLECULENET_NUM_TASKS[args.dataset]
    csv_path = os.path.join(args.input_data_dir, args.dataset, "raw",
                            f"{args.dataset}.csv")
    if not os.path.exists(csv_path):
        csv_path += ".gz"
    graphs, smiles = load_moleculenet(args.dataset, csv_path)
    split = scaffold_split(smiles)  # deterministic 80/10/10 (ref splitters.py:21-108)
    return graphs, num_tasks, split


def evaluate(eval_step, state, loader, num_tasks):
    ys, scores = [], []
    for batch, n_real in loader:
        pred = np.asarray(eval_step(state, batch))[:n_real]
        ys.append(np.asarray(batch.y)[:n_real])
        scores.append(pred)
    y = np.concatenate(ys)
    s = np.concatenate(scores)
    aucs = roc_auc_per_task(y, s)
    if len(aucs) < num_tasks:
        print(f"Some target is missing! Missing ratio: {1 - len(aucs) / num_tasks}")
    return float(np.mean(aucs)) if aucs else 0.0


def main(argv=None):
    args = parse_args(argv)
    graphs, num_tasks, (train_idx, valid_idx, test_idx) = load_data(args)
    n_max = args.n_max or suggest_buckets(graphs)

    def make_loader(idx, shuffle):
        return GraphLoader(
            [graphs[i] for i in idx], batch_size=args.batch_size, n_max=n_max,
            e_max=args.e_max_factor * n_max, shuffle=shuffle,
            drop_last=shuffle, seed=args.seed, num_tasks=num_tasks)

    train_loader = make_loader(train_idx, True)
    val_loader = make_loader(valid_idx, False)
    test_loader = make_loader(test_idx, False)

    model = GNNGraphPred(
        num_tasks=num_tasks, num_layers=args.num_layer, emb_dim=args.emb_dim,
        jk=args.JK, drop_ratio=args.dropout_ratio, gnn_type=args.gnn_type,
        graph_pooling=args.graph_pooling)

    pretrained = None
    if args.input_model_file:
        pretrained, _ = load_pretrain_checkpoint(args.input_model_file,
                                                 component="model_2D")
        print(f"loaded pretrained model_2D from {args.input_model_file}")

    key = jax.random.PRNGKey(args.seed)
    init_batch, _ = next(iter(train_loader))
    schedule = make_lr_schedule(
        args.lr_scheduler, args.lr, args.epochs, max(len(train_loader), 1),
        args.lr_decay_factor, args.lr_decay_step_size, args.min_lr,
        args.StepLRCustomized_scheduler)
    state, tx = create_classification_state(
        model, init_batch, key, lr=args.lr, schedule=schedule,
        weight_decay=args.decay, pretrained_gnn_params=pretrained)
    train_step, eval_step = make_classification_steps(model, tx)

    logger = MetricsLogger(args.output_model_dir or None)
    best_val, best_test, best_epoch = -1.0, 0.0, 0
    train_roc_list, val_roc_list, test_roc_list = [], [], []
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        total = 0.0
        n = 0
        from moleculesde_tpu.data.loader import device_prefetch

        for batch, n_real in device_prefetch(iter(train_loader), size=2):
            gm = jnp.arange(batch.num_graphs) < n_real
            state, loss = train_step(state, batch, key, gm,
                                     jnp.asarray(float(schedule(int(state.step)))))
            total += float(loss)
            n += 1
        train_loss = total / max(n, 1)

        train_auc = evaluate(eval_step, state, make_loader(train_idx, False),
                             num_tasks) if args.eval_train else 0.0
        val_auc = evaluate(eval_step, state, val_loader, num_tasks)
        test_auc = evaluate(eval_step, state, test_loader, num_tasks) \
            if args.eval_test else 0.0
        train_roc_list.append(train_auc)
        val_roc_list.append(val_auc)
        test_roc_list.append(test_auc)
        logger.log(epoch, {"loss": train_loss, "train_auc": train_auc,
                           "val_auc": val_auc, "test_auc": test_auc},
                   echo=f"train: {train_auc:.6f}\tval: {val_auc:.6f}\ttest: {test_auc:.6f}")
        print(f"Took\t{time.time() - t0}\n")

        if val_auc > best_val:
            best_val, best_test, best_epoch = val_auc, test_auc, epoch
            if args.output_model_dir:
                save_pretrain_checkpoint(
                    args.output_model_dir,
                    {"model": jax.device_get(state.params)},
                    {"model": jax.device_get(state.batch_stats)}, best=True)
                # prediction dump at the best epoch (the reference's
                # evaluation_best.pth, finetune_MoleculeNet.py:324-339)
                ys, ss = [], []
                for batch, n_real in test_loader:
                    ss.append(np.asarray(eval_step(state, batch))[:n_real])
                    ys.append(np.asarray(batch.y)[:n_real])
                if ys:
                    np.savez(os.path.join(args.output_model_dir,
                                          "evaluation_best.npz"),
                             test_true=np.concatenate(ys),
                             test_scores=np.concatenate(ss))

    print(f"best train: {0:.6f}\tval: {best_val:.6f}\ttest: {best_test:.6f}")
    if args.output_model_dir:
        save_pretrain_checkpoint(
            args.output_model_dir, {"model": jax.device_get(state.params)},
            {"model": jax.device_get(state.batch_stats)}, best=False)
    return best_val, best_test


if __name__ == "__main__":
    main()
