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
from moleculesde_tpu.utils.metrics import MetricsLogger, roc_auc_mean_device
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
    if args.max_molecules:
        # smoke-run cap (runbook): truncate BEFORE the split so the scaffold
        # partition stays consistent with the loaded subset
        graphs = graphs[: args.max_molecules]
        smiles = smiles[: args.max_molecules]
    split = scaffold_split(smiles)  # deterministic 80/10/10 (ref splitters.py:21-108)
    return graphs, num_tasks, split


def make_evaluate(eval_step):
    """Device-side per-epoch ROC-AUC: predictions, labels and the rank-sum
    AUC all stay on device (utils.metrics.roc_auc_mean_device), so the eval
    loop performs no device->host transfer — the first D2H permanently
    degrades dispatch latency on tunneled TPUs (CLAUDE.md)."""
    auc_fn = jax.jit(roc_auc_mean_device)

    def evaluate(state, loader, collect=False):
        ys, scores, gms = [], [], []
        for batch, n_real in loader:
            pred = eval_step(state, batch)
            gm = np.arange(batch.num_graphs) < n_real
            # padded graphs get label 0 on every task = masked out
            ys.append(np.where(gm[:, None], batch.y, 0.0))
            scores.append(pred)
            gms.append(gm)
        y = jnp.concatenate([jnp.asarray(v) for v in ys])
        s = jnp.concatenate(scores)
        auc, n_ok = auc_fn(y, s)
        if collect:
            # real-molecule rows, independent of label content (a real
            # molecule can have all labels missing; ref dumps [:n_real])
            return auc, n_ok, y, s, np.concatenate(gms)
        return auc, n_ok

    return evaluate


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
    # data-parallel mesh (SURVEY.md section 2): state replicated, batches
    # sharded on the molecule axis; gradients/BN stats all-reduce over ICI
    mesh = None
    if (args.num_devices or 1) > 1:
        from moleculesde_tpu.parallel import make_mesh, replicate

        if args.batch_size % args.num_devices:
            raise SystemExit(f"--batch_size must be divisible by "
                             f"--num_devices={args.num_devices}")
        mesh = make_mesh(args.num_devices)
        state = replicate(state, mesh)
        key = replicate(key, mesh)
    # schedule is traced inside the step (no per-batch host LR computation)
    train_step, eval_step = make_classification_steps(model, tx, schedule,
                                                      mesh=mesh)
    evaluate = make_evaluate(eval_step)

    from moleculesde_tpu.data.loader import device_prefetch
    from moleculesde_tpu.finetune.common import make_best_tracker

    put_fn = None
    if mesh is not None:
        from moleculesde_tpu.parallel import shard_batch

        put_fn = lambda b: shard_batch(b, mesh)  # noqa: E731

    logger = MetricsLogger(args.output_model_dir or None)
    lr_dev = jnp.asarray(args.lr)
    tracker_init, tracker_update = make_best_tracker("max")
    zero = jnp.zeros(())
    # initialize before the loop so --epochs=0 still reports/dumps cleanly
    best = tracker_init((state.params, state.batch_stats, zero, zero))
    val_ok = jnp.asarray(num_tasks)
    # per-epoch metrics kept as device scalars; synced only at print points
    pending = []
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        total, n = None, 0
        for batch, n_real in device_prefetch(iter(train_loader), size=2,
                                             put_fn=put_fn):
            gm = np.arange(batch.num_graphs) < n_real
            state, loss = train_step(state, batch, key, gm, lr_dev)
            total = loss if total is None else total + loss
            n += 1
        train_loss = (total if total is not None else zero) / max(n, 1)

        train_auc, _ = evaluate(state, make_loader(train_idx, False)) \
            if args.eval_train else (zero, zero)
        val_auc, val_ok = evaluate(state, val_loader)
        test_auc, _ = evaluate(state, test_loader) if args.eval_test \
            else (zero, zero)

        # best-val selection runs on device; the winner is read once at exit
        payload = (state.params, state.batch_stats, train_auc, test_auc)
        best = tracker_update(best, val_auc, payload)
        pending.append((epoch, {"loss": train_loss, "train_auc": train_auc,
                                "val_auc": val_auc, "test_auc": test_auc}))

        if epoch % max(args.print_every_epoch, 1) == 0 or epoch == args.epochs:
            from moleculesde_tpu.utils.metrics import device_get_compact
            for ep, m in device_get_compact(pending):
                logger.log(ep, m,
                           echo=f"train: {m['train_auc']:.6f}\t"
                                f"val: {m['val_auc']:.6f}\t"
                                f"test: {m['test_auc']:.6f}")
            pending = []
        else:
            jax.block_until_ready(val_auc)  # pace epochs without D2H
        print(f"Took\t{time.time() - t0}\n")

    best_val, (best_params, best_bs, best_train, best_test), best_epoch, _ = \
        jax.device_get(best)
    if int(jax.device_get(val_ok)) < num_tasks:
        print("Some target is missing! Missing ratio: "
              f"{1 - int(jax.device_get(val_ok)) / num_tasks}")
    print(f"best train: {float(best_train):.6f}\tval: {float(best_val):.6f}\t"
          f"test: {float(best_test):.6f} (epoch {int(best_epoch)})")
    if args.output_model_dir:
        save_pretrain_checkpoint(
            args.output_model_dir, {"model": best_params},
            {"model": best_bs}, best=True)
        save_pretrain_checkpoint(
            args.output_model_dir, {"model": jax.device_get(state.params)},
            {"model": jax.device_get(state.batch_stats)}, best=False)
        # prediction dump at the best epoch (the reference's
        # evaluation_best.pth, finetune_MoleculeNet.py:324-339)
        best_state = state.replace(params=best_params, batch_stats=best_bs)
        _, _, y, s, real_rows = evaluate(best_state, test_loader, collect=True)
        np.savez(os.path.join(args.output_model_dir, "evaluation_best.npz"),
                 test_true=np.asarray(jax.device_get(y))[real_rows],
                 test_scores=np.asarray(jax.device_get(s))[real_rows])
    return float(best_val), float(best_test)


if __name__ == "__main__":
    main()
