"""QM9 3D regression finetuning CLI.

TPU re-design of the reference script (reference examples/finetune_QM9.py):
SchNet/PaiNN + head, customized QM9 splits, z-score target normalization by
train statistics, MAE eval after denormalization, best-val checkpointing.

Examples:
  python examples/finetune_qm9.py --dataset=synthetic --task=gap --epochs=2
  python examples/finetune_qm9.py --dataset=QM9 --task=gap \
      --input_data_dir=/data --model_3d=SchNet
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

from moleculesde_tpu.data.datasets import QM9_TARGET_FIELD
from moleculesde_tpu.data.loader import GraphLoader, suggest_buckets
from moleculesde_tpu.data.splitters import (
    qm9_random_customized_01,
    qm9_random_customized_02,
    random_split,
)
from moleculesde_tpu.finetune import create_regression_state, make_regression_steps
from moleculesde_tpu.finetune.regression import RegressionModel
from moleculesde_tpu.models import PaiNN, SchNet
from moleculesde_tpu.utils.checkpoints import (
    load_pretrain_checkpoint,
    save_pretrain_checkpoint,
)
from moleculesde_tpu.utils.metrics import MetricsLogger
from moleculesde_tpu.utils.schedulers import PlateauController, make_lr_schedule


def build_encoder(args, emb_dim):
    if args.model_3d == "SchNet":
        return SchNet(
            hidden_channels=emb_dim,
            num_filters=args.SchNet_num_filters,
            num_interactions=args.SchNet_num_interactions,
            num_gaussians=args.SchNet_num_gaussians,
            cutoff=args.SchNet_cutoff,
            readout=args.SchNet_readout), "linear"
    if args.model_3d == "PaiNN":
        return PaiNN(
            n_atom_basis=emb_dim,
            n_interactions=args.PaiNN_n_interactions,
            n_rbf=args.PaiNN_n_rbf,
            cutoff=args.PaiNN_radius_cutoff,
            readout=args.PaiNN_readout), "mlp"
    raise NotImplementedError(f"Model {args.model_3d} not included.")


def load_data(args):
    if args.dataset == "synthetic":
        from moleculesde_tpu.data.synthetic import random_molecule

        rng = np.random.default_rng(args.seed)
        graphs = []
        for _ in range(args.synthetic_molecules or 256):
            g = random_molecule(rng, int(rng.integers(4, args.n_max + 1)), extend=False)
            # synthetic regression target: a geometric summary statistic
            g["y"] = np.array([np.abs(g["positions"]).sum()], dtype=np.float32)
            graphs.append(g)
        task_idx = 0
    else:
        from moleculesde_tpu.data.datasets import load_qm9

        root = os.path.join(args.input_data_dir, args.dataset)
        graphs, _ = load_qm9(root, extend=False)
        task_idx = QM9_TARGET_FIELD.index(args.task)
        for g in graphs:
            g["y"] = g["y"][task_idx : task_idx + 1]
    if args.max_molecules:
        graphs = graphs[: args.max_molecules]  # smoke-run cap (runbook)
    return graphs


def main(argv=None):
    args = parse_args(argv)
    graphs = load_data(args)
    n = len(graphs)
    if args.split == "customized_01":
        split = qm9_random_customized_01(n, seed=args.seed)
    elif args.split == "customized_02":
        split = qm9_random_customized_02(n, seed=args.seed)
    else:
        split = random_split(n, seed=args.seed)
    train_idx, valid_idx, test_idx = split

    n_max = args.n_max or suggest_buckets(graphs)

    def make_loader(idx, shuffle):
        return GraphLoader(
            [graphs[i] for i in idx], batch_size=args.batch_size, n_max=n_max,
            e_max=args.e_max_factor * n_max, shuffle=shuffle,
            drop_last=shuffle, seed=args.seed, num_tasks=1,
            rotation_transform=shuffle and args.use_rotation_transform)

    train_loader = make_loader(train_idx, True)
    val_loader = make_loader(valid_idx, False)
    test_loader = make_loader(test_idx, False)

    # z-score normalization by train statistics (ref finetune_QM9.py:160-166)
    train_y = np.array([graphs[i]["y"][0] for i in train_idx], dtype=np.float64)
    y_mean, y_std = float(train_y.mean()), float(train_y.std() + 1e-12)
    print(f"Train mean: {y_mean}\tTrain std: {y_std}")

    encoder, head = build_encoder(args, args.emb_dim)
    model = RegressionModel(encoder=encoder, head=head)

    pretrained = None
    if args.input_model_file:
        pretrained, _ = load_pretrain_checkpoint(args.input_model_file,
                                                 component="model_3D")
        print(f"loaded pretrained model_3D from {args.input_model_file}")

    key = jax.random.PRNGKey(args.seed)
    init_batch, _ = next(iter(train_loader))
    plateau = None
    if args.lr_scheduler == "ReduceLROnPlateau":
        plateau = PlateauController(args.lr, args.lr_decay_factor,
                                    args.lr_decay_patience, args.min_lr)
        schedule = None
    else:
        schedule = make_lr_schedule(
            args.lr_scheduler, args.lr, args.epochs, max(len(train_loader), 1),
            args.lr_decay_factor, args.lr_decay_step_size, args.min_lr,
            args.StepLRCustomized_scheduler)
    state, tx = create_regression_state(
        model, init_batch, key, lr=args.lr, schedule=schedule,
        weight_decay=args.decay, pretrained_encoder_params=pretrained)
    # data-parallel mesh (SURVEY.md section 2): state replicated, batches
    # sharded on the molecule axis; gradients/metrics all-reduce over ICI
    mesh = None
    if (args.num_devices or 1) > 1:
        from moleculesde_tpu.parallel import make_mesh, replicate

        if args.batch_size % args.num_devices:
            raise SystemExit(f"--batch_size must be divisible by "
                             f"--num_devices={args.num_devices}")
        mesh = make_mesh(args.num_devices)
        state = replicate(state, mesh)
        key = replicate(key, mesh)
    # schedule is traced inside the step; the explicit lr arg only serves the
    # host-driven plateau controller
    train_step, eval_step = make_regression_steps(model, tx, args.loss,
                                                  schedule, mesh=mesh)

    # Eval stays fully on device: per-batch (abs-err-sum, count) accumulate
    # into device scalars; host sync happens only at print points (the first
    # D2H permanently degrades dispatch latency on tunneled TPUs; CLAUDE.md).
    from moleculesde_tpu.finetune.common import finetune_jit

    def err_impl(state, batch, gm):
        pred = eval_step(state, batch) * y_std + y_mean
        return (jnp.abs(pred - batch.y[:, 0]) * gm).sum(), gm.sum()

    err_step = finetune_jit(err_impl, mesh, ("repl", "data", "data"),
                            ("repl", "repl"))

    def evaluate(state, loader):
        e, c = jnp.zeros(()), jnp.zeros(())
        for batch, n_real in loader:
            gm = (np.arange(batch.num_graphs) < n_real).astype(np.float32)
            err, cnt = err_step(state, batch, gm)
            e, c = e + err, c + cnt
        return e / jnp.maximum(c, 1.0)

    from moleculesde_tpu.data.loader import device_prefetch

    put_fn = None
    if mesh is not None:
        from moleculesde_tpu.parallel import shard_batch

        put_fn = lambda b: shard_batch(b, mesh)  # noqa: E731
    from moleculesde_tpu.finetune.common import make_best_tracker

    logger = MetricsLogger(args.output_model_dir or None)
    tracker_init, tracker_update = make_best_tracker("min")
    best = None
    pending = []
    lr_dev = jnp.asarray(args.lr)
    zero = jnp.zeros(())
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        total, nb = None, 0
        for batch, n_real in device_prefetch(iter(train_loader), size=2,
                                             put_fn=put_fn):
            gm = np.arange(batch.num_graphs) < n_real
            y_norm = (batch.y[:, 0] - y_mean) / y_std
            state, loss = train_step(state, batch, y_norm, gm, lr_dev)
            total = loss if total is None else total + loss
            nb += 1
        val_mae = evaluate(state, val_loader)
        test_mae = evaluate(state, test_loader) if args.eval_test else zero
        if plateau is not None:
            # ReduceLROnPlateau is inherently host-driven: one sync per epoch
            lr_dev = jnp.asarray(plateau.update(float(val_mae)))

        payload = (state.params, test_mae)
        best = tracker_update(best, val_mae, payload) if best is not None \
            else tracker_update(tracker_init(payload), val_mae, payload)
        pending.append((epoch, {"loss": (total if total is not None else zero)
                                / max(nb, 1),
                                "val_mae": val_mae, "test_mae": test_mae}))

        if epoch % max(args.print_every_epoch, 1) == 0 or epoch == args.epochs:
            from moleculesde_tpu.utils.metrics import device_get_compact
            for ep, m in device_get_compact(pending):
                logger.log(ep, m,
                           echo=f"Epoch: {ep}\nLoss: {m['loss']}\n"
                                f"val: {m['val_mae']:.6f}\ttest: {m['test_mae']:.6f}")
            pending = []
        else:
            jax.block_until_ready(val_mae)  # pace epochs without D2H
        print(f"Took\t{time.time() - t0}\n")

    neg_best_val, (best_params, best_test), best_epoch, _ = jax.device_get(best)
    best_val = -float(neg_best_val)  # tracker stores sign-flipped for "min"
    print(f"best val: {best_val:.6f}\ttest: {float(best_test):.6f} "
          f"(epoch {int(best_epoch)})")
    if args.output_model_dir:
        save_pretrain_checkpoint(
            args.output_model_dir, {"model": best_params}, best=True)
        save_pretrain_checkpoint(
            args.output_model_dir, {"model": jax.device_get(state.params)},
            best=False)
        # prediction dump at the best epoch (the reference's
        # evaluation_best.pth npz, finetune_QM9.py:111-130)
        best_state = state.replace(params=jax.device_put(best_params))
        preds, trues = [], []
        for batch, n_real in test_loader:
            pred = np.asarray(eval_step(best_state, batch))[:n_real]
            preds.append(pred * y_std + y_mean)
            trues.append(np.asarray(batch.y)[:n_real, 0])
        if preds:
            np.savez(os.path.join(args.output_model_dir, "evaluation_best.npz"),
                     test_pred=np.concatenate(preds),
                     test_true=np.concatenate(trues))
    return best_val, float(best_test)


if __name__ == "__main__":
    main()
