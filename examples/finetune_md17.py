"""MD17 energy + force finetuning CLI.

TPU re-design of the reference script (reference examples/finetune_MD17.py):
energy from SchNet/PaiNN + head, forces as the negative position gradient,
loss = MD17_energy_coeff * L1(E) + MD17_force_coeff * L1(F), 1000/1000/rest
shuffled split, optional energy/force normalization by train statistics.

Examples:
  python examples/finetune_md17.py --dataset=synthetic --epochs=2
  python examples/finetune_md17.py --task=aspirin \
      --input_data_dir=/data/MD17 --epochs=1000
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

from moleculesde_tpu.data.loader import GraphLoader, suggest_buckets
from moleculesde_tpu.data.splitters import md17_split
from moleculesde_tpu.finetune import create_md17_state, make_md17_steps
from moleculesde_tpu.finetune.regression import RegressionModel
from moleculesde_tpu.models import PaiNN, SchNet
from moleculesde_tpu.utils.checkpoints import (
    load_pretrain_checkpoint,
    save_pretrain_checkpoint,
)
from moleculesde_tpu.utils.metrics import MetricsLogger
from moleculesde_tpu.utils.schedulers import make_lr_schedule


def load_data(args):
    if args.dataset == "synthetic":
        from moleculesde_tpu.data.synthetic import random_molecule

        rng = np.random.default_rng(args.seed)
        graphs = []
        for _ in range(args.synthetic_molecules or 128):
            g = random_molecule(rng, 8, extend=False)
            g["y"] = np.array([np.abs(g["positions"]).sum()], dtype=np.float32)
            g["forces"] = rng.normal(size=g["positions"].shape).astype(np.float32)
            graphs.append(g)
        return graphs
    from moleculesde_tpu.data.datasets import load_md17

    npz = os.path.join(args.input_data_dir, "MD17", "raw", f"{args.task}_dft.npz")
    graphs, _ = load_md17(npz)
    if args.max_molecules:
        graphs = graphs[: args.max_molecules]  # smoke-run cap (runbook)
    return graphs


def main(argv=None):
    args = parse_args(argv)
    graphs = load_data(args)
    train_idx, valid_idx, test_idx = md17_split(len(graphs), seed=args.seed)
    n_max = args.n_max or suggest_buckets(graphs)
    bs = args.MD17_train_batch_size if args.dataset != "synthetic" else args.batch_size
    bs = max(bs, 1)

    def make_loader(idx, shuffle, batch_size):
        return GraphLoader(
            [graphs[i] for i in idx], batch_size=batch_size, n_max=n_max,
            e_max=args.e_max_factor * n_max, shuffle=shuffle,
            drop_last=shuffle, seed=args.seed, num_tasks=1, with_forces=True)

    train_loader = make_loader(train_idx, True, bs)
    val_loader = make_loader(valid_idx, False, args.batch_size)
    test_loader = make_loader(test_idx, False, args.batch_size)

    # optional normalization by train statistics (ref finetune_MD17.py:218-232)
    if args.energy_force_with_normalization:
        train_e = np.array([graphs[i]["y"][0] for i in train_idx])
        train_f = np.concatenate([graphs[i]["forces"] for i in train_idx])
        e_shift = float(train_e.mean())
        e_scale = float(np.abs(train_f).mean() + 1e-12)
    else:
        e_shift, e_scale = 0.0, 1.0

    if args.model_3d == "SchNet":
        encoder = SchNet(
            hidden_channels=args.emb_dim,
            num_filters=args.SchNet_num_filters,
            num_interactions=args.SchNet_num_interactions,
            num_gaussians=args.SchNet_num_gaussians,
            cutoff=args.SchNet_cutoff,
            readout=args.SchNet_readout)
        head = "linear"
    else:
        encoder = PaiNN(
            n_atom_basis=args.emb_dim,
            n_interactions=args.PaiNN_n_interactions,
            n_rbf=args.PaiNN_n_rbf,
            cutoff=args.PaiNN_radius_cutoff,
            readout=args.PaiNN_readout)
        head = "mlp"
    model = RegressionModel(encoder=encoder, head=head)

    pretrained = None
    if args.input_model_file:
        pretrained, _ = load_pretrain_checkpoint(args.input_model_file,
                                                 component="model_3D")
        print(f"loaded pretrained model_3D from {args.input_model_file}")

    key = jax.random.PRNGKey(args.seed)
    init_batch, _ = next(iter(train_loader))
    schedule = make_lr_schedule(
        args.lr_scheduler, args.lr, args.epochs, max(len(train_loader), 1),
        args.lr_decay_factor, args.lr_decay_step_size, args.min_lr,
        args.StepLRCustomized_scheduler)
    state, tx = create_md17_state(
        model, init_batch, key, lr=args.lr, schedule=schedule,
        weight_decay=args.decay, pretrained_encoder_params=pretrained)
    # data-parallel mesh (SURVEY.md section 2): state replicated, frames
    # sharded on the molecule axis (energy+force grads all-reduce over ICI)
    mesh = None
    if (args.num_devices or 1) > 1:
        from moleculesde_tpu.parallel import make_mesh, replicate

        if bs % args.num_devices or args.batch_size % args.num_devices:
            raise SystemExit(
                "train and eval batch sizes must be divisible by "
                f"--num_devices={args.num_devices} (got {bs} / "
                f"{args.batch_size})")
        mesh = make_mesh(args.num_devices)
        state = replicate(state, mesh)
        key = replicate(key, mesh)
    train_step, eval_step = make_md17_steps(
        model, tx, args.MD17_energy_coeff, args.MD17_force_coeff,
        energy_scale=e_scale, energy_shift=e_shift, schedule=schedule,
        mesh=mesh)

    # Device-side eval accumulation: per-batch (energy-err, count, force-err,
    # count) sums stay on device; sync happens only at print points (first
    # D2H permanently degrades dispatch latency on tunneled TPUs; CLAUDE.md).
    from moleculesde_tpu.finetune.common import finetune_jit

    @lambda f: finetune_jit(f, mesh, ("repl", "data", "data"),
                            ("repl", "repl", "repl", "repl"))
    def err_step(state, batch, gm):
        pred_e, pred_f = eval_step(state, batch)
        b, n = batch.num_graphs, batch.n_max
        e_err = (jnp.abs(pred_e - batch.y[:, 0]) * gm).sum()
        nm = batch.node_mask.reshape(b, n).astype(jnp.float32) * gm[:, None]
        pf = pred_f.reshape(b, n, 3)
        yf = batch.forces.reshape(b, n, 3)
        # NaN-force masking at eval (ref finetune_MD17.py:127-130)
        ferr = jnp.nan_to_num(jnp.abs(pf - yf), nan=0.0) * nm[..., None]
        return e_err, gm.sum(), ferr.sum(), nm.sum() * 3

    def evaluate(state, loader):
        acc = [jnp.zeros(())] * 4
        for batch, n_real in loader:
            gm = (np.arange(batch.num_graphs) < n_real).astype(np.float32)
            vals = err_step(state, batch, gm)
            acc = [a + v for a, v in zip(acc, vals)]
        return (acc[0] / jnp.maximum(acc[1], 1.0),
                acc[2] / jnp.maximum(acc[3], 1.0))

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
            y_e = (batch.y[:, 0] - e_shift) / e_scale
            y_f = batch.forces / e_scale
            state, metrics = train_step(state, batch, y_e, y_f, gm, lr_dev)
            total = metrics["loss"] if total is None else total + metrics["loss"]
            nb += 1
        val_e, val_f = evaluate(state, val_loader)
        test_e, test_f = evaluate(state, test_loader) if args.eval_test \
            else (zero, zero)
        score = args.MD17_energy_coeff * val_e + args.MD17_force_coeff * val_f

        payload = (state.params, test_e, test_f)
        best = tracker_update(best, score, payload) if best is not None \
            else tracker_update(tracker_init(payload), score, payload)
        pending.append((epoch, {
            "loss": (total if total is not None else zero) / max(nb, 1),
            "val_energy_mae": val_e, "val_force_mae": val_f,
            "test_energy_mae": test_e, "test_force_mae": test_f}))

        if epoch % max(args.print_every_epoch, 1) == 0 or epoch == args.epochs:
            from moleculesde_tpu.utils.metrics import device_get_compact
            for ep, m in device_get_compact(pending):
                logger.log(ep, m, echo=(
                    f"Epoch: {ep}\tLoss: {m['loss']:.5f}\t"
                    f"val E MAE: {m['val_energy_mae']:.5f}\t"
                    f"val F MAE: {m['val_force_mae']:.5f}\t"
                    f"test E MAE: {m['test_energy_mae']:.5f}\t"
                    f"test F MAE: {m['test_force_mae']:.5f}"))
            pending = []
        else:
            jax.block_until_ready(val_e)  # pace epochs without D2H
        print(f"Took\t{time.time() - t0}\n")

    _, (best_params, best_e, best_f), best_epoch, _ = jax.device_get(best)
    best_metrics = (float(best_e), float(best_f))
    print(f"best test E MAE: {best_metrics[0]:.6f}\tF MAE: {best_metrics[1]:.6f} "
          f"(epoch {int(best_epoch)})")
    if args.output_model_dir:
        save_pretrain_checkpoint(
            args.output_model_dir, {"model": best_params}, best=True)
        save_pretrain_checkpoint(
            args.output_model_dir, {"model": jax.device_get(state.params)},
            best=False)
    return best_metrics


if __name__ == "__main__":
    main()
