"""Joint MoleculeSDE pretraining CLI.

TPU re-design of the reference driver (reference
examples/pretrain_MoleculeSDE.py): same flag surface, same four-component
checkpoint contract, same per-epoch console metrics — but the training step
is one jitted XLA program over padded batches, optionally data-parallel over
a device mesh.

Examples:
  python examples/pretrain.py --dataset=synthetic --synthetic_molecules=1024 \
      --epochs=2 --batch_size=64 --CL_similarity_metric=EBM_node_dot_prod \
      --output_model_dir=/tmp/pretrain_out
  python examples/pretrain.py --dataset=PCQM4Mv2 --input_data_dir=/data \
      --batch_size=256 --epochs=50
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
from moleculesde_tpu.data.synthetic import random_molecule
from moleculesde_tpu.pretrain import PretrainConfig, create_pretrain_state, make_pretrain_step
from moleculesde_tpu.utils.checkpoints import save_pretrain_checkpoint, save_train_state
from moleculesde_tpu.utils.metrics import MetricsLogger

MODEL_2DTO3D_VARIANTS = {
    "SDEModel2Dto3D_01": 1, "SDEModel2Dto3D_02": 2,
    "SDEModel2Dto3D_03": 3, "SDEModel2Dto3D_04": 4,
}
MODEL_3DTO2D_VARIANTS = {
    "SDEModel3Dto2D_node_adj_dense": 1,
    "SDEModel3Dto2D_node_adj_dense_02": 2,
    "SDEModel3Dto2D_node_adj_dense_03": 3,
}


def load_graphs(args):
    if args.dataset == "synthetic" or args.synthetic_molecules > 0:
        n = args.synthetic_molecules or 1024
        rng = np.random.default_rng(args.seed)
        # compact ingest rebuilds the extended graph on device — skip the
        # host-side extension entirely
        extend = args.use_extend_graph and args.ingest != "compact"
        return [random_molecule(rng, int(rng.integers(4, args.n_max + 1)),
                                extend=extend)
                for _ in range(n)]
    if args.dataset.lower() in ("pcqm4mv2", "pcqm4m-v2"):
        from moleculesde_tpu.data.datasets import load_pcqm4mv2

        root = os.path.join(args.input_data_dir, args.dataset)
        return load_pcqm4mv2(root, max_molecules=args.max_molecules or None,
                             extend=args.use_extend_graph)
    if args.dataset == "QM9":
        from moleculesde_tpu.data.datasets import load_qm9

        root = os.path.join(args.input_data_dir, args.dataset)
        graphs, _ = load_qm9(root, extend=args.use_extend_graph)
        if args.max_molecules:
            graphs = graphs[: args.max_molecules]  # smoke-run cap (runbook)
        return graphs
    raise ValueError(f"unknown pretrain dataset {args.dataset}")


def main(argv=None):
    args = parse_args(argv)
    np.random.seed(args.seed)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # multi-host bring-up BEFORE any backend use (SURVEY.md section 2)
    if args.distributed or args.dist_num_processes > 1:
        from moleculesde_tpu.parallel import initialize_distributed

        initialize_distributed(
            args.dist_coordinator or None,
            args.dist_num_processes or None,
            args.dist_process_id if args.dist_process_id >= 0 else None)
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices")
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    graphs = load_graphs(args)
    if n_proc > 1:
        from moleculesde_tpu.parallel import shard_for_process

        graphs = shard_for_process(graphs)
        # --batch_size is the GLOBAL batch; each host loads its slice
        assert args.batch_size % n_proc == 0, "--batch_size % processes != 0"
        args.batch_size //= n_proc
    n_max = args.n_max or suggest_buckets(graphs)
    ext_e_max = args.ext_e_max or n_max * n_max
    if args.buckets:
        from moleculesde_tpu.data.loader import BucketedGraphLoader

        loader = BucketedGraphLoader(
            graphs, batch_size=args.batch_size, buckets=args.buckets,
            e_max_factor=args.e_max_factor, shuffle=True, drop_last=True,
            seed=args.seed)
    else:
        loader = GraphLoader(
            graphs, batch_size=args.batch_size, n_max=n_max,
            e_max=args.e_max_factor * n_max, ext_e_max=ext_e_max,
            shuffle=True, drop_last=True, seed=args.seed,
            collate=args.ingest, use_extend=args.use_extend_graph)
        if args.num_workers > 0:
            from moleculesde_tpu.data.loader import ThreadedLoader

            loader = ThreadedLoader(loader, num_workers=args.num_workers)

    cfg = PretrainConfig(
        emb_dim=args.emb_dim, num_layer=args.num_layer, jk=args.JK,
        dropout_ratio=args.dropout_ratio, gnn_type=args.gnn_type,
        model_3d=args.model_3d,
        schnet_num_filters=args.SchNet_num_filters,
        schnet_num_interactions=args.SchNet_num_interactions,
        schnet_num_gaussians=args.SchNet_num_gaussians,
        schnet_cutoff=args.SchNet_cutoff,
        schnet_readout=args.SchNet_readout,
        painn_radius_cutoff=args.PaiNN_radius_cutoff,
        painn_n_interactions=args.PaiNN_n_interactions,
        painn_n_rbf=args.PaiNN_n_rbf,
        painn_readout=args.PaiNN_readout,
        sde_type_2dto3d=args.SDE_type_2Dto3D,
        sde_type_3dto2d=args.SDE_type_3Dto2D,
        sde_2dto3d_variant=MODEL_2DTO3D_VARIANTS[args.SDE_2Dto3D_model],
        sde_3dto2d_variant=MODEL_3DTO2D_VARIANTS[args.SDE_3Dto2D_model],
        coeff_contrastive=args.SDE_coeff_contrastive,
        coeff_generative_2dto3d=args.SDE_coeff_generative_2Dto3D,
        coeff_generative_3dto2d=args.SDE_coeff_generative_3Dto2D,
        contrastive_skip_epochs=args.SDE_coeff_contrastive_skip_epochs,
        anneal_power=args.SDE_anneal_power,
        use_extend_graph=args.use_extend_graph,
        noise_on_one_hot=args.noise_on_one_hot,
        cl_similarity_metric=args.CL_similarity_metric,
        T=args.T, cl_neg_samples=args.CL_neg_samples, normalize=args.normalize,
        lr=args.lr, decay=args.decay,
        gnn_2d_lr_scale=args.gnn_2d_lr_scale,
        gnn_3d_lr_scale=args.gnn_3d_lr_scale,
        # TPU perf knobs (config.py additions beyond the reference surface)
        bf16_pairs=args.train_precision == "bfloat16",
        score_dtype_2dto3d=args.train_precision,
        schnet_bf16=args.train_precision == "bfloat16",
        gnn2d_bf16=args.train_precision == "bfloat16",
        bf16_attn_3dto2d=args.train_precision == "bfloat16",
        schnet_cfconv=args.schnet_cfconv,
        microbatch=args.microbatch,
        microbatch_scope=args.microbatch_scope,
        microbatch_unroll=args.microbatch_unroll,
    )

    key = jax.random.PRNGKey(args.seed)
    init_batch, _ = next(iter(loader))
    models, state = create_pretrain_state(cfg, init_batch, key)

    n_devices = args.num_devices or (jax.device_count() if n_proc > 1 else 1)
    if n_devices > 1 or n_proc > 1:
        from moleculesde_tpu.parallel import (
            global_batch_putter, make_mesh, make_sharded_pretrain_step,
            replicate, shard_batch)

        mesh = make_mesh(n_devices)
        if cfg.microbatch and cfg.microbatch % mesh.size:
            raise SystemExit(
                f"--microbatch={cfg.microbatch} must be a multiple of the "
                f"mesh size ({mesh.size}) so every accumulation chunk "
                f"spreads over all devices")
        state = replicate(state, mesh)
        step = make_sharded_pretrain_step(models, cfg, mesh)
        if n_proc > 1:
            prep = global_batch_putter(mesh)  # local batch -> global jax.Array
        else:
            prep = lambda b: shard_batch(b, mesh)
    else:
        step = make_pretrain_step(models, cfg)
        prep = jax.device_put

    if args.resume_from:
        from moleculesde_tpu.utils.checkpoints import load_train_state

        state, extra = load_train_state(args.resume_from, state)
        print(f"resumed from {args.resume_from} at step {int(state.step)} "
              f"(extra: {extra})")

    logger = MetricsLogger(args.output_model_dir or None)
    optimal_loss = 1e10

    profiling = False
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        profiling = True

    for epoch in range(1, args.epochs + 1):
        coeff_cl = (args.SDE_coeff_contrastive
                    if epoch > args.SDE_coeff_contrastive_skip_epochs else 0.0)
        t0 = time.time()
        keys = ["CL_loss", "CL_acc", "SDE_loss_2Dto3D", "SDE_loss_3Dto2D"]
        accum_dev = None  # device-side accumulation: one D2H sync per epoch
        n_batches = 0
        print(f"epoch: {epoch}")
        from moleculesde_tpu.data.loader import device_prefetch

        coeff_dev = jnp.asarray(coeff_cl)
        for batch, _ in device_prefetch(iter(loader), size=2, put_fn=prep):
            # randomness is folded from state.step inside the jitted step
            state, metrics = step(state, batch, key, coeff_dev)
            n_batches += 1
            vals = [metrics[k] for k in keys]
            accum_dev = vals if accum_dev is None else [
                a + v for a, v in zip(accum_dev, vals)]

        # Sync metrics to host only every print_every_epoch epochs: on
        # tunneled TPUs the first device->host read permanently degrades
        # per-program dispatch latency (see CLAUDE.md), so sparse syncs keep
        # the training loop single-program-per-step.
        if epoch % max(args.print_every_epoch, 1) == 0 or epoch == args.epochs:
            from moleculesde_tpu.utils.metrics import device_get_compact
            accum = {k: float(v) / max(n_batches, 1)
                     for k, v in zip(keys, device_get_compact(accum_dev))}

            temp_loss = (
                coeff_cl * accum["CL_loss"]
                + args.SDE_coeff_generative_2Dto3D * accum["SDE_loss_2Dto3D"]
                + args.SDE_coeff_generative_3Dto2D * accum["SDE_loss_3Dto2D"])
            if temp_loss < optimal_loss and args.output_model_dir and is_main:
                optimal_loss = temp_loss
                print(f"save model with loss: {optimal_loss:.5f}")
                save_pretrain_checkpoint(
                    args.output_model_dir, jax.device_get(state.params),
                    jax.device_get(state.batch_stats), best=True)

            logger.log(
                epoch, accum,
                echo=("CL Loss: {CL_loss:.5f}\tCL Acc: {CL_acc:.5f}\t\t"
                      "SDE 2Dto3D Loss: {SDE_loss_2Dto3D:.5f}\t"
                      "SDE 3Dto2D Loss: {SDE_loss_3Dto2D:.5f}").format(**accum))
        else:
            jax.block_until_ready(accum_dev[0])  # pace epochs without D2H
        print(f"Time: {time.time() - t0:.5f}\n")

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace written to {args.profile_dir}")

    if args.output_model_dir and is_main:
        save_pretrain_checkpoint(
            args.output_model_dir, jax.device_get(state.params),
            jax.device_get(state.batch_stats), best=False)
        save_train_state(
            os.path.join(args.output_model_dir, "train_state.msgpack"),
            jax.device_get(state), extra={"epoch": args.epochs})
    return state


if __name__ == "__main__":
    main()
