"""Shared CLI flag surface, mirroring the reference's argparse module
(reference examples/config.py) flag-for-flag with the same names and
defaults, plus TPU-specific additions (padding buckets, mesh size,
synthetic-data smoke mode).  Parsed on demand — not at import time (the
reference parses at import, config.py:163, which breaks embedding)."""

from __future__ import annotations

import argparse


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()

    # seed and basic info (ref config.py:7-8)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--device", type=int, default=0)

    parser.add_argument("--model_3d", type=str, default="SchNet",
                        choices=["SchNet", "PaiNN"])
    parser.add_argument("--model_2d", type=str, default="GIN", choices=["GIN"])

    # dataset and dataloader (ref l.29-31)
    parser.add_argument("--dataset", type=str, default="QM9")
    parser.add_argument("--task", type=str, default="alpha")
    parser.add_argument("--num_workers", type=int, default=0)
    # TPU extension (not in reference): host batch form.  "compact" ships
    # minimal arrays and featurizes on device (data/compact.py, ~10x less
    # H2D); "padded" collates full GraphBatch on host (data/loader.py).
    parser.add_argument("--ingest", type=str, default="compact",
                        choices=["compact", "padded"])

    # MD17 (ref l.34-39)
    parser.add_argument("--MD17_energy_coeff", type=float, default=0.05)
    parser.add_argument("--MD17_force_coeff", type=float, default=0.95)
    parser.add_argument("--energy_force_with_normalization",
                        dest="energy_force_with_normalization", action="store_true")
    parser.add_argument("--energy_force_no_normalization",
                        dest="energy_force_with_normalization", action="store_false")
    parser.set_defaults(energy_force_with_normalization=False)

    # training strategies (ref l.42-63)
    parser.add_argument("--split", type=str, default="customized_01",
                        choices=["customized_01", "customized_02", "random"])
    parser.add_argument("--MD17_train_batch_size", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr_scale", type=float, default=1)
    parser.add_argument("--decay", type=float, default=0)
    parser.add_argument("--print_every_epoch", type=int, default=1)
    parser.add_argument("--loss", type=str, default="mae", choices=["mse", "mae"])
    parser.add_argument("--lr_scheduler", type=str, default="CosineAnnealingLR")
    parser.add_argument("--lr_decay_factor", type=float, default=0.5)
    parser.add_argument("--lr_decay_step_size", type=int, default=100)
    parser.add_argument("--lr_decay_patience", type=int, default=50)
    parser.add_argument("--min_lr", type=float, default=1e-6)
    parser.add_argument("--StepLRCustomized_scheduler", type=int, nargs="+", default=[150])
    parser.add_argument("--verbose", dest="verbose", action="store_true")
    parser.add_argument("--no_verbose", dest="verbose", action="store_false")
    parser.set_defaults(verbose=False)
    parser.add_argument("--use_rotation_transform", dest="use_rotation_transform",
                        action="store_true")
    parser.add_argument("--no_rotation_transform", dest="use_rotation_transform",
                        action="store_false")
    parser.set_defaults(use_rotation_transform=False)

    # SchNet (ref l.66-71)
    parser.add_argument("--SchNet_num_filters", type=int, default=128)
    parser.add_argument("--SchNet_num_interactions", type=int, default=6)
    parser.add_argument("--SchNet_num_gaussians", type=int, default=51)
    parser.add_argument("--SchNet_cutoff", type=float, default=10)
    parser.add_argument("--SchNet_readout", type=str, default="mean",
                        choices=["mean", "add"])
    parser.add_argument("--SchNet_gamma", type=float, default=None)

    # PaiNN (ref l.74-78)
    parser.add_argument("--PaiNN_radius_cutoff", type=float, default=5.0)
    parser.add_argument("--PaiNN_n_interactions", type=int, default=3)
    parser.add_argument("--PaiNN_n_rbf", type=int, default=20)
    parser.add_argument("--PaiNN_readout", type=str, default="add",
                        choices=["mean", "add"])
    parser.add_argument("--PaiNN_gamma", type=float, default=None)

    # 2D GNN (ref l.82-88)
    parser.add_argument("--gnn_type", type=str, default="GIN")
    parser.add_argument("--num_layer", type=int, default=5)
    parser.add_argument("--emb_dim", type=int, default=300)
    parser.add_argument("--dropout_ratio", type=float, default=0.5)
    parser.add_argument("--graph_pooling", type=str, default="mean")
    parser.add_argument("--JK", type=str, default="last")
    parser.add_argument("--gnn_2d_lr_scale", type=float, default=1)

    # 3D GNN (ref l.92)
    parser.add_argument("--gnn_3d_lr_scale", type=float, default=1)

    # masking (ref l.95)
    parser.add_argument("--SSL_masking_ratio", type=float, default=0.15)

    # contrastive SSL (ref l.98-103)
    parser.add_argument("--CL_neg_samples", type=int, default=1)
    parser.add_argument("--CL_similarity_metric", type=str,
                        default="InfoNCE_dot_prod",
                        choices=["InfoNCE_dot_prod", "EBM_dot_prod",
                                 "EBM_node_dot_prod"])
    parser.add_argument("--T", type=float, default=0.1)
    parser.add_argument("--normalize", dest="normalize", action="store_true")
    parser.add_argument("--no_normalize", dest="normalize", action="store_false")
    parser.set_defaults(normalize=False)

    # MoleculeSDE (ref l.107-126)
    parser.add_argument("--SDE_type_2Dto3D", type=str, default="VE")
    parser.add_argument("--SDE_type_3Dto2D", type=str, default="VE")
    parser.add_argument("--SDE_2Dto3D_model", type=str, default="SDEModel2Dto3D_01")
    parser.add_argument("--SDE_3Dto2D_model", type=str,
                        default="SDEModel3Dto2D_node_adj_dense")
    parser.add_argument("--SDE_coeff_contrastive", type=float, default=1)
    parser.add_argument("--SDE_coeff_contrastive_skip_epochs", type=int, default=0)
    parser.add_argument("--SDE_coeff_generative_2Dto3D", type=float, default=1)
    parser.add_argument("--SDE_coeff_generative_3Dto2D", type=float, default=1)
    parser.add_argument("--use_extend_graph", dest="use_extend_graph",
                        action="store_true")
    parser.add_argument("--no_extend_graph", dest="use_extend_graph",
                        action="store_false")
    parser.set_defaults(use_extend_graph=True)
    parser.add_argument("--noise_on_one_hot", dest="noise_on_one_hot",
                        action="store_true")
    parser.add_argument("--no_noise_on_one_hot", dest="noise_on_one_hot",
                        action="store_false")
    parser.set_defaults(noise_on_one_hot=True)
    parser.add_argument("--SDE_anneal_power", type=float, default=0)
    parser.add_argument("--molecule_property_SDE_2D", type=float, default=1)

    # MoleculeSDE inference (ref l.129-144)
    parser.add_argument("--generator", type=str, default="PC",
                        help="type of generator [MultiScaleLD, PC]")
    parser.add_argument("--eval_epoch", type=int, default=None)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=100)
    parser.add_argument("--num_repeat_SDE_inference", type=int, default=10)
    parser.add_argument("--num_repeat_SDE_predict", type=int, default=1,
                        help="accepted for reference-CLI parity; dead in the "
                             "reference too (never read by any entry point)")
    # steps_pos is the Langevin corrector's INNER step count, wired exactly
    # like the reference inference scripts (reference
    # pretrain_MoleculeSDE_inference_2D_to_3D_VE_VP.py:66 and 3D_to_2D l.83
    # pass n_steps=args.steps_pos into the corrector)
    parser.add_argument("--steps_pos", type=int, default=100)
    parser.add_argument("--step_lr_pos", type=float, default=0.0000015,
                        help="accepted for reference-CLI parity; the PC "
                             "samplers use the reference's SNR step rule "
                             "(snr * ||z||/||grad||)^2 * 2 * alpha, which "
                             "ignores step_lr (ref inference l.194-212)")
    parser.add_argument("--min_sigma", dest="min_sigma", type=float,
                        default=0.0,
                        help="accepted for parity; unused by the PC "
                             "samplers, as in the reference PC path")
    parser.add_argument("--clip", type=float, default=1000,
                        help="accepted for parity; the reference only uses "
                             "clip in its (unshipped) MultiScaleLD path")
    parser.add_argument("--num_diffusion_timesteps_2Dto3D_inference", type=int, default=20)
    parser.add_argument("--num_diffusion_timesteps_3Dto2D_inference", type=int, default=20)
    parser.add_argument("--visualization_timesteps_interval", type=int, default=20)
    parser.add_argument("--data_path_2D_SDE", type=str, default="")
    parser.add_argument("--corrector_steps", type=int, default=None,
                        help="override for the corrector inner-step count; "
                             "defaults to --steps_pos (reference semantics)")
    parser.add_argument("--sample_mols_per_batch", type=int, default=1,
                        help="pack this many test molecules (x num_repeat "
                             "clones each) into ONE padded batch per PC "
                             "chain.  The reference runs one molecule per "
                             "chain (inference 2D->3D l.29-39); on TPU the "
                             "chain is op-count-bound at small batches, so "
                             "batching molecules multiplies generation "
                             "throughput at near-constant chain latency")
    parser.add_argument("--sampler_precision", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="compute dtype of the 2D->3D score pipeline "
                             "during sampling (bf16 halves HBM traffic; "
                             "<2%% relative score error, same checkpoint)")
    parser.add_argument("--sampler_score_chunk", type=int, default=128,
                        help="evaluate the 2D->3D score over batch chunks of "
                             "this size inside each PC step (semantics-exact;"
                             " keeps the score pipeline's pair tensors "
                             "VMEM-resident at large clone batches — the "
                             "B=1024 chain pays 1.5-4.6x per molecule "
                             "unchunked; measured 494 vs 306 conformers/s). "
                             "0 disables; ignored when the batch is not a "
                             "larger multiple of it")

    # TPU perf knobs (beyond the reference's flag surface; defaults are the
    # measured-fastest pretraining configuration — see README 'Performance')
    parser.add_argument("--train_precision", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="compute dtype of the pretraining encoders and "
                             "score networks (params/losses/BatchNorm stay "
                             "f32); float32 disables every bf16 fast path")
    parser.add_argument("--microbatch", type=int, default=0,
                        help="gradient-accumulation chunk size: batches "
                             "larger than this run as an in-program scan "
                             "over microbatches (keeps the score models' "
                             "pair tensors VMEM-resident; 128 is the "
                             "measured sweet spot at n_max=32); 0 disables")
    parser.add_argument("--microbatch_scope", type=str, default="step",
                        choices=["step", "score", "splice"],
                        help="'step' = classic gradient accumulation over "
                             "the whole loss; 'score' = only the SDE score "
                             "losses scan over chunks (encoders + "
                             "contrastive at full batch, remat scan); "
                             "'splice' = like 'score' but the backward is "
                             "spliced by hand (grad inside the scan body, "
                             "no recompute)")
    parser.add_argument("--microbatch_unroll", type=int, default=1,
                        help="unroll the gradient-accumulation scan when the "
                             "chunk count batch/microbatch is at most this "
                             "(straight-line chunks let XLA overlap chunk "
                             "boundaries); 1 never unrolls")
    parser.add_argument("--schnet_cfconv", type=str, default="auto",
                        choices=["auto", "xla", "pallas", "pallas_rbf"],
                        help="SchNet CFConv implementation for pretraining: "
                             "'auto' = fused Pallas kernel on TPU "
                             "(ops/cfconv.py), XLA elsewhere")

    # eval toggles (ref l.147-153)
    parser.add_argument("--eval_train", dest="eval_train", action="store_true")
    parser.add_argument("--no_eval_train", dest="eval_train", action="store_false")
    parser.set_defaults(eval_train=False)
    parser.add_argument("--eval_test", dest="eval_test", action="store_true")
    parser.add_argument("--no_eval_test", dest="eval_test", action="store_false")
    parser.set_defaults(eval_test=True)

    parser.add_argument("--input_data_dir", type=str, default="")
    parser.add_argument("--input_model_file", type=str, default="")
    parser.add_argument("--output_model_dir", type=str, default="")
    parser.add_argument("--threshold", type=float, default=0)

    # ---- TPU-native additions ------------------------------------------------
    parser.add_argument("--n_max", type=int, default=32,
                        help="atom-count padding bucket (static shapes)")
    parser.add_argument("--buckets", type=int, nargs="+", default=[],
                        help="size-bucketed batching, e.g. --buckets 16 32 64 "
                             "(one XLA program per bucket; fewer padded FLOPs)")
    parser.add_argument("--e_max_factor", type=int, default=4,
                        help="bond-edge budget = factor * n_max")
    parser.add_argument("--ext_e_max", type=int, default=0,
                        help="extended-edge budget (0 -> n_max^2)")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="data-parallel mesh size (0 -> all devices)")
    # multi-host data parallelism (jax.distributed; SURVEY.md section 2).
    # On TPU pod slices all three auto-detect: just pass --distributed.
    parser.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed (multi-host DP)")
    parser.add_argument("--dist_coordinator", type=str, default="",
                        help="coordinator host:port (auto-detected on TPU)")
    parser.add_argument("--dist_num_processes", type=int, default=0,
                        help="number of processes (auto-detected on TPU)")
    parser.add_argument("--dist_process_id", type=int, default=-1,
                        help="this process's id (auto-detected on TPU)")
    parser.add_argument("--synthetic_molecules", type=int, default=0,
                        help="use N synthetic molecules instead of dataset files")
    parser.add_argument("--max_molecules", type=int, default=0,
                        help="cap dataset size (0 -> all)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler trace of the first epoch here")
    parser.add_argument("--debug_nans", dest="debug_nans", action="store_true",
                        help="enable jax_debug_nans (abort on first NaN)")
    parser.set_defaults(debug_nans=False)
    parser.add_argument("--resume_from", type=str, default="",
                        help="full train-state checkpoint to resume from")
    return parser


def parse_args(argv=None) -> argparse.Namespace:
    args = get_parser().parse_args(argv)
    print("arguments\t", args)
    return args
