"""3D->2D graph generation CLI (joint (x, adj) reverse-SDE PC sampling).

TPU re-design of the reference inference script (reference
examples/pretrain_MoleculeSDE_inference_3D_to_2D_VE_VP.py): conditioned on
the 3D encoder latent, jointly denoise node one-hots and the dense adjacency
with interleaved corrector/predictor updates, using oracle node flags from
the true bond graph.  Runs as one lax.scan program.

Example:
  python examples/sample_3d_to_2d.py --dataset=synthetic --batch_size=4 \
      --output_model_dir=/tmp/gen
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from config import parse_args

from moleculesde_tpu.data.loader import GraphLoader
from moleculesde_tpu.models import PaiNN, SchNet, SDEModel3Dto2D
from moleculesde_tpu.pretrain.train_state import SDE_PRESETS_3DTO2D
from moleculesde_tpu.sampling import sample_graph_pc
from moleculesde_tpu.utils.checkpoints import load_pretrain_checkpoint

MODEL_3DTO2D_VARIANTS = {
    "SDEModel3Dto2D_node_adj_dense": 1,
    "SDEModel3Dto2D_node_adj_dense_02": 2,
    "SDEModel3Dto2D_node_adj_dense_03": 3,
}


def load_graphs(args):
    if args.dataset == "synthetic":
        from moleculesde_tpu.data.synthetic import random_molecule

        rng = np.random.default_rng(args.seed)
        return [random_molecule(rng, int(rng.integers(4, args.n_max + 1)))
                for _ in range(max(args.end, args.batch_size))]
    from moleculesde_tpu.data.datasets import load_pcqm4mv2

    root = os.path.join(args.input_data_dir, args.dataset)
    return load_pcqm4mv2(root, max_molecules=args.end or None,
                         extend=args.use_extend_graph)


def main(argv=None):
    args = parse_args(argv)
    graphs = load_graphs(args)

    t32, bmin, bmax, n_steps = SDE_PRESETS_3DTO2D[args.SDE_type_3Dto2D]
    if args.model_3d == "SchNet":
        encoder = SchNet(
            hidden_channels=args.emb_dim,
            num_filters=args.SchNet_num_filters,
            num_interactions=args.SchNet_num_interactions,
            num_gaussians=args.SchNet_num_gaussians,
            cutoff=args.SchNet_cutoff,
            readout=args.SchNet_readout)
    else:
        encoder = PaiNN(
            n_atom_basis=args.emb_dim,
            n_interactions=args.PaiNN_n_interactions,
            n_rbf=args.PaiNN_n_rbf,
            cutoff=args.PaiNN_radius_cutoff,
            readout=args.PaiNN_readout)
    sde_model = SDEModel3Dto2D(
        dim3d=args.emb_dim, c_init=2, c_hid=8, c_final=4, num_heads=4, adim=16,
        nhid=16, num_layers=4, num_linears=3,
        variant=MODEL_3DTO2D_VARIANTS[args.SDE_3Dto2D_model], sde_type=t32,
        beta_min=bmin, beta_max=bmax, num_diffusion_timesteps=n_steps,
        noise_on_one_hot=args.noise_on_one_hot)

    key = jax.random.PRNGKey(args.seed)
    loader = GraphLoader(graphs, batch_size=args.batch_size, n_max=args.n_max,
                         e_max=args.e_max_factor * args.n_max,
                         shuffle=False, drop_last=False, seed=args.seed)
    init_batch, _ = next(iter(loader))

    if args.input_model_file:
        all_params, all_bs = load_pretrain_checkpoint(args.input_model_file)
        v3d = {"params": all_params["model_3D"]}
        v32 = {"params": all_params["SDE_3Dto2D_model"]}
        print(f"loaded checkpoint {args.input_model_file}")
    else:
        v3d = encoder.init(
            key, init_batch.atomic_numbers, init_batch.positions,
            init_batch.node_mask, init_batch.num_graphs, init_batch.n_max)
        node_3d0 = jax.numpy.zeros((init_batch.num_nodes, args.emb_dim))
        v32 = sde_model.init(key, node_3d0, init_batch, key,
                             method=SDEModel3Dto2D.loss)

    sample_steps = args.num_diffusion_timesteps_3Dto2D_inference or n_steps
    # corrector inner steps: --steps_pos, like the reference's corrector
    # construction n_steps=args.steps_pos (inference 3D->2D l.83)
    corrector_steps = (args.corrector_steps if args.corrector_steps is not None
                       else args.steps_pos)

    def generate_impl(batch, key):
        _, node_3d = encoder.apply(
            v3d, batch.atomic_numbers, batch.positions, batch.node_mask,
            batch.num_graphs, batch.n_max)
        return sample_graph_pc(
            sde_model, v32, node_3d, batch, key,
            n_steps=sample_steps, corrector_steps=corrector_steps)

    # joint (x, adj) generation is per-molecule independent: shard the batch
    # across the mesh, replicate both networks' params (SURVEY.md section 2).
    n_dev = args.num_devices or 1
    if n_dev > 1:
        from moleculesde_tpu.parallel import make_mesh, replicate, sharded_jit

        if args.batch_size % n_dev:
            raise SystemExit(
                f"--batch_size must be divisible by --num_devices={n_dev}")
        mesh = make_mesh(n_dev)
        v3d = replicate(v3d, mesh)
        v32 = replicate(v32, mesh)
        generate = sharded_jit(generate_impl, mesh, ("data", "repl"), "data")
    else:
        generate = jax.jit(generate_impl)

    results = []
    for batch, n_real in loader:
        key, sub = jax.random.split(key)
        t0 = time.time()
        x, adj, x_mean, adj_mean = generate(batch, sub)
        results.append({
            "x_gen": np.asarray(x_mean)[:n_real],
            "adj_gen": np.asarray(adj_mean)[:n_real],
            "atom_feats_true": np.asarray(batch.atom_feats).reshape(
                batch.num_graphs, batch.n_max, -1)[:n_real],
        })
        print(f"generated {n_real} graphs in {time.time()-t0:.2f}s")
        if len(results) * args.batch_size >= args.end > 0:
            break

    if args.output_model_dir:
        os.makedirs(args.output_model_dir, exist_ok=True)
        out = os.path.join(
            args.output_model_dir,
            f"3D_to_2D_{args.generator}_{args.start}_{args.end}.pkl")
        with open(out, "wb") as f:
            pickle.dump(results, f)
        print(f"save generated {args.generator} samples to {out} done!")
    return results


if __name__ == "__main__":
    main()
