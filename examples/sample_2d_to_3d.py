"""2D->3D conformer generation CLI (reverse-SDE PC sampling).

TPU re-design of the reference inference script (reference
examples/pretrain_MoleculeSDE_inference_2D_to_3D_VE_VP.py): for each test
molecule, clone it ``num_repeat_SDE_inference`` times into one padded batch,
compute the 2D conditioning representation once, then run the full
predictor-corrector chain as a single ``lax.scan`` program (the reference
loops in Python and ships debug early-breaks at 10 molecules x 11 steps;
here the full chain runs on-device).  Results are pickled as
{atom_feats, positions_true, positions_generated [num_repeat, n, 3]}.

Example:
  python examples/sample_2d_to_3d.py --dataset=synthetic --end=4 \
      --num_repeat_SDE_inference=4 --output_model_dir=/tmp/gen
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

from moleculesde_tpu.models import GNN2D, SDEModel2Dto3D
from moleculesde_tpu.pretrain.train_state import SDE_PRESETS_2DTO3D
from moleculesde_tpu.sampling import repeat_graph_batch, sample_positions_pc
from moleculesde_tpu.utils.checkpoints import load_pretrain_checkpoint

MODEL_2DTO3D_VARIANTS = {
    "SDEModel2Dto3D_01": 1, "SDEModel2Dto3D_02": 2,
    "SDEModel2Dto3D_03": 3, "SDEModel2Dto3D_04": 4,
}


def load_graphs(args):
    if args.dataset == "synthetic":
        from moleculesde_tpu.data.synthetic import random_molecule

        rng = np.random.default_rng(args.seed)
        return [random_molecule(rng, int(rng.integers(4, args.n_max + 1)))
                for _ in range(max(args.end, 1))]
    from moleculesde_tpu.data.datasets import load_pcqm4mv2

    root = os.path.join(args.input_data_dir, args.dataset)
    return load_pcqm4mv2(root, max_molecules=args.end or None,
                         extend=args.use_extend_graph)


def main(argv=None):
    args = parse_args(argv)
    graphs = load_graphs(args)

    t23, bmin, bmax, n_steps = SDE_PRESETS_2DTO3D[args.SDE_type_2Dto3D]
    model_2d = GNN2D(num_layers=args.num_layer, emb_dim=args.emb_dim,
                     jk=args.JK, drop_ratio=args.dropout_ratio,
                     gnn_type=args.gnn_type)
    sde_model = SDEModel2Dto3D(
        emb_dim=args.emb_dim, hidden_dim=32,
        variant=MODEL_2DTO3D_VARIANTS[args.SDE_2Dto3D_model], sde_type=t23,
        beta_min=bmin, beta_max=bmax, num_diffusion_timesteps=n_steps,
        use_extend_graph=args.use_extend_graph,
        score_dtype=args.sampler_precision)

    key = jax.random.PRNGKey(args.seed)
    n_max = args.n_max
    e_max = args.e_max_factor * n_max
    ext_e_max = args.ext_e_max or n_max * n_max

    init_batch = repeat_graph_batch(graphs[0], args.num_repeat_SDE_inference,
                                    n_max, e_max, ext_e_max)
    if args.input_model_file:
        all_params, all_bs = load_pretrain_checkpoint(args.input_model_file)
        v2d = {"params": all_params["model_2D"],
               "batch_stats": all_bs.get("model_2D", {})}
        v23 = {"params": all_params["SDE_2Dto3D_model"],
               "batch_stats": all_bs.get("SDE_2Dto3D_model", {})}
        print(f"loaded checkpoint {args.input_model_file}")
    else:
        v2d = model_2d.init({"params": key, "dropout": key}, init_batch)
        node_2d0 = jax.numpy.zeros((init_batch.num_nodes, args.emb_dim))
        v23 = sde_model.init({"params": key, "dropout": key}, node_2d0,
                             init_batch, key, method=SDEModel2Dto3D.loss)

    sample_steps = args.num_diffusion_timesteps_2Dto3D_inference or n_steps
    # corrector inner steps: --steps_pos, like the reference's
    # LangevinCorrector(n_steps=args.steps_pos) (inference 2D->3D l.66)
    corrector_steps = (args.corrector_steps if args.corrector_steps is not None
                       else args.steps_pos)

    # per-device batches are already small under the DP mesh; in-scan score
    # chunking (sampling/pc.py) only pays off single-device at large B
    score_chunk = (args.sampler_score_chunk or None) \
        if (args.num_devices or 1) == 1 else None

    def generate_impl(batch, key):
        node_2d = model_2d.apply(
            v2d, batch, deterministic=True, use_running_average=True)
        return sample_positions_pc(
            sde_model, v23, node_2d, batch, key,
            n_steps=sample_steps, corrector_steps=corrector_steps,
            score_chunk=score_chunk)

    # conformer generation is embarrassingly data-parallel (the reference's
    # production inference is num_repeat clones x molecules, inference 2D->3D
    # l.29-39): shard the clone batch across the mesh, replicate the params.
    n_dev = args.num_devices or 1
    if n_dev > 1:
        from moleculesde_tpu.parallel import make_mesh, replicate, sharded_jit

        if (args.sample_mols_per_batch * args.num_repeat_SDE_inference) \
                % n_dev:
            raise SystemExit(
                "--sample_mols_per_batch * --num_repeat_SDE_inference must "
                f"be divisible by --num_devices={n_dev} (whole molecules "
                "stay on one device)")
        mesh = make_mesh(n_dev)
        v2d = replicate(v2d, mesh)
        v23 = replicate(v23, mesh)
        generate = sharded_jit(generate_impl, mesh, ("data", "repl"), "data")
    else:
        generate = jax.jit(generate_impl)

    from moleculesde_tpu.core.batch import pad_graphs

    rep = args.num_repeat_SDE_inference
    k_mols = max(1, args.sample_mols_per_batch)
    mols = graphs[args.start : args.end]
    results = []
    for c0 in range(0, len(mols), k_mols):
        # list(): dataset loaders may return sequence views (PackedSubset)
        # rather than plain lists
        chunk = list(mols[c0 : c0 + k_mols])
        # pad the final chunk with clones of its last molecule so the jitted
        # chain keeps one static batch shape; the extras are discarded below
        padded = chunk + [chunk[-1]] * (k_mols - len(chunk))
        glist = [g for g in padded for _ in range(rep)]
        batch = pad_graphs(glist, n_max=n_max, e_max=e_max,
                           ext_e_max=ext_e_max)
        key, sub = jax.random.split(key)
        t0 = time.time()
        pos_all = np.asarray(generate(batch, sub)).reshape(
            k_mols, rep, n_max, 3)
        chunk_dt = time.time() - t0
        for j, g in enumerate(chunk):
            i = c0 + j
            n_atoms = g["atom_feats"].shape[0]
            pos_gen = pos_all[j, :, :n_atoms]
            entry = {
                "atom_feats": g["atom_feats"],
                "positions_true": g.get("positions"),
                "pos_gen": pos_gen,
                "num_pos_gen": rep,
            }
            msg = (f"molecule {i}: {n_atoms} atoms, {rep} conformers in "
                   f"{chunk_dt / len(chunk):.2f}s")
            if g.get("positions") is not None:
                from moleculesde_tpu.utils.rmsd import coverage_matching

                cov, mat = coverage_matching(
                    pos_gen, np.asarray(g["positions"])[None],
                    threshold=args.threshold or 0.5)
                entry["cov"] = cov
                entry["mat"] = mat
                msg += f"  COV={cov:.3f} MAT={mat:.3f}"
            results.append(entry)
            print(msg)

    if args.output_model_dir:
        os.makedirs(args.output_model_dir, exist_ok=True)
        out = os.path.join(
            args.output_model_dir,
            f"2D_to_3D_{args.generator}_{args.start}_{args.end}"
            f"_repeat_{args.num_repeat_SDE_inference}.pkl")
        with open(out, "wb") as f:
            pickle.dump(results, f)
        print(f"save generated {args.generator} samples to {out} done!")
    return results


if __name__ == "__main__":
    main()
