"""Pretraining state: models, optimizer with per-module LR scales, SDE presets.

Mirrors the reference driver's wiring (reference examples/pretrain_MoleculeSDE.py):
- four components {model_2D, model_3D, SDE_2Dto3D_model, SDE_3Dto2D_model}
  with Adam param groups scaled by gnn_2d/gnn_3d lr scales (l.331-337);
- the VE/VP/VE02/VP02/VE03/VP03 beta presets (l.225-257, 276-303) become a
  pure preset-resolution function instead of post-parse argparse mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
from flax import struct

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.models import GNN2D, PaiNN, SchNet, SDEModel2Dto3D, SDEModel3Dto2D

# (resolved_type, beta_min, beta_max, N) — reference pretrain_MoleculeSDE.py:225-257
SDE_PRESETS_2DTO3D = {
    "VE": ("VE", 0.2, 1.0, 1000),
    "VP": ("VP", 0.2, 1.0, 1000),
    "VE02": ("VE", 0.1, 10.0, 1000),
    "VP02": ("VP", 0.2, 30.0, 1000),
    "VE03": ("VE", 0.1, 1000.0, 1000),
    "VP03": ("VP", 0.2, 1000.0, 1000),
}
# reference pretrain_MoleculeSDE.py:276-303
SDE_PRESETS_3DTO2D = {
    "VE": ("VE", 0.1, 1.0, 1000),
    "VP": ("VP", 0.2, 1.0, 1000),
    "VE02": ("VE", 0.1, 10.0, 1000),
    "VP02": ("VP", 0.1, 30.0, 1000),
    "VE03": ("VE", 0.1, 1000.0, 1000),
    "VP03": ("VP", 0.1, 1000.0, 1000),
}


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    # 2D GNN (reference config.py:82-88)
    emb_dim: int = 300
    num_layer: int = 5
    jk: str = "last"
    dropout_ratio: float = 0.5
    gnn_type: str = "GIN"
    # 3D model (config.py:10-18, 66-78)
    model_3d: str = "SchNet"
    schnet_num_filters: int = 128
    schnet_num_interactions: int = 6
    schnet_num_gaussians: int = 51
    schnet_cutoff: float = 10.0
    schnet_readout: str = "mean"
    painn_radius_cutoff: float = 5.0
    painn_n_interactions: int = 3
    painn_n_rbf: int = 20
    painn_readout: str = "add"
    # SDE selection (config.py:107-114; presets resolved at build time)
    sde_type_2dto3d: str = "VE"
    sde_type_3dto2d: str = "VE"
    sde_2dto3d_variant: int = 1   # SDEModel2Dto3D_01..04
    sde_3dto2d_variant: int = 1   # SDEModel3Dto2D_node_adj_dense{,_02,_03}
    hidden_dim_2dto3d: int = 32   # pretrain_MoleculeSDE.py:226
    # loss mixing (config.py:111-124)
    coeff_contrastive: float = 1.0
    coeff_generative_2dto3d: float = 1.0
    coeff_generative_3dto2d: float = 1.0
    contrastive_skip_epochs: int = 0
    anneal_power: float = 0.0
    use_extend_graph: bool = True
    noise_on_one_hot: bool = True
    # production default: bf16 for the 2D->3D pair-feature block (HBM-bound)
    bf16_pairs: bool = True
    # mixed precision for the pair-tensor-heavy components (honest r3 device
    # trace: the step is bandwidth-bound on lane-padded [B,N,N,*] tensors;
    # bf16 halves that traffic).  Params/optimizer/losses stay f32.
    score_dtype_2dto3d: str = "bfloat16"
    schnet_bf16: bool = True
    gnn2d_bf16: bool = True
    bf16_attn_3dto2d: bool = True
    # GIN message-block implementation: "auto" = fused kernel on TPU
    # (ops/gin_messages.py — 24.0 -> 22.4 ms/step at batch 256; kills the
    # [B, E, F] relayout copies around the one-hot einsums), XLA elsewhere
    gnn2d_msg: str = "auto"
    # CFConv aggregation: "reduce" wins inside the full pretrain step
    # (layout interplay; see models/schnet.py::SchNetInteraction.agg)
    schnet_agg: str = "reduce"
    # CFConv implementation for pretraining (positions carry no gradient
    # here, so the fused kernel's zero ea/env cotangent contract is safe).
    # "auto" = fused Pallas kernel on TPU (24.0 vs 24.4 ms/step at batch 256,
    # SchNet filter dots 4.9 -> 0 ms + fewer relayout copies), XLA elsewhere.
    schnet_cfconv: str = "auto"
    # gradient-accumulation chunk size: batches larger than this run as a
    # lax.scan over microbatches inside ONE device program (VMEM-residency
    # fix for the inverted batch-scaling curve; see make_pretrain_step).
    # 0 disables.  256 is the measured VMEM-resident size at n_max=32.
    microbatch: int = 0
    # unroll the accumulation scan when the chunk count B/microbatch is at
    # most this (straight-line code: no while-loop carry boundary, and XLA
    # can overlap chunk i's backward with chunk i+1's forward); 1 = never
    microbatch_unroll: int = 1
    # what gets chunked: "step" = whole loss + grads (classic gradient
    # accumulation), "score" = only the two SDE score losses scan over
    # chunks inside ONE loss (encoders + contrastive at full batch — the
    # VMEM cliff is a score-model property; see make_pretrain_loss);
    # "splice" = like "score" with a hand-spliced backward (grad inside the
    # accumulation scan, no remat recompute; make_pretrain_grads_spliced)
    microbatch_scope: str = "step"
    # 3D->2D attention-map implementation (ops/attn_maps.py):
    # "auto" = the lane-exact "wide" XLA bank on TPU, standard XLA elsewhere
    attn_impl_3dto2d: str = "auto"
    # contrastive (config.py:98-103)
    cl_similarity_metric: str = "EBM_node_dot_prod"
    T: float = 0.1
    cl_neg_samples: int = 1
    normalize: bool = False
    # optimizer (config.py:47-49, 88, 92)
    lr: float = 1e-4
    decay: float = 0.0
    gnn_2d_lr_scale: float = 1.0
    gnn_3d_lr_scale: float = 1.0

    @property
    def reduce_mean(self) -> bool:
        # reference pretrain_MoleculeSDE.py:305-308
        return self.noise_on_one_hot


def build_models(cfg: PretrainConfig) -> Dict[str, Any]:
    """Instantiate the four components of the joint pretraining objective."""
    model_2d = GNN2D(
        num_layers=cfg.num_layer, emb_dim=cfg.emb_dim, jk=cfg.jk,
        drop_ratio=cfg.dropout_ratio, gnn_type=cfg.gnn_type,
        compute_dtype="bfloat16" if cfg.gnn2d_bf16 else None,
        msg_impl=cfg.gnn2d_msg)
    if cfg.model_3d == "SchNet":
        model_3d = SchNet(
            hidden_channels=cfg.emb_dim,
            num_filters=cfg.schnet_num_filters,
            num_interactions=cfg.schnet_num_interactions,
            num_gaussians=cfg.schnet_num_gaussians,
            cutoff=cfg.schnet_cutoff,
            readout=cfg.schnet_readout,
            compute_dtype="bfloat16" if cfg.schnet_bf16 else None,
            agg=cfg.schnet_agg, cfconv=cfg.schnet_cfconv)
    elif cfg.model_3d == "PaiNN":
        model_3d = PaiNN(
            n_atom_basis=cfg.emb_dim,
            n_interactions=cfg.painn_n_interactions,
            n_rbf=cfg.painn_n_rbf,
            cutoff=cfg.painn_radius_cutoff,
            readout=cfg.painn_readout,
            # schnet_bf16 doubles as the 3D-encoder mixed-precision flag
            compute_dtype="bfloat16" if cfg.schnet_bf16 else None)
    else:
        raise NotImplementedError(f"Model {cfg.model_3d} not included.")

    t23, bmin23, bmax23, n23 = SDE_PRESETS_2DTO3D[cfg.sde_type_2dto3d]
    sde_2dto3d = SDEModel2Dto3D(
        emb_dim=cfg.emb_dim, hidden_dim=cfg.hidden_dim_2dto3d,
        variant=cfg.sde_2dto3d_variant, sde_type=t23,
        beta_min=bmin23, beta_max=bmax23, num_diffusion_timesteps=n23,
        use_extend_graph=cfg.use_extend_graph, bf16_pairs=cfg.bf16_pairs,
        score_dtype=cfg.score_dtype_2dto3d)

    t32, bmin32, bmax32, n32 = SDE_PRESETS_3DTO2D[cfg.sde_type_3dto2d]
    # dense-net hyperparameters hard-coded by the reference driver
    # (pretrain_MoleculeSDE.py:309-315)
    sde_3dto2d = SDEModel3Dto2D(
        dim3d=cfg.emb_dim, c_init=2, c_hid=8, c_final=4, num_heads=4, adim=16,
        nhid=16, num_layers=4, num_linears=3,
        variant=cfg.sde_3dto2d_variant, sde_type=t32,
        beta_min=bmin32, beta_max=bmax32, num_diffusion_timesteps=n32,
        noise_on_one_hot=cfg.noise_on_one_hot,
        bf16_attn=cfg.bf16_attn_3dto2d,
        attn_impl=cfg.attn_impl_3dto2d)

    return {
        "model_2D": model_2d,
        "model_3D": model_3d,
        "SDE_2Dto3D_model": sde_2dto3d,
        "SDE_3Dto2D_model": sde_3dto2d,
    }


class PretrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: PretrainConfig) -> optax.GradientTransformation:
    """Adam with per-component LR groups (ref pretrain_MoleculeSDE.py:331-337):
    2D scale for {model_2D, SDE_2Dto3D_model}, 3D scale for the rest.

    Flattened implementation: the param pytree has 257 leaves, so a
    tree-wise optax chain stages ~2,500 tiny element-wise HLO ops per step
    (a measurable slice of the honest 34 ms step, r3 device trace).  Here
    every leaf is raveled into ONE vector, Adam runs as a handful of fused
    vector ops, and the two LR groups become a per-element scale vector
    built once at init.  Math identical to
    ``chain(add_decayed_weights, scale_by_adam, scale(-lr*group_scale))``.
    """
    b1, b2, eps = 0.9, 0.999, 1e-8  # optax.scale_by_adam / torch.optim.Adam

    def lr_scale_tree(params):
        return {
            k: jax.tree_util.tree_map(
                lambda p: jnp.full(p.shape, cfg.gnn_2d_lr_scale
                                   if k in ("model_2D", "SDE_2Dto3D_model")
                                   else cfg.gnn_3d_lr_scale, p.dtype), v)
            for k, v in params.items()
        }

    def init_fn(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        scale, _ = jax.flatten_util.ravel_pytree(lr_scale_tree(params))
        return {"mu": jnp.zeros_like(flat), "nu": jnp.zeros_like(flat),
                "count": jnp.zeros((), jnp.int32), "lr_scale": scale}

    def update_fn(grads, state, params=None):
        g, unravel = jax.flatten_util.ravel_pytree(grads)
        if cfg.decay:
            p, _ = jax.flatten_util.ravel_pytree(params)
            g = g + cfg.decay * p
        count = state["count"] + 1
        mu = b1 * state["mu"] + (1 - b1) * g
        nu = b2 * state["nu"] + (1 - b2) * g * g
        c = count.astype(jnp.float32)
        mu_hat = mu / (1 - b1 ** c)
        nu_hat = nu / (1 - b2 ** c)
        upd = -cfg.lr * state["lr_scale"] * mu_hat / (jnp.sqrt(nu_hat) + eps)
        new_state = {"mu": mu, "nu": nu, "count": count,
                     "lr_scale": state["lr_scale"]}
        return unravel(upd), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def create_pretrain_state(
    cfg: PretrainConfig, batch: GraphBatch, key: jax.Array
) -> Tuple[Dict[str, Any], PretrainState]:
    """Initialize all four components and the optimizer."""
    from moleculesde_tpu.data.compact import CompactBatch, expand_on_device

    if isinstance(batch, CompactBatch):
        # init only needs shapes/masks; run the device featurizer once
        batch = jax.jit(expand_on_device)(batch)
    models = build_models(cfg)
    k2d, k3d, k23, k32, kn = jax.random.split(key, 5)

    v2d = models["model_2D"].init({"params": k2d, "dropout": kn}, batch)
    _, lat3d_shape = cfg.emb_dim, cfg.emb_dim
    v3d = models["model_3D"].init(
        k3d, batch.atomic_numbers, batch.positions, batch.node_mask,
        batch.num_graphs, batch.n_max)

    node_2d = jnp.zeros((batch.num_nodes, cfg.emb_dim))
    node_3d = jnp.zeros((batch.num_nodes, cfg.emb_dim))
    v23 = models["SDE_2Dto3D_model"].init(
        {"params": k23, "dropout": kn}, node_2d, batch, kn,
        method=SDEModel2Dto3D.loss)
    v32 = models["SDE_3Dto2D_model"].init(
        k32, node_3d, batch, kn, method=SDEModel3Dto2D.loss)

    params = {
        "model_2D": v2d["params"],
        "model_3D": v3d["params"],
        "SDE_2Dto3D_model": v23["params"],
        "SDE_3Dto2D_model": v32["params"],
    }
    batch_stats = {
        "model_2D": v2d.get("batch_stats", {}),
        "SDE_2Dto3D_model": v23.get("batch_stats", {}),
    }
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    state = PretrainState(
        params=params, batch_stats=batch_stats, opt_state=opt_state,
        step=jnp.zeros((), jnp.int32))
    return models, state
