"""2D->3D frame-based SE(3)-equivariant score models (dense-pair TPU design).

Re-design of the reference's four score-model variants (reference
Geom3D/models/MoleculeSDE/SDE_model_2D_to_3D.py: SDEModel2Dto3D_01..04) and
the shared EquivariantScoreNetwork (equivariant_scorenetwork.py).  The
architecture is identical — invariant scalar features (2D-embedding x
distance-Fourier x frame-coefficient embeddings) drive a transformer-GNN
whose per-edge MLP emits 3 dynamic coefficients that linearly mix the
equivariant frame basis; an edge->node mean aggregation yields the per-node
3-vector score.

TPU-first layout: the extended molecular graph is nearly all-pairs (1-4-hop
shortcuts), so per-edge quantities live on dense ``[B, N, N, ...]`` tensors
indexed ``[batch, source, dest]`` and masked by the extended adjacency.
Attention (the reference's PyG TransformerConv, softmax grouped by
destination) becomes masked dense attention — batched einsums on the MXU —
replacing the gather/segment-scatter path, which profiling showed dominates
the training step on TPU (~120 ms -> matmul-bound).  Pair-concat linears are
decomposed into two per-node matmuls broadcast-added over pairs, so no
``[B, N, N, 2*emb]`` tensor is ever materialized.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.core.segment import masked_segment_mean
from moleculesde_tpu.models.layers import (
    MLP, DenseParams, MaskedBatchNorm, PairMaskedBatchNorm,
    xavier_uniform, zeros_init)
from moleculesde_tpu.ops.fourier import gaussian_fourier_projection
from moleculesde_tpu.ops.frames import EPSILON
from moleculesde_tpu.ops.pair_block import pair_relu_project
from moleculesde_tpu.sde import SDE, make_sde

_SQRT_GUARD = 1e-24


def _safe_norm(x, axis=-1, keepdims=True):
    return jnp.sqrt(jnp.sum(x ** 2, axis=axis, keepdims=keepdims) + _SQRT_GUARD)


class PairDense(nn.Module):
    """Linear over concat(h_s, h_d) pair features without materializing the
    concatenated ``[B, N, N, 2*F]`` tensor: kernel [2F, out] split into the
    source and dest halves, applied per node, broadcast-added over pairs."""

    features: int

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """h: [B, N, F] -> (src_part [B, N, out], dst_part [B, N, out]);
        pair value is ``src_part[:, :, None] + dst_part[:, None, :] (+ bias)``."""
        f = h.shape[-1]
        kernel = self.param("kernel", xavier_uniform, (2 * f, self.features))
        bias = self.param("bias", zeros_init, (self.features,))
        src = h @ kernel[:f]
        dst = h @ kernel[f:] + bias
        return src, dst


def dense_frames(pos: jnp.ndarray):
    """All-pairs frame basis + invariant coefficients on [B, N, 3] positions.

    Dense analogue of ops.frames.frame_features (reference coord2basis,
    SDE_model_2D_to_3D.py:35-47 and the coefficient block l.162-178), indexed
    ``[b, s, d]`` to match edge (row=s, col=d).  NaN-safe on the diagonal and
    padded rows via sqrt guards.

    TPU layout note: every 3-vector is kept as THREE separate ``[B, N, N]``
    component arrays instead of one ``[B, N, N, 3]`` tensor.  With the 3 on
    the minor axis the VPU pads 3 -> 128 lanes and the whole frame pipeline
    runs at ~2% lane utilization (profiled at 3.3 ms for B=64, N=32 —
    dominating the PC sampler); component-wise the minor dims are (N, N).

    Returns ``(basis, coff_s, coff_d, pseudo_angle)`` where ``basis`` is a
    3-tuple (diff, cross, vertical) of component triples ``(x, y, z)``,
    ``coff_s``/``coff_d`` are component triples of frame coefficients, and
    ``pseudo_angle`` is ``(sin, cos)``.
    """
    comps = [pos[..., k] for k in range(3)]  # [B, N] each
    ps = [c[:, :, None] for c in comps]      # source (row), broadcastable
    pd = [c[:, None, :] for c in comps]      # dest (col)

    diff = [s - d for s, d in zip(ps, pd)]
    # cross(p_s, p_d) componentwise
    cross = [ps[1] * pd[2] - ps[2] * pd[1],
             ps[2] * pd[0] - ps[0] * pd[2],
             ps[0] * pd[1] - ps[1] * pd[0]]

    def _norm3(v):
        return jnp.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2 + _SQRT_GUARD)

    dn = _norm3(diff) + EPSILON
    diff = [v / dn for v in diff]
    cn = _norm3(cross) + EPSILON
    cross = [v / cn for v in cross]
    vert = [diff[1] * cross[2] - diff[2] * cross[1],
            diff[2] * cross[0] - diff[0] * cross[2],
            diff[0] * cross[1] - diff[1] * cross[0]]

    def proj(r):  # project r onto the frame -> 3 coefficient planes
        return (
            diff[0] * r[0] + diff[1] * r[1] + diff[2] * r[2],
            # reflection anti-symmetry (ref l.359-360)
            jnp.abs(cross[0] * r[0] + cross[1] * r[1] + cross[2] * r[2]),
            vert[0] * r[0] + vert[1] * r[1] + vert[2] * r[2],
        )

    coff_s = proj(ps)
    coff_d = proj(pd)
    dot = sum(a * b for a, b in zip(coff_s, coff_d))
    ns = _norm3(coff_s)
    nd = _norm3(coff_d)
    pseudo_cos = dot / (ns + EPSILON) / (nd + EPSILON)
    pseudo_sin = jnp.sqrt(jnp.clip(1.0 - pseudo_cos ** 2, 1e-12))
    return (diff, cross, vert), coff_s, coff_d, (pseudo_sin, pseudo_cos)


class DenseGATLayer(nn.Module):
    """TransformerConv + FFN with post-norm residuals (ref
    equivariant_scorenetwork.py:13-40) as masked dense attention.

    PyG TransformerConv semantics: logits = q_d . (k_s + e_sd) / sqrt(c),
    softmax over sources s for each destination d, messages (v_s + e_sd) *
    alpha summed at d, heads concatenated, plus a root-skip linear.

    ``dtype=bfloat16`` halves the HBM traffic of the pair-resident tensors
    (the sampling hot path is bandwidth-bound); softmax stays in f32.
    """

    hidden_dim: int
    n_head: int
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edge_attr, pair_mask, deterministic: bool = True):
        h, c = self.n_head, self.hidden_dim // self.n_head
        b, n, _ = x.shape

        def dense(feat, name=None):
            return nn.Dense(feat, kernel_init=xavier_uniform, name=name,
                            dtype=self.dtype)

        q = dense(h * c, "lin_query")(x)
        k = dense(h * c, "lin_key")(x)
        v = dense(h * c, "lin_value")(x)
        e = dense(h * c, "lin_edge")(edge_attr)
        q = q.reshape(b, n, h, c)
        k = k.reshape(b, n, h, c)
        v = v.reshape(b, n, h, c)
        e = e.reshape(b, n, n, h, c)

        # logits[b, h, s, d] = q_d . k_s + q_d . e_sd  (f32 for the softmax;
        # CPU XLA lacks bf16xbf16->f32 dots, so upcast after the einsum)
        logits = jnp.einsum("bdhc,bshc->bhsd", q, k).astype(jnp.float32)
        logits = logits + jnp.einsum("bdhc,bsdhc->bhsd", q, e
                                     ).astype(jnp.float32)
        logits = logits / jnp.sqrt(float(c))
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(pair_mask[:, None, :, :], logits, neg)
        alpha = jax.nn.softmax(logits, axis=2)  # over sources s (f32)
        alpha = alpha * pair_mask[:, None, :, :]  # isolated dests -> all-zero rows
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
        alpha = alpha.astype(v.dtype)

        out = jnp.einsum("bhsd,bshc->bdhc", alpha, v)
        out = out + jnp.einsum("bhsd,bsdhc->bdhc", alpha, e)
        out = out.reshape(b, n, h * c)
        mha = out + dense(h * c, "lin_skip")(x)

        x = x + nn.LayerNorm(dtype=self.dtype)(mha)
        ffn = dense(self.hidden_dim)(x)
        ffn = nn.silu(ffn)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        ffn = dense(self.hidden_dim)(ffn)
        x = x + nn.LayerNorm(dtype=self.dtype)(ffn)
        return x


class EquivariantScoreNetwork(nn.Module):
    """Stacked GAT modules emitting a per-node equivariant 3-vector score
    (ref equivariant_scorenetwork.py:84-169), dense-pair formulation."""

    hidden_dim: int
    hidden_coff_dim: int = 128
    num_layers: int = 2
    num_convs: int = 2
    n_head: int = 8
    dropout: float = 0.1
    short_cut: bool = False
    concat_hidden: bool = False
    dtype: Optional[jnp.dtype] = None  # bf16 halves pair-tensor HBM traffic

    @nn.compact
    def __call__(self, node_attr, edge_attr, pair_mask, equivariant_basis,
                 deterministic: bool = True):
        """node_attr [B,N,H]; edge_attr [B,N,N,H]; pair_mask [B,N,N] bool;
        ``equivariant_basis`` is the component-structured (diff, cross,
        vertical) triple from :func:`dense_frames` — each a 3-tuple of
        [B, N, N] planes (see the layout note there).  Returns gradient
        [B, N, 3]."""
        basis = equivariant_basis  # ((dx,dy,dz), (cx,cy,cz), (vx,vy,vz))
        b, n, _ = node_attr.shape
        hiddens = []
        conv_input = node_attr
        grad_comps = [jnp.zeros((b, n), dtype=node_attr.dtype)
                      for _ in range(3)]

        # per-dest valid-source counts for the EquiLayer mean (ref l.43-81)
        count = jnp.maximum(pair_mask.sum(axis=1), 1)
        maskf = pair_mask.astype(node_attr.dtype)

        for module_idx in range(self.num_layers):
            for conv_idx in range(self.num_convs):
                hidden = DenseGATLayer(self.hidden_dim, self.n_head,
                                       self.dropout, dtype=self.dtype)(
                    conv_input, edge_attr, pair_mask, deterministic)
                if conv_idx < self.num_convs - 1:
                    hidden = nn.silu(hidden)
                if self.short_cut and hidden.shape == conv_input.shape:
                    hidden = hidden + conv_input
                hiddens.append(hidden)
                conv_input = hidden

            node_feature = (jnp.concatenate(hiddens, axis=-1)
                            if self.concat_hidden else hiddens[-1])

            # basis MLP input = [h_s + h_d, edge_attr]; its first linear
            # W [2H, coff_dim] splits as W_h (h_s + h_d) + W_e e + b, letting
            # the node part run per node instead of per pair (ref l.113-119).
            # The pair-resident intermediates ([B, N, N, coff_dim]) are the
            # largest activations of the whole step; jax.checkpoint keeps them
            # out of the saved-residual set (recomputed in backward) so large
            # batches stay HBM-resident.
            wh, _ = DenseParams(self.hidden_coff_dim, node_feature.shape[-1],
                                use_bias=False,
                                name=f"basis_node_{module_idx}")()
            we, be = DenseParams(self.hidden_coff_dim, edge_attr.shape[-1],
                                 name=f"basis_edge_{module_idx}")()
            wo, bo = DenseParams(3, self.hidden_coff_dim,
                                 name=f"basis_out_{module_idx}")()

            def coff_mix(node_f, edge_a, basis, maskf, wh, we, be, wo, bo):
                dt = self.dtype or node_f.dtype
                h_part = node_f.astype(dt) @ wh.astype(dt)
                e_part = edge_a.astype(dt) @ we.astype(dt) + be.astype(dt)
                coff = jax.nn.silu(
                    h_part[:, :, None, :] + h_part[:, None, :, :] + e_part)
                # dynamic coefficients with component-MAJOR layout [3,B,N,N]
                # (a [..., 3]-minor dot output would run at 3/128 lanes)
                c = jnp.einsum("bsdf,fc->cbsd", coff, wo.astype(dt)
                               ).astype(jnp.float32) \
                    + bo[:, None, None, None]
                # mix the frame basis per component and mean over sources
                return [
                    ((c[0] * bx[0] + c[1] * bx[1] + c[2] * bx[2]) * maskf
                     ).sum(axis=1)
                    for bx in zip(*basis)  # (dx,cx,vx), (dy,cy,vy), (dz,cz,vz)
                ]

            mixed = jax.checkpoint(coff_mix)(
                node_feature, edge_attr, basis, maskf, wh, we, be, wo, bo)
            # EquiLayer(aggr="mean"): mean over sources s at destination d
            grad_comps = [g + m / count for g, m in zip(grad_comps, mixed)]

        gradient = jnp.stack(grad_comps, axis=-1)  # [B, N, 3]
        return {"node_feature": node_feature, "gradient": gradient}


class SDEModel2Dto3D(nn.Module):
    """Unified implementation of the reference's SDEModel2Dto3D_01..04.

    ``variant`` selects the edge-feature recipe (ref SDE_model_2D_to_3D.py):
      1: edge_attr = edge_2D_emb + frame_invariant                  (l.69-249)
      2: ... + perturbed-distance Fourier gate:
         edge_attr = dist_inv * edge_2D_emb + frame_invariant       (l.252-445)
      3: linear edge_2D_emb + bond-type embedding on ext_attr       (l.448-632)
      4: like 3 with [h_s * h_d, h_s + h_d] pair features           (l.635-819)
    """

    emb_dim: int
    hidden_dim: int = 32
    variant: int = 2
    beta_min: float = 0.2
    beta_max: float = 1.0
    num_diffusion_timesteps: int = 1000
    sde_type: str = "VE"
    short_cut: bool = False
    concat_hidden: bool = False
    use_extend_graph: bool = True
    # compute the bandwidth-dominant pair-feature block in bfloat16 (HBM-bound
    # on TPU; frames, losses and the score head stay f32)
    bf16_pairs: bool = False
    # pair-block implementation: "auto" = fused Pallas kernel on TPU
    # (ops/pair_block.py: never materializes [B, N, N, emb]), checkpointed XLA
    # elsewhere; "xla" / "pallas" / "pallas_interpret" force one.
    pair_impl: str = "auto"
    # compute dtype of the invariant-feature/score-network pipeline.
    # "bfloat16" halves pair-tensor HBM traffic (the sampling chain is
    # bandwidth-bound); frame geometry, softmax and the equivariant mixing
    # stay f32.  Same params either way — sampler CLIs opt in via
    # model.clone(score_dtype="bfloat16") without touching checkpoints.
    score_dtype: str = "float32"

    @property
    def sde_pos(self) -> SDE:
        return make_sde(self.sde_type, self.beta_min, self.beta_max,
                        self.num_diffusion_timesteps)

    def setup(self):
        h = self.hidden_dim
        if self.variant in (1, 2):
            self.edge_2D_emb_0 = PairDense(self.emb_dim)
            self.edge_2D_emb_bn = PairMaskedBatchNorm()
            self.edge_2D_emb_1 = DenseParams(h, self.emb_dim)
        elif self.variant == 3:
            self.edge_2D_emb = PairDense(h)
        else:  # variant 4
            self.edge_2D_emb_kernel = self.param(
                "edge_2D_emb_kernel", xavier_uniform, (2 * self.emb_dim, h))
            self.edge_2D_emb_bias = self.param(
                "edge_2D_emb_bias", zeros_init, (h,))
        if self.variant in (3, 4):
            self.edge_emb = nn.Embed(100, h, embedding_init=xavier_uniform)
        dt = jnp.bfloat16 if self.score_dtype == "bfloat16" else None
        self.coff_fourier_W = self.param(
            "coff_fourier_W", nn.initializers.normal(1.0), (h,))
        self.coff_mlp = nn.Dense(h, kernel_init=xavier_uniform, dtype=dt)
        self.project = MLP([h, h], activation="silu", dtype=dt)
        if self.variant == 2:
            self.dist_fourier_W = self.param(
                "dist_fourier_W", nn.initializers.normal(1.0), (h,))
            self.input_mlp = MLP([h], activation="silu", dtype=dt)
        self.node_emb = MLP([h], activation="silu", dtype=dt)
        self.score_network = EquivariantScoreNetwork(
            hidden_dim=h, hidden_coff_dim=128,
            short_cut=self.short_cut, concat_hidden=self.concat_hidden,
            dtype=dt)

    def _pair_mask_attr(self, batch: GraphBatch):
        """Dense [B, N, N] extended-adjacency mask + bond-type labels,
        indexed [b, s, d], scattered once from the padded edge lists.
        The device-side ingest path (data/compact.py) builds the dense form
        directly on the TPU — use it as-is."""
        if batch.ext_dense_mask is not None:
            return batch.ext_dense_mask, batch.ext_dense_attr
        if self.use_extend_graph:
            src, dst, emask, eattr = (batch.ext_src, batch.ext_dst,
                                      batch.ext_mask, batch.ext_attr)
        else:
            src, dst, emask = batch.edge_src, batch.edge_dst, batch.edge_mask
            eattr = batch.edge_feats[:, 0] + 1
        b_idx = jnp.where(emask, src // batch.n_max, batch.num_graphs)
        s = src % batch.n_max
        d = dst % batch.n_max
        shape = (batch.num_graphs, batch.n_max, batch.n_max)
        mask = jnp.zeros(shape, dtype=bool).at[b_idx, s, d].set(True, mode="drop")
        attr = jnp.zeros(shape, dtype=jnp.int32).at[b_idx, s, d].set(
            eattr.astype(jnp.int32), mode="drop")
        return mask, attr

    def precompute_conditioning(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        use_running_average: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Position-independent conditioning features.

        Everything here depends only on the 2D graph (node embeddings, bond
        topology) — it is loop-invariant across the reverse-SDE sampling chain
        (the reference recomputes it in every one of the 1000 get_score calls,
        SDE_model_2D_to_3D.py:393-445), so samplers hoist it out of the
        ``lax.scan`` and reuse the result at every step.
        """
        b, n = batch.num_graphs, batch.n_max
        h = self.hidden_dim
        pair_mask, pair_attr = self._pair_mask_attr(batch)
        h2d = node_2d_repr.reshape(b, n, -1)

        # --- 2D edge embedding -------------------------------------------------
        if self.variant in (1, 2):
            src_p, dst_p = self.edge_2D_emb_0(h2d)
            a, c = self.edge_2D_emb_bn(src_p, dst_p, pair_mask,
                                       use_running_average)
            w1, b1 = self.edge_2D_emb_1()
            edge_attr_2d = pair_relu_project(
                a, c, w1, bf16=self.bf16_pairs, impl=self.pair_impl) + b1
        else:
            if self.variant == 3:
                src_p, dst_p = self.edge_2D_emb(h2d)
                edge_attr_2d = src_p[:, :, None, :] + dst_p[:, None, :, :]
            else:  # variant 4: [h_s * h_d, h_s + h_d] pair features (ref l.726)
                kernel = self.edge_2D_emb_kernel
                bias = self.edge_2D_emb_bias
                w_mul, w_add = kernel[: self.emb_dim], kernel[self.emb_dim :]
                # (h_s * h_d) @ W1 decomposes via einsum; (h_s + h_d) @ W2 splits
                edge_attr_2d = (
                    jnp.einsum("bsf,bdf,fo->bsdo", h2d, h2d, w_mul)
                    + (h2d @ w_add)[:, :, None, :]
                    + (h2d @ w_add)[:, None, :, :]
                    + bias
                )
            bond_emb = self.edge_emb(jnp.clip(pair_attr, 0, 99))
            edge_attr_2d = edge_attr_2d + bond_emb

        node_attr = self.node_emb(h2d)
        return {"edge_attr_2d": edge_attr_2d, "node_attr": node_attr,
                "pair_mask": pair_mask}

    def score_from_cond(
        self,
        cond: Dict[str, jnp.ndarray],
        batch: GraphBatch,
        pos: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Position-dependent half: frames + invariant coefficient features +
        equivariant score network -> raw gradient [N_nodes, 3]."""
        h = self.hidden_dim
        b, n = batch.num_graphs, batch.n_max
        pair_mask = cond["pair_mask"]
        edge_attr_2d = cond["edge_attr_2d"]
        pos3 = pos.reshape(b, n, 3)

        # --- equivariant frames + invariant coefficients -----------------------
        basis, coff_s, coff_d, (pseudo_sin, pseudo_cos) = dense_frames(pos3)

        w_coff = jax.lax.stop_gradient(self.coff_fourier_W)  # frozen (ref GFP l.62)

        def coff_embed(coff):
            # embeds components 0 and 2 (component 1 is |.|-folded; ref l.111-118)
            e0 = gaussian_fourier_projection(coff[0][..., None], w_coff)
            e2 = gaussian_fourier_projection(coff[2][..., None], w_coff)
            return jnp.concatenate([e0, e2], axis=-1)

        embed_s = self.coff_mlp(coff_embed(coff_s))
        embed_d = self.coff_mlp(coff_embed(coff_d))
        edge_embed = jnp.concatenate(
            [pseudo_sin[..., None], pseudo_cos[..., None], embed_s, embed_d],
            axis=-1)
        frame_inv = self.project(edge_embed)

        if self.variant == 2:
            # componentwise pair distances (minor dims (N, N), not 3)
            sq = sum((pos3[..., k][:, :, None] - pos3[..., k][:, None, :]) ** 2
                     for k in range(3))
            dist = jnp.sqrt(sq + _SQRT_GUARD)[..., None]
            w_dist = jax.lax.stop_gradient(self.dist_fourier_W)
            dist_emb = gaussian_fourier_projection(dist, w_dist)
            dist_inv = self.input_mlp(dist_emb)
            edge_attr = dist_inv * edge_attr_2d + frame_inv
        else:
            edge_attr = edge_attr_2d + frame_inv
        edge_attr = edge_attr * pair_mask[..., None]

        out = self.score_network(
            cond["node_attr"], edge_attr, pair_mask, basis, deterministic)
        return out["gradient"].reshape(b * n, 3)

    def score_from_cond_fused(
        self,
        cond: Dict[str, jnp.ndarray],
        batch: GraphBatch,
        pos: jnp.ndarray,
    ) -> jnp.ndarray:
        """Position-dependent half as ONE fused Pallas kernel
        (ops/score_kernel.py): frames + Fourier features + 4 GAT layers +
        basis mixing, VMEM-resident per molecule tile.  Forward-only —
        samplers use it (they never differentiate the score); training and
        autodiff go through :meth:`score_from_cond`."""
        from moleculesde_tpu.ops.score_kernel import (
            pack_score_params, score_eval_fused)

        if self.short_cut or self.concat_hidden:
            return self.score_from_cond(cond, batch, pos, True)
        b, n = batch.num_graphs, batch.n_max
        kvariant = 2 if self.variant == 2 else 1
        packed = pack_score_params(self.variables["params"], kvariant)
        out = score_eval_fused(
            pos.reshape(b, n, 3), cond["node_attr"],
            cond["edge_attr_2d"].astype(jnp.float32), cond["pair_mask"],
            packed, variant=kvariant,
            bf16=(self.score_dtype == "bfloat16"),
            interpret=(jax.default_backend() != "tpu"))
        return out.reshape(b * n, 3)

    def _score_output(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        pos: jnp.ndarray,
        deterministic: bool,
        use_running_average: bool,
    ) -> jnp.ndarray:
        """Shared feature pipeline + score network -> raw gradient [N_nodes, 3]."""
        cond = self.precompute_conditioning(
            node_2d_repr, batch, use_running_average)
        return self.score_from_cond(cond, batch, pos, deterministic)

    def __call__(self, node_2d_repr, batch, key, anneal_power=0.0,
                 deterministic=False, use_running_average=False):
        return self.loss(node_2d_repr, batch, key, anneal_power,
                         deterministic, use_running_average)

    def loss(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        key: jax.Array,
        anneal_power: float = 0.0,
        deterministic: bool = False,
        use_running_average: bool = False,
    ):
        """Denoising score-matching loss (ref SDE_model_2D_to_3D.py:306-391)."""
        sde = self.sde_pos
        n_steps = self.num_diffusion_timesteps
        pos = batch.positions
        node2graph = batch.node2graph()
        b = batch.num_graphs

        k_noise, k_t = jax.random.split(key)
        pos_noise = jax.random.normal(k_noise, pos.shape)

        # antithetic discrete timesteps (ref l.321-322)
        half = jax.random.randint(k_t, (b // 2 + 1,), 0, n_steps)
        time_step = jnp.concatenate([half, n_steps - half - 1])[:b]
        time_step = time_step / n_steps * (1 - EPSILON) + EPSILON
        t_pos = time_step[node2graph]

        mean_pos, std_pos = sde.marginal_prob(pos, t_pos)
        pos_perturbed = mean_pos + std_pos[:, None] * pos_noise

        scores = self._score_output(
            node_2d_repr, batch, pos_perturbed, deterministic, use_running_average)

        if anneal_power == 0.0:
            loss_pos = jnp.sum((scores - pos_noise) ** 2, axis=-1)
        else:
            loss_pos = jnp.sum(
                (scores - pos_noise) ** 2 * (std_pos ** anneal_power)[:, None], axis=-1)
        loss_pos = masked_segment_mean(loss_pos, node2graph, b, batch.node_mask)
        return {"position": loss_pos.mean()}

    def get_score(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        pos_perturbed: jnp.ndarray,
        t_pos: jnp.ndarray,
    ) -> jnp.ndarray:
        """Score for reverse-SDE sampling: -net(x_t)/std(t)
        (ref SDE_model_2D_to_3D.py:393-445).  Eval mode (no dropout, running
        BN statistics)."""
        out = self._score_output(
            node_2d_repr, batch, pos_perturbed,
            deterministic=True, use_running_average=True)
        _, std_pos = self.sde_pos.marginal_prob(pos_perturbed, t_pos)
        return -out / std_pos[:, None]
