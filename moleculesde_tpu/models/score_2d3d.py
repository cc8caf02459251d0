"""2D->3D frame-based SE(3)-equivariant score models.

Re-design of the reference's four score-model variants (reference
Geom3D/models/MoleculeSDE/SDE_model_2D_to_3D.py: SDEModel2Dto3D_01..04) and
the shared EquivariantScoreNetwork (equivariant_scorenetwork.py) for padded
TPU batches.  The architecture is identical — invariant scalar features
(2D-embedding x distance-Fourier x frame-coefficient embeddings) drive a
transformer-GNN whose per-edge MLP emits 3 dynamic coefficients that linearly
mix the equivariant frame basis; an edge->node mean aggregation yields the
per-node 3-vector score.

Message passing uses masked gathers + sorted segment ops over the statically
shaped extended-edge arrays instead of PyG's ragged MessagePassing, so the
whole loss (antithetic time sampling -> marginal perturbation -> frame
construction -> score -> masked per-graph mean) is one XLA program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.core.segment import (
    masked_segment_mean,
    masked_segment_sum,
    segment_softmax,
)
from moleculesde_tpu.models.layers import MLP, MaskedBatchNorm, xavier_uniform, zeros_init
from moleculesde_tpu.ops.fourier import gaussian_fourier_projection
from moleculesde_tpu.ops.frames import EPSILON, frame_features, perturb_distance
from moleculesde_tpu.sde import SDE, make_sde


class TransformerConv(nn.Module):
    """Graph transformer convolution matching PyG's TransformerConv defaults
    (used by the reference GATLayer, equivariant_scorenetwork.py:18-24):
    attention grouped by destination node, edge features added to keys and
    values, sum aggregation, root skip via a separate linear."""

    out_channels: int  # per head
    heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_mask,
                 deterministic: bool = True):
        h, c = self.heads, self.out_channels
        num_nodes = x.shape[0]
        query = nn.Dense(h * c, kernel_init=xavier_uniform)(x)
        key = nn.Dense(h * c, kernel_init=xavier_uniform)(x)
        value = nn.Dense(h * c, kernel_init=xavier_uniform)(x)
        e = nn.Dense(h * c, kernel_init=xavier_uniform)(edge_attr).reshape(-1, h, c)

        q_i = query[edge_dst].reshape(-1, h, c)
        k_j = key[edge_src].reshape(-1, h, c) + e
        v_j = value[edge_src].reshape(-1, h, c) + e

        alpha = (q_i * k_j).sum(-1) / jnp.sqrt(float(c))  # [E, H]
        alpha = segment_softmax(alpha, edge_dst, num_nodes, edge_mask)
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)

        out = masked_segment_sum(v_j * alpha[..., None], edge_dst, num_nodes, edge_mask)
        out = out.reshape(num_nodes, h * c)
        out = out + nn.Dense(h * c, kernel_init=xavier_uniform)(x)  # root skip
        return out


class GATLayer(nn.Module):
    """Transformer conv + FFN with post-norm residuals (ref
    equivariant_scorenetwork.py:13-40)."""

    hidden_dim: int
    n_head: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_mask,
                 deterministic: bool = True):
        assert self.hidden_dim % self.n_head == 0
        mha = TransformerConv(self.hidden_dim // self.n_head, self.n_head, self.dropout)(
            x, edge_src, edge_dst, edge_attr, edge_mask, deterministic)
        x = x + nn.LayerNorm()(mha)
        ffn = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform)(x)
        ffn = nn.silu(ffn)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        ffn = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform)(ffn)
        x = x + nn.LayerNorm()(ffn)
        return x


class EquivariantScoreNetwork(nn.Module):
    """Stacked GAT modules emitting a per-node equivariant 3-vector score
    (ref equivariant_scorenetwork.py:84-169)."""

    hidden_dim: int
    hidden_coff_dim: int = 128
    num_layers: int = 2
    num_convs: int = 2
    n_head: int = 8
    dropout: float = 0.1
    short_cut: bool = False
    concat_hidden: bool = False

    @nn.compact
    def __call__(self, edge_src, edge_dst, node_attr, edge_attr, edge_mask,
                 equivariant_basis, deterministic: bool = True):
        coord_diff, coord_cross, coord_vertical = equivariant_basis
        num_nodes = node_attr.shape[0]
        hiddens = []
        conv_input = node_attr
        gradient = jnp.zeros((num_nodes, 3), dtype=node_attr.dtype)

        for module_idx in range(self.num_layers):
            for conv_idx in range(self.num_convs):
                hidden = GATLayer(self.hidden_dim, self.n_head, self.dropout)(
                    conv_input, edge_src, edge_dst, edge_attr, edge_mask, deterministic)
                if conv_idx < self.num_convs - 1:
                    hidden = nn.silu(hidden)
                if self.short_cut and hidden.shape == conv_input.shape:
                    hidden = hidden + conv_input
                hiddens.append(hidden)
                conv_input = hidden

            if self.concat_hidden:
                node_feature = jnp.concatenate(hiddens, axis=-1)
            else:
                node_feature = hiddens[-1]

            h_row = node_feature[edge_src]
            h_col = node_feature[edge_dst]
            edge_feature = jnp.concatenate([h_row + h_col, edge_attr], axis=-1)
            coff = nn.Dense(self.hidden_coff_dim, kernel_init=xavier_uniform)(edge_feature)
            coff = nn.silu(coff)
            coff = nn.Dense(3, kernel_init=xavier_uniform)(coff)
            basis_mix = (
                coff[:, :1] * coord_diff
                + coff[:, 1:2] * coord_cross
                + coff[:, 2:3] * coord_vertical
            )
            # EquiLayer(aggr="mean", activation=False): message = edge vector,
            # mean over incoming edges at the destination (ref l.43-81, 162-164)
            gradient = gradient + masked_segment_mean(
                basis_mix, edge_dst, num_nodes, edge_mask)

        return {"node_feature": node_feature, "gradient": gradient}


class SDEModel2Dto3D(nn.Module):
    """Unified implementation of the reference's SDEModel2Dto3D_01..04.

    ``variant`` selects the edge-feature recipe (ref SDE_model_2D_to_3D.py):
      1: edge_attr = edge_2D_emb + frame_invariant                  (l.69-249)
      2: ... + perturbed-distance Fourier gate:
         edge_attr = dist_inv * edge_2D_emb + frame_invariant       (l.252-445)
      3: linear edge_2D_emb + bond-type embedding on ext_attr       (l.448-632)
      4: like 3 with [h_i * h_j, h_i + h_j] pair features           (l.635-819)
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

    @property
    def sde_pos(self) -> SDE:
        return make_sde(self.sde_type, self.beta_min, self.beta_max,
                        self.num_diffusion_timesteps)

    def _edges(self, batch: GraphBatch):
        if self.use_extend_graph:
            return batch.ext_src, batch.ext_dst, batch.ext_mask, batch.ext_attr
        # bond-type scalar (+1, ref SDE_model_3D_to_2D... convention) stands in
        # for extended_edge_attr when the extension is disabled
        return batch.edge_src, batch.edge_dst, batch.edge_mask, batch.edge_feats[:, 0] + 1

    @nn.compact
    def _score_output(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        pos: jnp.ndarray,
        deterministic: bool,
        use_running_average: bool,
    ) -> jnp.ndarray:
        """Shared feature pipeline + score network -> raw gradient [N, 3]."""
        h = self.hidden_dim
        row, col, emask, eattr = self._edges(batch)

        # --- 2D edge embedding -------------------------------------------------
        if self.variant in (1, 2):
            pair = jnp.concatenate([node_2d_repr[row], node_2d_repr[col]], axis=-1)
            x = nn.Dense(self.emb_dim, kernel_init=xavier_uniform, name="edge_2D_emb_0")(pair)
            x = MaskedBatchNorm(name="edge_2D_emb_bn")(x, emask, use_running_average)
            x = nn.relu(x)
            edge_attr_2d = nn.Dense(h, kernel_init=xavier_uniform, name="edge_2D_emb_1")(x)
        else:
            if self.variant == 3:
                pair = jnp.concatenate([node_2d_repr[row], node_2d_repr[col]], axis=-1)
            else:  # variant 4: symmetric pair features (ref l.726)
                pair = jnp.concatenate(
                    [node_2d_repr[row] * node_2d_repr[col],
                     node_2d_repr[row] + node_2d_repr[col]], axis=-1)
            edge_attr_2d = nn.Dense(h, kernel_init=xavier_uniform, name="edge_2D_emb")(pair)
            bond_emb = nn.Embed(100, h, embedding_init=xavier_uniform, name="edge_emb")(
                jnp.clip(eattr, 0, 99))
            edge_attr_2d = edge_attr_2d + bond_emb

        # --- equivariant frames + invariant coefficients -----------------------
        basis, coff_i, coff_j, pseudo_angle = frame_features(pos, row, col)

        w_coff = self.param(
            "coff_fourier_W", nn.initializers.normal(1.0), (h,))
        w_coff = jax.lax.stop_gradient(w_coff)  # non-trainable (ref GFP l.62)

        def coff_embed(coff):
            # embeds components 0 and 2 (component 1 is |.|-folded; ref l.111-118)
            e0 = gaussian_fourier_projection(coff[:, 0:1], w_coff)
            e2 = gaussian_fourier_projection(coff[:, 2:3], w_coff)
            return jnp.concatenate([e0, e2], axis=-1)

        # one shared coff_mlp applied to each endpoint's 4C features (ref l.116)
        coff_mlp = nn.Dense(h, kernel_init=xavier_uniform, name="coff_mlp")
        embed_i = coff_mlp(coff_embed(coff_i))
        embed_j = coff_mlp(coff_embed(coff_j))
        edge_embed = jnp.concatenate([pseudo_angle, embed_i, embed_j], axis=-1)
        frame_inv = MLP([h, h], activation="silu", name="project")(edge_embed)

        if self.variant == 2:
            dist = perturb_distance(pos, row, col)
            w_dist = self.param("dist_fourier_W", nn.initializers.normal(1.0), (h,))
            w_dist = jax.lax.stop_gradient(w_dist)
            dist_emb = gaussian_fourier_projection(dist, w_dist)
            dist_inv = MLP([h], activation="silu", name="input_mlp")(dist_emb)
            edge_attr = dist_inv * edge_attr_2d + frame_inv
        else:
            edge_attr = edge_attr_2d + frame_inv

        node_attr = MLP([h], activation="silu", name="node_emb")(node_2d_repr)

        out = EquivariantScoreNetwork(
            hidden_dim=h, hidden_coff_dim=128,
            short_cut=self.short_cut, concat_hidden=self.concat_hidden,
            name="score_network",
        )(row, col, node_attr, edge_attr, emask, basis, deterministic)
        return out["gradient"]

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
