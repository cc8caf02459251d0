"""2D molecular-graph encoders: GIN / GCN / GAT / GraphSAGE over padded batches.

TPU-first re-design of the reference's PyG encoder family (reference
Geom3D/models/molecule_gnn_model.py).  Message passing is expressed as
masked gathers + sorted ``segment_sum`` over statically-shaped edge arrays;
BatchNorm uses masked statistics so padded nodes never contaminate the
running moments (SURVEY.md hard-part 2).

Reference semantics preserved:
- OGB Atom/BondEncoder = sum of per-feature embedding tables
  (ogb.graphproppred.mol_encoder; used at molecule_gnn_model.py:10, 20).
- GINConv: ``mlp((1 + eps) * x + sum_j relu(x_j + bond_emb))``
  (molecule_gnn_model.py:13-32).
- GNN: per-layer conv -> BN -> ReLU (except last) -> dropout, JK in
  {last, concat, max, sum} (molecule_gnn_model.py:132-197).
- GNN_graphpred: sum/mean/max pooling + linear head
  (molecule_gnn_model.py:200-281).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS, GraphBatch
from moleculesde_tpu.core.segment import (
    masked_segment_max,
    masked_segment_mean,
    masked_segment_sum,
    segment_softmax,
)
from moleculesde_tpu.models.layers import MaskedBatchNorm, xavier_uniform, zeros_init


class AtomEncoder(nn.Module):
    """Sum of embeddings of the 9 OGB categorical atom features."""

    emb_dim: int

    @nn.compact
    def __call__(self, atom_feats: jnp.ndarray) -> jnp.ndarray:
        out = 0.0
        for i, dim in enumerate(ATOM_FEATURE_DIMS):
            emb = nn.Embed(dim, self.emb_dim, embedding_init=xavier_uniform,
                           name=f"atom_embedding_{i}")
            out = out + emb(jnp.clip(atom_feats[:, i], 0, dim - 1))
        return out


class BondEncoder(nn.Module):
    """Sum of embeddings of the 3 OGB categorical bond features."""

    emb_dim: int

    @nn.compact
    def __call__(self, edge_feats: jnp.ndarray) -> jnp.ndarray:
        out = 0.0
        for i, dim in enumerate(BOND_FEATURE_DIMS):
            emb = nn.Embed(dim, self.emb_dim, embedding_init=xavier_uniform,
                           name=f"bond_embedding_{i}")
            out = out + emb(jnp.clip(edge_feats[:, i], 0, dim - 1))
        return out


class GINConv(nn.Module):
    """GIN convolution with bond features (ref molecule_gnn_model.py:13-32)."""

    emb_dim: int

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_feats, node_mask, edge_mask,
                 use_running_average: bool = False):
        num_nodes = x.shape[0]
        edge_emb = BondEncoder(self.emb_dim)(edge_feats)
        msg = nn.relu(x[edge_src] + edge_emb)
        agg = masked_segment_sum(msg, edge_dst, num_nodes, edge_mask,
                                 indices_are_sorted=False)
        eps = self.param("eps", zeros_init, (1,))
        h = (1.0 + eps) * x + agg
        h = nn.Dense(2 * self.emb_dim, kernel_init=xavier_uniform)(h)
        h = MaskedBatchNorm()(h, node_mask, use_running_average)
        h = nn.relu(h)
        h = nn.Dense(self.emb_dim, kernel_init=xavier_uniform)(h)
        return h


class GCNConv(nn.Module):
    """GCN convolution (ref molecule_gnn_model.py:35-62)."""

    emb_dim: int

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_feats, node_mask, edge_mask,
                 use_running_average: bool = False):
        num_nodes = x.shape[0]
        x = nn.Dense(self.emb_dim, kernel_init=xavier_uniform)(x)
        edge_emb = BondEncoder(self.emb_dim)(edge_feats)
        deg = masked_segment_sum(
            jnp.ones_like(edge_src, dtype=x.dtype), edge_src, num_nodes, edge_mask,
            indices_are_sorted=False) + 1.0
        dinv = deg ** -0.5
        norm = dinv[edge_src] * dinv[edge_dst]
        msg = norm[:, None] * nn.relu(x[edge_src] + edge_emb)
        agg = masked_segment_sum(msg, edge_dst, num_nodes, edge_mask,
                                 indices_are_sorted=False)
        root_emb = self.param("root_emb", xavier_uniform, (1, self.emb_dim))
        return agg + nn.relu(x + root_emb) / deg[:, None]


class GATConv(nn.Module):
    """GAT convolution (ref molecule_gnn_model.py:65-106)."""

    emb_dim: int
    heads: int = 2
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_feats, node_mask, edge_mask,
                 use_running_average: bool = False):
        num_nodes = x.shape[0]
        h = nn.Dense(self.heads * self.emb_dim, kernel_init=xavier_uniform)(x)
        edge_emb = BondEncoder(self.heads * self.emb_dim)(edge_feats)
        att = self.param("att", xavier_uniform, (1, self.heads, 2 * self.emb_dim))
        x_i = h[edge_dst].reshape(-1, self.heads, self.emb_dim)
        x_j = h[edge_src].reshape(-1, self.heads, self.emb_dim)
        x_j = x_j + edge_emb.reshape(-1, self.heads, self.emb_dim)
        alpha = (jnp.concatenate([x_i, x_j], axis=-1) * att).sum(-1)
        alpha = nn.leaky_relu(alpha, self.negative_slope)
        # reference groups the softmax by edge_index[0] (the source index);
        # preserved verbatim (molecule_gnn_model.py:99).
        alpha = segment_softmax(alpha, edge_src, num_nodes, edge_mask,
                                indices_are_sorted=False)
        msg = x_j * alpha[:, :, None]
        agg = masked_segment_sum(msg, edge_dst, num_nodes, edge_mask,
                                 indices_are_sorted=False)
        bias = self.param("bias", zeros_init, (self.emb_dim,))
        return agg.mean(axis=1) + bias


class GraphSAGEConv(nn.Module):
    """GraphSAGE convolution (ref molecule_gnn_model.py:109-129)."""

    emb_dim: int

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_feats, node_mask, edge_mask,
                 use_running_average: bool = False):
        num_nodes = x.shape[0]
        h = nn.Dense(self.emb_dim, kernel_init=xavier_uniform)(x)
        h = MaskedBatchNorm()(h, node_mask, use_running_average)
        h = nn.relu(h)
        h = nn.Dense(self.emb_dim, kernel_init=xavier_uniform)(h)
        edge_emb = BondEncoder(self.emb_dim)(edge_feats)
        msg = h[edge_src] + edge_emb
        agg = masked_segment_mean(msg, edge_dst, num_nodes, edge_mask,
                                  indices_are_sorted=False)
        denom = jnp.sqrt(jnp.sum(agg ** 2, axis=-1, keepdims=True) + 1e-24)
        return agg / jnp.maximum(denom, 1e-12)


_CONVS = {"GIN": GINConv, "GCN": GCNConv, "GAT": GATConv, "GraphSAGE": GraphSAGEConv}


class GNN2D(nn.Module):
    """Stacked 2D GNN with JK aggregation (ref molecule_gnn_model.py:132-197)."""

    num_layers: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "GIN"

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        deterministic: bool = True,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        if self.num_layers < 2:
            raise ValueError("Number of GNN layers must be greater than 1.")
        conv_cls = _CONVS[self.gnn_type]
        x = AtomEncoder(self.emb_dim)(batch.atom_feats)
        h_list = [x]
        for layer in range(self.num_layers):
            h = conv_cls(self.emb_dim)(
                h_list[layer], batch.edge_src, batch.edge_dst, batch.edge_feats,
                batch.node_mask, batch.edge_mask, use_running_average)
            h = MaskedBatchNorm()(h, batch.node_mask, use_running_average)
            if layer < self.num_layers - 1:
                h = nn.relu(h)
            h = nn.Dropout(self.drop_ratio)(h, deterministic=deterministic)
            h_list.append(h)

        if self.jk == "concat":
            rep = jnp.concatenate(h_list, axis=1)
        elif self.jk == "last":
            rep = h_list[-1]
        elif self.jk == "max":
            rep = jnp.max(jnp.stack(h_list), axis=0)
        elif self.jk == "sum":
            rep = jnp.sum(jnp.stack(h_list), axis=0)
        else:
            raise ValueError(f"unknown JK mode {self.jk}")
        # keep padded rows exactly zero so downstream pooling is mask-free-safe
        return rep * batch.node_mask[:, None]


def graph_pool(
    node_rep: jnp.ndarray, batch: GraphBatch, pooling: str = "mean"
) -> jnp.ndarray:
    """Masked graph pooling (sum/mean/max), ref molecule_gnn_model.py:215-222."""
    seg = batch.node2graph()
    if pooling == "sum":
        return masked_segment_sum(node_rep, seg, batch.num_graphs, batch.node_mask)
    if pooling == "mean":
        return masked_segment_mean(node_rep, seg, batch.num_graphs, batch.node_mask)
    if pooling == "max":
        out = masked_segment_max(node_rep, seg, batch.num_graphs, batch.node_mask)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(f"Invalid graph pooling type {pooling}.")


class GNNGraphPred(nn.Module):
    """2D GNN + pooling + linear prediction head (ref molecule_gnn_model.py:200-281)."""

    num_tasks: int
    num_layers: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "GIN"
    graph_pooling: str = "mean"

    def setup(self):
        self.gnn = GNN2D(
            num_layers=self.num_layers, emb_dim=self.emb_dim, jk=self.jk,
            drop_ratio=self.drop_ratio, gnn_type=self.gnn_type)
        self.graph_pred_linear = nn.Dense(self.num_tasks)

    def __call__(self, batch: GraphBatch, deterministic: bool = True,
                 use_running_average: bool = False) -> jnp.ndarray:
        node_rep = self.gnn(batch, deterministic, use_running_average)
        graph_rep = graph_pool(node_rep, batch, self.graph_pooling)
        return self.graph_pred_linear(graph_rep)
