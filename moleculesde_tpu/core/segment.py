"""Masked segment operations — the TPU-native replacement for torch_scatter.

The reference relies on torch_scatter's ``scatter``/``scatter_add``/
``scatter_mean`` CUDA kernels (e.g. reference Geom3D/models/schnet.py:115,
Geom3D/models/MoleculeSDE/SDE_model_2D_to_3D.py:195).  On TPU, padded batches
make segment ids sorted by construction, so these lower to efficient XLA
one-hot matmuls / vectorized scatters.  Every op takes an explicit validity
mask so padded nodes/edges contribute exactly zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _apply_mask(data: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, jnp.zeros_like(data))


def masked_segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Sum of ``data`` rows per segment, with masked rows contributing zero."""
    return jax.ops.segment_sum(
        _apply_mask(data, mask),
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def masked_segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Mean of ``data`` rows per segment over *valid* rows only.

    Matches torch_scatter ``scatter_mean`` on unpadded data (reference
    SDE_model_2D_to_3D.py:195 uses it for per-graph loss averaging).
    """
    total = masked_segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    if mask is None:
        ones = jnp.ones(segment_ids.shape, dtype=data.dtype)
    else:
        ones = mask.astype(data.dtype)
    count = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - count.ndim))


def masked_segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
    initial: float = -jnp.inf,
) -> jnp.ndarray:
    """Per-segment max over valid rows; empty segments return ``initial``."""
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m, data, jnp.full_like(data, initial))
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def edge_aggregate(
    msg: jnp.ndarray,
    edge_dst: jnp.ndarray,
    num_graphs: int,
    n_max: int,
    edge_mask: Optional[jnp.ndarray] = None,
    reduce: str = "sum",
) -> jnp.ndarray:
    """Edge->node aggregation as a per-graph one-hot matmul.

    Device traces (round 3, honest profile) showed XLA lowering
    ``segment_sum`` over the edge arrays to serialized scatter-adds —
    ~0.45 ms each on v5e at B=256 (4.5 ms/step across the 2D GNN's
    forward+backward).  The padded layout makes the scatter a batched
    matmul instead: edges of graph ``b`` live in slot ``b`` (established by
    every collator), so with per-graph one-hot destination masks

        agg[b, n, f] = sum_e onehot[b, e, n] * msg[b, e, f]

    runs on the MXU in ~µs, and its transpose (the backward) is a gather-
    free matmul too.  ``reduce``: "sum" or "mean" (mean counts valid edges
    per destination, torch_scatter semantics).

    ``msg``: [B*e_max, F]; ``edge_dst``: [B*e_max] flat global indices.
    Returns [B*n_max, F].
    """
    e_total = msg.shape[0]
    e_max = e_total // num_graphs
    f = msg.shape[-1]
    local = (edge_dst % n_max).reshape(num_graphs, e_max)
    if edge_mask is not None:
        local = jnp.where(edge_mask.reshape(num_graphs, e_max), local, n_max)
    onehot = (local[:, :, None] == jnp.arange(n_max)).astype(msg.dtype)
    msg3 = msg.reshape(num_graphs, e_max, f)
    agg = jnp.einsum("ben,bef->bnf", onehot, msg3)
    if reduce == "mean":
        count = jnp.maximum(onehot.sum(axis=1), 1.0)  # [B, n]
        agg = agg / count[..., None]
    return agg.reshape(num_graphs * n_max, f)


def edge_gather(
    x: jnp.ndarray,
    edge_idx: jnp.ndarray,
    num_graphs: int,
    n_max: int,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-edge node gather ``x[edge_idx]`` as a one-hot matmul.

    The plain gather's BACKWARD is a scatter-add into ``[B*n_max, F]`` —
    0.46 ms each on v5e at B=256 (r3 honest trace: the 2D GNN's five
    backward scatters cost 2.3 ms/step).  The matmul form transposes to a
    matmul.  Masked edges return zero rows.  ``x``: [B*n_max, F];
    ``edge_idx``: [B*e_max] flat global indices (slot-structured).
    """
    e_max = edge_idx.shape[0] // num_graphs
    f = x.shape[-1]
    local = (edge_idx % n_max).reshape(num_graphs, e_max)
    if edge_mask is not None:
        local = jnp.where(edge_mask.reshape(num_graphs, e_max), local, n_max)
    onehot = (local[:, :, None] == jnp.arange(n_max)).astype(x.dtype)
    x3 = x.reshape(num_graphs, n_max, f)
    return jnp.einsum("ben,bnf->bef", onehot, x3).reshape(
        num_graphs * e_max, f)


def node_degree(
    edge_index: jnp.ndarray,
    num_graphs: int,
    n_max: int,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Valid-edge count per node (flat [B*n_max]) without a scatter."""
    e_max = edge_index.shape[0] // num_graphs
    local = (edge_index % n_max).reshape(num_graphs, e_max)
    if edge_mask is not None:
        local = jnp.where(edge_mask.reshape(num_graphs, e_max), local, n_max)
    onehot = (local[:, :, None] == jnp.arange(n_max))
    return onehot.sum(axis=1).reshape(num_graphs * n_max).astype(jnp.float32)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Numerically-stable softmax over rows sharing a segment id.

    The TPU equivalent of PyG's per-destination-node ``softmax`` used inside
    TransformerConv attention (reference equivariant_scorenetwork.py:18-24).
    Masked rows get probability 0; fully-masked segments yield all-zero rows.
    """
    seg_max = masked_segment_max(logits, segment_ids, num_segments, mask)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    exp = _apply_mask(exp, mask)
    denom = jax.ops.segment_sum(
        exp, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
