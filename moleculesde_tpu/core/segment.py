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
