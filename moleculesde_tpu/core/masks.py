"""Dense masking helpers shared by the 3D->2D diffusion path.

Functional re-implementations of the reference's masking utilities
(reference Geom3D/models/MoleculeSDE/SDE_model_3D_to_2D_node_adj_dense.py:523-562
and invariant_scorenetwork_dense.py:5-25).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def node_flags(adj: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-node 0/1 flags from a dense adjacency ``[B, N, N]`` (or ``[B, C, N, N]``).

    A node is "on" iff its adjacency row has any mass — matching the
    reference's semantics exactly (reference
    SDE_model_3D_to_2D_node_adj_dense.py:523-529), including the quirk that
    isolated atoms are flagged off.
    """
    flags = (jnp.abs(adj).sum(-1) > eps).astype(jnp.float32)
    if flags.ndim == 3:
        flags = flags[:, 0, :]
    return flags


def mask_x(x: jnp.ndarray, flags: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero out padded node rows of ``[B, N, F]`` features (ref l.559-562)."""
    if flags is None:
        return x
    return x * flags[:, :, None]


def mask_adjs(adjs: jnp.ndarray, flags: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero out padded rows+cols of ``[B, N, N]`` or ``[B, C, N, N]`` (ref l.543-556)."""
    if flags is None:
        return adjs
    f = flags
    if adjs.ndim == 4:
        f = flags[:, None, :]
    return adjs * f[..., :, None] * f[..., None, :]
