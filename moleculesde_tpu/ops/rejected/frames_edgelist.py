"""Edge-list per-edge SE(3)-equivariant frames — NON-PRODUCTION reference spec.

Superseded by the dense masked-pair formulation
(``moleculesde_tpu.models.score_2d3d.dense_frames``), which production uses;
this module is retained as the readable spec and the property-test oracle
(tests/test_ops.py) for frame equivariance/reflection semantics.

Re-implementation of the reference's frame construction (reference
Geom3D/models/MoleculeSDE/SDE_model_2D_to_3D.py:35-47 ``coord2basis`` and the
coefficient/pseudo-angle feature block repeated in every SDEModel2Dto3D
variant, e.g. l.162-178).  The frame per edge (i, j) is:

  e1 = (r_i - r_j) / ||r_i - r_j||        (equivariant direction)
  e2 = (r_i x r_j) / ||r_i x r_j||        (equivariant, flips under reflection)
  e3 = e1 x e2                            (equivariant)

Projecting the endpoints onto (e1, e2, e3) gives invariant coefficients; the
|.| on the e2-coefficient implements reflection anti-symmetry (ref l.168-169).

TPU notes: all ops are fused elementwise on [E, 3] arrays; padded edges have
both endpoints at the origin, which the EPSILON guards map to exact zeros, so
no NaNs leak through jit.  ``sqrt(1 - cos^2)`` is clamped at 1e-12 (the
reference's unclamped sqrt has an unstable gradient at cos = +-1).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from moleculesde_tpu.ops.common import EPSILON, safe_norm as _safe_norm


def coord2basis(
    pos: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-edge orthogonal-ish frame (ref SDE_model_2D_to_3D.py:35-47).

    ``pos``: [N, 3]; ``row``/``col``: [E] endpoint indices.
    Returns (coord_diff, coord_cross, coord_vertical), each [E, 3].
    """
    p_i = pos[row]
    p_j = pos[col]
    coord_diff = p_i - p_j
    coord_cross = jnp.cross(p_i, p_j)

    norm = _safe_norm(coord_diff) + EPSILON
    coord_diff = coord_diff / norm
    cross_norm = _safe_norm(coord_cross) + EPSILON
    coord_cross = coord_cross / cross_norm

    coord_vertical = jnp.cross(coord_diff, coord_cross)
    return coord_diff, coord_cross, coord_vertical


def frame_features(
    pos: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frame basis + invariant coefficient features for the 2D->3D score nets.

    Returns:
      basis: (coord_diff, coord_cross, coord_vertical) each [E, 3]
      coff_i, coff_j: [E, 3] frame coefficients of the endpoints, with the
        cross-coefficient folded to |.| (reflection anti-symmetry,
        ref SDE_model_2D_to_3D.py:166-169)
      pseudo_angle: [E, 2] = [sin, cos] of the pseudo angle between the
        coefficient vectors (ref l.170-175)
    """
    coord_diff, coord_cross, coord_vertical = coord2basis(pos, row, col)
    edge_basis = jnp.stack([coord_diff, coord_cross, coord_vertical], axis=1)  # [E,3,3]
    r_i = pos[row]
    r_j = pos[col]
    coff_i = jnp.einsum("ebc,ec->eb", edge_basis, r_i)
    coff_j = jnp.einsum("ebc,ec->eb", edge_basis, r_j)
    # reflection anti-symmetry: |y| on the cross-axis coefficient
    coff_i = coff_i.at[:, 1].set(jnp.abs(coff_i[:, 1]))
    coff_j = coff_j.at[:, 1].set(jnp.abs(coff_j[:, 1]))

    coff_mul = coff_i * coff_j
    coff_i_norm = _safe_norm(coff_i)
    coff_j_norm = _safe_norm(coff_j)
    pseudo_cos = coff_mul.sum(-1, keepdims=True) / (coff_i_norm + EPSILON) / (coff_j_norm + EPSILON)
    pseudo_sin = jnp.sqrt(jnp.clip(1.0 - pseudo_cos ** 2, 1e-12))
    pseudo_angle = jnp.concatenate([pseudo_sin, pseudo_cos], axis=-1)
    return (coord_diff, coord_cross, coord_vertical), coff_i, coff_j, pseudo_angle


def perturb_distance(pos: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Per-edge distances [E, 1] (ref SDE_model_2D_to_3D.py:50-54)."""
    return _safe_norm(pos[row] - pos[col])
