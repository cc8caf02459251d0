"""Shared numeric guards for frame/score math.

``EPSILON`` matches the reference's frame-normalization guard
(Geom3D/models/MoleculeSDE/SDE_model_2D_to_3D.py:32, ``EPSILON = 1e-6``).
``safe_norm`` adds a tiny value inside the sqrt so padded (all-zero) rows
have finite gradients under ``jax.grad`` (d/dx sqrt(x) -> inf at 0).
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-6
# Changes values by < 1e-12, i.e. far below EPSILON.
SQRT_GUARD = 1e-24


def safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = True) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(x ** 2, axis=axis, keepdims=keepdims) + SQRT_GUARD)
