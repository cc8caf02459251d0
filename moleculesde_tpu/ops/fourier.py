"""Distance / noise-level embedding primitives.

Pure-function equivalents of the reference's small embedding modules:
GaussianFourierProjection (reference SDE_model_2D_to_3D.py:57-66),
GaussianSmearing (reference schnet.py:198-207), GaussianRBF + CosineCutoff
(reference painn_utils.py:99-177) and ShiftedSoftplus (schnet.py:210-216).
All elementwise — XLA fuses them into surrounding matmuls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * math.pi


@jax.custom_vjp
def gaussian_fourier_projection(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[sin(2*pi*w*x), cos(2*pi*w*x)] noise-level features.

    ``x``: [..., 1]; ``w``: [C] fixed (non-trainable) Gaussian weights.
    Output [..., 2C]. Matches reference SDE_model_2D_to_3D.py:64-66.

    Custom VJP: d sin(ax)/dx = a cos(ax) and d cos(ax)/dx = -a sin(ax) are
    linear in the PRIMAL outputs, so the backward pass is pure multiply-adds
    over the saved (sin, cos) — no transcendental recompute.  The score
    models evaluate this on [B, N, N, *] pair tensors (5 call sites per
    forward); the default VJP would re-evaluate ~84M sin/cos per backward at
    the flagship batch.
    """
    proj = x * w * _TWO_PI
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def _gfp_fwd(x, w):
    proj = x * w * _TWO_PI
    s, c = jnp.sin(proj), jnp.cos(proj)
    return jnp.concatenate([s, c], axis=-1), (s, c, x, w)


def _gfp_bwd(res, g):
    s, c, x, w = res
    n = s.shape[-1]
    common = (g[..., :n] * c - g[..., n:] * s) * _TWO_PI
    gx = jnp.sum(common * w, axis=-1, keepdims=True).astype(x.dtype)
    gw = jnp.sum(common * x, axis=tuple(range(common.ndim - 1))).astype(w.dtype)
    return gx, gw


gaussian_fourier_projection.defvjp(_gfp_fwd, _gfp_bwd)


@jax.custom_vjp
def gaussian_fourier_projection_cm(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Channel-major GFP: scalar plane ``x`` [B, P] -> [B, 2C, P].

    Same math as :func:`gaussian_fourier_projection` with the Fourier
    channels on axis 1 instead of the minor axis.  On TPU a [B, P, 2C]
    pair tensor with 2C=64 is lane-padded 2x (and every downstream H=32
    tensor 4x); channel-major keeps the large pair axis P = N*N minor, so
    nothing pads.  Used by the channel-major 2D->3D score path
    (models/score_2d3d.py::SDEModel2Dto3D.score_from_cond_cm)."""
    proj = x[:, None, :] * w[None, :, None] * _TWO_PI
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=1)


def _gfp_cm_fwd(x, w):
    proj = x[:, None, :] * w[None, :, None] * _TWO_PI
    s, c = jnp.sin(proj), jnp.cos(proj)
    return jnp.concatenate([s, c], axis=1), (s, c, x, w)


def _gfp_cm_bwd(res, g):
    s, c, x, w = res
    n = s.shape[1]
    common = (g[:, :n] * c - g[:, n:] * s) * _TWO_PI  # [B, C, P]
    gx = jnp.einsum("bcp,c->bp", common, w).astype(x.dtype)
    gw = jnp.einsum("bcp,bp->c", common, x).astype(w.dtype)
    return gx, gw


gaussian_fourier_projection_cm.defvjp(_gfp_cm_fwd, _gfp_cm_bwd)


def gaussian_smearing(
    dist: jnp.ndarray, start: float, stop: float, num_gaussians: int
) -> jnp.ndarray:
    """SchNet's equally-spaced Gaussian distance expansion (ref schnet.py:198-207).

    ``dist``: [...] distances -> output [..., num_gaussians].
    """
    offset = jnp.linspace(start, stop, num_gaussians)
    coeff = -0.5 / float((stop - start) / (num_gaussians - 1)) ** 2
    diff = dist[..., None] - offset
    return jnp.exp(coeff * diff ** 2)


def gaussian_rbf(
    dist: jnp.ndarray, n_rbf: int, cutoff: float, start: float = 0.0
) -> jnp.ndarray:
    """PaiNN's Gaussian radial basis (ref painn_utils.py:99-136)."""
    offsets = jnp.linspace(start, cutoff, n_rbf)
    width = abs((cutoff - start) / (n_rbf - 1))
    coeff = -0.5 / width ** 2
    diff = dist[..., None] - offsets
    return jnp.exp(coeff * diff ** 2)


def cosine_cutoff(dist: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Behler-style cosine cutoff envelope (ref painn_utils.py:139-155)."""
    val = 0.5 * (jnp.cos(dist * math.pi / cutoff) + 1.0)
    return val * (dist < cutoff).astype(val.dtype)


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x) - log(2) (ref schnet.py:210-216)."""
    return jnp.logaddexp(x, 0.0) - math.log(2.0)
