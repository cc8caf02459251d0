"""Conformer-quality evaluation: Kabsch-aligned RMSD and COV/MAT metrics.

The rebuild's north star includes "2D->3D sampled conformers matching
reference RMSD distributions" (BASELINE.json).  The reference repo ships no
evaluation script (its inference scripts only pickle samples); these are the
standard conformer-generation metrics (GEOM-style coverage/matching) over
Kabsch-aligned heavy-atom RMSD, implemented in jax so they can run on-device
over batched samples.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kabsch_align(p: jnp.ndarray, q: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Optimal-rotation RMSD between point sets ``p`` and ``q`` [N, 3].

    Centers both sets (over valid atoms), solves the Kabsch problem via SVD
    with the proper-rotation determinant correction, returns scalar RMSD.
    """
    if mask is None:
        mask = jnp.ones(p.shape[0], dtype=bool)
    w = mask.astype(p.dtype)[:, None]
    count = jnp.maximum(w.sum(), 1.0)
    p = (p - (p * w).sum(0) / count) * w
    q = (q - (q * w).sum(0) / count) * w

    h = p.T @ q
    u, s, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    diag = jnp.diag(jnp.array([1.0, 1.0, 0.0])) + jnp.diag(jnp.array([0.0, 0.0, 1.0])) * d
    r = vt.T @ diag @ u.T
    p_rot = p @ r.T
    return jnp.sqrt(jnp.sum(((p_rot - q) ** 2) * w) / count + 1e-12)


def pairwise_rmsd(gen: jnp.ndarray, ref: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """RMSD matrix [n_gen, n_ref] between two conformer sets [*, N, 3]."""
    def one(g):
        return jax.vmap(lambda r: kabsch_align(g, r, mask))(ref)

    return jax.vmap(one)(gen)


def coverage_matching(
    gen: np.ndarray, ref: np.ndarray, mask: Optional[np.ndarray] = None,
    threshold: float = 0.5,
) -> Tuple[float, float]:
    """COV (fraction of reference conformers within ``threshold`` of some
    generated one) and MAT (mean over references of the min RMSD)."""
    d = np.asarray(pairwise_rmsd(jnp.asarray(gen), jnp.asarray(ref),
                                 None if mask is None else jnp.asarray(mask)))
    min_over_gen = d.min(axis=0)  # per reference conformer
    cov = float((min_over_gen < threshold).mean())
    mat = float(min_over_gen.mean())
    return cov, mat
