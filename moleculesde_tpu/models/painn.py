"""PaiNN equivariant encoder over padded batches (dense masked pairs).

TPU-first re-design of the reference PaiNN (reference Geom3D/models/painn.py,
painn_utils.py).  The reference consumes a precomputed sparse
``radius_edge_index`` (built host-side by MoleculeDataset3DRadius,
dataset_3D_Radius.py:152-157); here the neighborhood is the same masked dense
pairwise tensor used by SchNet, so no host preprocessing is required and the
whole encoder is one statically-shaped XLA program.

Scalar channel ``q``: [B, N, F]; vector channel ``mu``: [B, N, 3, F].

Interaction (ref painn.py:14-66):
    x = Dense(act(Dense(q)))                        # [B, N, 3F]
    (dq, dmuR, dmumu)_ij = W_ij * x_j  (split F-chunks)
    q_i  += sum_j dq_ij
    mu_i += sum_j dmuR_ij * dir_ij[..., None] + dmumu_ij * mu_j

Mixing (ref painn.py:69-114): intra-atomic channel mixing with ||mu_V|| norm.

Reference quirk preserved: the atom embedding uses ``padding_idx=0``
(painn.py:174), i.e. atomic-number index 0 (hydrogen, z-1=0) is a frozen zero
embedding; we zero row 0 at lookup time.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import GraphBatch, NUM_ATOM_CLASSES
from moleculesde_tpu.models.layers import DenseParams, xavier_uniform, zeros_init
from moleculesde_tpu.models.schnet import pairwise_distances, radius_pair_mask
from moleculesde_tpu.ops.fourier import cosine_cutoff, gaussian_rbf


def _dense(feat, name=None, use_bias=True):
    return nn.Dense(feat, use_bias=use_bias, kernel_init=xavier_uniform,
                    bias_init=zeros_init, name=name)


class PaiNNInteraction(nn.Module):
    n_atom_basis: int
    # bf16 pair-filter products (params, the q/mu residual streams and the
    # mixing norms stay f32); measured r3: the f32 encoder moves ~1 GB of
    # [B, N, N, F] filter traffic per pass at batch 256, emb 300
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, mu, w, dir_ij):
        """q [B,N,F]; mu [B,N,3,F]; w [B,N,N,3F] (masked); dir_ij [B,N,N,3].

        The filter application never materializes ``m = w * x_j``
        ([B, N, N, 3F] — ~1 GB at batch 256, emb 300): each F-chunk of the
        filter contracts directly against its consumer, so only the one
        [B, N, N, F] product behind the dmuR term touches memory."""
        f = self.n_atom_basis
        dt = self.dtype or q.dtype
        x = _dense(f)(q)
        x = nn.silu(x)
        x = _dense(3 * f)(x).astype(dt)  # [B, N, 3F]
        w = w.astype(dt)
        w_q, w_r, w_m = w[..., :f], w[..., f:2 * f], w[..., 2 * f:]
        x_q, x_r, x_m = x[..., :f], x[..., f:2 * f], x[..., 2 * f:]
        # dq_ij = w_q * x_j: broadcast-multiply + neighbor-axis sum
        dq = jnp.sum(w_q * x_q[:, None, :, :], axis=2,
                     dtype=jnp.float32)
        # dmuR_ij * dir_ij: the only pair-resident [B, N, N, F] product
        dmu_r = jnp.einsum("bijf,bijv->bivf", w_r * x_r[:, None, :, :],
                           dir_ij.astype(dt),
                           preferred_element_type=jnp.float32)
        # dmumu_ij * mu_j = w_m * (x_j * mu_j): fold x into the node-sized
        # mu BEFORE the pair contraction — no second pair product
        dmu_m = jnp.einsum("bijf,bjvf->bivf", w_m,
                           (mu * x_m[:, :, None, :].astype(mu.dtype)
                            ).astype(dt),
                           preferred_element_type=jnp.float32)
        return q + dq, mu + dmu_r + dmu_m


class PaiNNMixing(nn.Module):
    n_atom_basis: int
    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, q, mu):
        f = self.n_atom_basis
        mu_mix = _dense(2 * f, use_bias=False)(mu)  # [B,N,3,2F]
        mu_v, mu_w = jnp.split(mu_mix, 2, axis=-1)
        mu_vn = jnp.sqrt(jnp.sum(mu_v ** 2, axis=-2, keepdims=False) + self.epsilon)

        ctx = jnp.concatenate([q, mu_vn], axis=-1)
        x = _dense(f)(ctx)
        x = nn.silu(x)
        x = _dense(3 * f)(x)
        dq_intra, dmu_intra, dqmu_intra = jnp.split(x, 3, axis=-1)
        dmu = dmu_intra[:, :, None, :] * mu_w
        dqmu = dqmu_intra * jnp.sum(mu_v * mu_w, axis=-2)
        return q + dq_intra + dqmu, mu + dmu


class PaiNN(nn.Module):
    """PaiNN encoder (ref painn.py:117-269)."""

    n_atom_basis: int = 300
    n_interactions: int = 3
    n_rbf: int = 20
    cutoff: float = 5.0
    max_z: int = NUM_ATOM_CLASSES
    readout: str = "add"
    shared_filters: bool = False
    epsilon: float = 1e-8
    # "bfloat16" = mixed-precision pair-filter products (pretraining use;
    # QM9/MD17 finetunes keep f32 — the default)
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        pos: jnp.ndarray,
        node_mask: jnp.ndarray,
        num_graphs: int,
        n_max: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f = self.n_atom_basis
        b, n = num_graphs, n_max

        pos3 = pos.reshape(b, n, 3)
        dist = pairwise_distances(pos3)
        pair_mask = radius_pair_mask(dist, node_mask, self.cutoff)
        diff = pos3[:, :, None, :] - pos3[:, None, :, :]
        dir_ij = diff / dist[..., None]
        dir_ij = dir_ij * pair_mask[..., None]

        phi = gaussian_rbf(dist, self.n_rbf, self.cutoff)  # [B,N,N,R]
        fcut = cosine_cutoff(dist, self.cutoff) * pair_mask  # [B,N,N]

        # one parameter tensor ("filter_net", tree identical to nn.Dense),
        # applied per-interaction by slicing the KERNEL columns instead of
        # the output: the single big dense materialized a
        # [B, N, N, groups*3F] slab (~2.8 GB f32 at batch 256, emb 300)
        # that had to live until the last interaction; per-slice
        # application keeps the peak at one interaction's filters
        n_filter_groups = 1 if self.shared_filters else self.n_interactions
        wf, bfilt = DenseParams(n_filter_groups * 3 * f, phi.shape[-1],
                                name="filter_net")()

        fdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

        def filters_for(i: int) -> jnp.ndarray:
            g = 0 if self.shared_filters else i
            sl = slice(g * 3 * f, (g + 1) * 3 * f)
            dt = fdt or phi.dtype
            return (phi.astype(dt) @ wf[:, sl].astype(dt)
                    + bfilt[sl].astype(dt)) * fcut[..., None].astype(dt)

        emb = nn.Embed(self.max_z, f, embedding_init=xavier_uniform)
        zc = jnp.clip(z, 0, self.max_z - 1)
        q = emb(zc)
        # padding_idx=0 quirk of the reference (painn.py:174)
        q = q * (zc > 0)[:, None].astype(q.dtype)
        q = q.reshape(b, n, f)
        mu = jnp.zeros((b, n, 3, f), dtype=q.dtype)

        for i in range(self.n_interactions):
            q, mu = PaiNNInteraction(f, dtype=fdt)(
                q, mu, filters_for(i), dir_ij)
            q, mu = PaiNNMixing(f, self.epsilon)(q, mu)

        m = node_mask.reshape(b, n, 1).astype(q.dtype)
        q = q * m
        if self.readout in ("add", "sum"):
            pooled = q.sum(axis=1)
        elif self.readout == "mean":
            pooled = q.sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        else:
            raise ValueError(f"unknown readout {self.readout}")
        latent = q.reshape(b * n, f)
        return pooled, latent

    def encode_batch(self, batch: GraphBatch):
        return self(
            batch.atomic_numbers, batch.positions, batch.node_mask,
            batch.num_graphs, batch.n_max,
        )
