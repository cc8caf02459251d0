"""SchNet over padded batches with an in-jit dense radius graph.

TPU-first re-design of the reference SchNet (reference Geom3D/models/schnet.py).
The reference rebuilds a sparse ``radius_graph`` neighbor list on every
forward (schnet.py:91) — a dynamic-shape op XLA cannot compile.  Here the
neighborhood is a masked dense ``[B, N, N]`` pairwise-distance tensor computed
inside the jitted step, and the continuous-filter convolution becomes a
batched einsum that maps straight onto the MXU:

    h_i <- h_i + lin2( sum_j  W(d_ij) * lin1(h)_j )
    W(d) = mlp(gaussian_smearing(d)) * 0.5 (cos(pi d / cutoff) + 1) * mask

Because the distance matrix is differentiable w.r.t. positions, the MD17
force path ``F = -grad_pos E`` works under ``jax.grad`` with the neighbor
mask held constant (stop-gradient semantics of a boolean mask).

Deviation from the reference noted for the parity record: PyG's
``radius_graph`` silently caps neighbors at 32 per atom; the dense mask keeps
all pairs within the cutoff (identical for molecules with <= 32 in-range
neighbors, i.e. everything in PCQM4Mv2/QM9/MD17 at cutoff 10 except large
molecules where the cap would drop neighbors arbitrarily).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import GraphBatch, NUM_ATOM_CLASSES
from moleculesde_tpu.models.layers import xavier_uniform, zeros_init
from moleculesde_tpu.ops.fourier import gaussian_smearing, shifted_softplus

_DIST_GUARD = 1e-24


def pairwise_distances(pos: jnp.ndarray) -> jnp.ndarray:
    """Safe dense pairwise distances for ``[B, N, 3]`` -> ``[B, N, N]``."""
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    return jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + _DIST_GUARD)


def radius_pair_mask(
    dist: jnp.ndarray, node_mask: jnp.ndarray, cutoff: float
) -> jnp.ndarray:
    """[B, N, N] boolean mask of valid (i != j, both real, d < cutoff) pairs."""
    b, n, _ = dist.shape
    m = node_mask.reshape(b, n)
    pair = m[:, :, None] & m[:, None, :]
    eye = jnp.eye(n, dtype=bool)[None]
    return pair & (~eye) & (dist < cutoff)


class SchNetInteraction(nn.Module):
    """One interaction block (ref schnet.py:138-195) as a dense einsum.

    ``dtype=bfloat16`` halves the HBM traffic of the [B, N, N, filters]
    filter tensors (the interaction's dominant cost in the honest r3 device
    trace: ~1 ms fwd+bwd per block at B=256 in f32); parameters and the
    distance geometry stay f32."""

    hidden_channels: int
    num_filters: int
    num_gaussians: int
    cutoff: float
    dtype: Optional[jnp.dtype] = None
    # CFConv aggregation form (XLA path only).  "einsum" lowers to a
    # dot_general with (batch, feature) batch dims; "reduce" is a
    # broadcast-multiply + sum over the neighbor axis that fuses into the
    # filter dense's output.  Measured (r3, v5e, B=256): einsum wins when
    # SchNet runs ALONE (3.39 vs 4.05 ms fwd — XLA picks the dot's preferred
    # layouts freely), reduce wins inside the full pretrain step (25.82 vs
    # 26.10 ms/step — the dot's [B, F, N{,N}] operand layouts collide with
    # the surrounding models' and force relayout copies).  Default einsum
    # (standalone finetune/sampling use); pretraining opts in via the config.
    agg: str = "einsum"
    # CFConv implementation: "xla", or the fused Pallas kernel
    # (ops/cfconv.py) which keeps the [B, N, N, F] filter tensors
    # VMEM-resident.  The kernel does NOT propagate gradients to positions
    # (ea/env cotangents are zero) — never enable it on the MD17 force path.
    cfconv: str = "xla"

    @nn.compact
    def __call__(self, h, edge_attr, cos_env, pair_mask, dist=None):
        from moleculesde_tpu.models.layers import DenseParams
        from moleculesde_tpu.ops.cfconv import fused_cfconv, fused_cfconv_rbf

        def dense(feat, name, use_bias=True):
            return nn.Dense(feat, kernel_init=xavier_uniform,
                            bias_init=zeros_init, use_bias=use_bias,
                            dtype=self.dtype, name=name)

        # filter-net params declared raw so both impls share one tree
        # (names/shapes identical to the former auto-named nn.Dense stack)
        w1, b1 = DenseParams(self.num_filters, self.num_gaussians,
                             name="Dense_0")()
        w2, b2 = DenseParams(self.num_filters, self.num_filters,
                             name="Dense_1")()
        x = dense(self.num_filters, "Dense_2", use_bias=False)(h)
        envm = cos_env * pair_mask.astype(cos_env.dtype)

        if self.cfconv != "xla":
            if dist is not None:
                # RBF-fused form: smearing synthesized in VMEM from the raw
                # distances — no [B, N, N, G] slab in HBM at all.  Measured
                # and REJECTED as the default (r4, v5e, B=256 mb=128): 21.38
                # vs 20.31-20.44 ms/step — the slab's HBM reads were already
                # async-overlapped with compute, so deleting them bought
                # nothing while the in-VMEM exp landed on the critical path
                # of BOTH passes.  Kept as a validated opt-in
                # (cfconv="pallas_rbf") for shapes where the slab stops
                # fitting the prefetch window (N >> 32).
                x = fused_cfconv_rbf(
                    dist, envm, x, w1, b1, w2, b2,
                    start=0.0, stop=self.cutoff,
                    num_gaussians=self.num_gaussians,
                    bf16=(self.dtype == jnp.bfloat16),
                    impl=self.cfconv.replace("_rbf", ""))
            else:
                x = fused_cfconv(edge_attr, envm, x, w1, b1, w2, b2,
                                 bf16=(self.dtype == jnp.bfloat16),
                                 impl=self.cfconv)
        else:
            dt = self.dtype or h.dtype
            # filter net over the smeared distances [B,N,N,G] -> [B,N,N,Fil]
            w = edge_attr.astype(dt) @ w1.astype(dt) + b1.astype(dt)
            w = shifted_softplus(w.astype(jnp.float32))
            w = w.astype(dt) @ w2.astype(dt) + b2.astype(dt)
            w = w * envm[..., None].astype(w.dtype)
            # CFConv aggregation: h_i = sum_j W_ij * x_j (ref schnet.py:185-195)
            if self.agg == "reduce":
                x = jnp.sum(w * x[:, None, :, :].astype(w.dtype), axis=2)
            else:
                x = jnp.einsum("bijf,bjf->bif", w, x.astype(w.dtype))
        x = dense(self.hidden_channels, "Dense_3")(x)
        x = shifted_softplus(x.astype(jnp.float32))
        x = dense(self.hidden_channels, "Dense_4")(x)
        return x.astype(jnp.float32)


class SchNet(nn.Module):
    """SchNet encoder (ref schnet.py:16-135).

    ``__call__`` takes atomic-number indices (0-based, 119 classes), positions
    and the node mask from a :class:`GraphBatch`; returns ``(pooled, latent)``
    where ``latent`` is the per-node representation fed to the SDE models
    (``return_latent=True`` path of the reference, schnet.py:123-125).
    """

    hidden_channels: int = 128
    num_filters: int = 128
    num_interactions: int = 6
    num_gaussians: int = 51
    cutoff: float = 10.0
    node_class: int = NUM_ATOM_CLASSES
    readout: str = "mean"
    # optional target post-processing (ref schnet.py:103-121); off by default,
    # matching every reference entry point
    mean: Optional[float] = None
    std: Optional[float] = None
    use_atomref: bool = False
    scale: Optional[float] = None
    # "bfloat16" = mixed-precision interaction blocks (pretraining default;
    # the MD17 force path keeps f32 — forces are -grad through these layers)
    compute_dtype: Optional[str] = None
    # CFConv aggregation form; see SchNetInteraction.agg
    agg: str = "einsum"
    # CFConv implementation; see SchNetInteraction.cfconv.  NEVER set to the
    # kernel on a path that differentiates positions (MD17 forces).
    cfconv: str = "xla"

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        pos: jnp.ndarray,
        node_mask: jnp.ndarray,
        num_graphs: int,
        n_max: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Embed(self.node_class, self.hidden_channels,
                     embedding_init=xavier_uniform)(jnp.clip(z, 0, self.node_class - 1))

        pos3 = pos.reshape(num_graphs, n_max, 3)
        dist = pairwise_distances(pos3)
        pair_mask = radius_pair_mask(dist, node_mask, self.cutoff)
        # the opt-in RBF-fused kernel synthesizes the smeared slab in VMEM
        # from the raw distances (ops/cfconv.py::fused_cfconv_rbf — measured
        # slower as a default, see SchNetInteraction) — skip building the
        # [B, N, N, G] tensor in HBM only there
        rbf_path = "_rbf" in self.cfconv
        edge_attr = None if rbf_path else gaussian_smearing(
            dist, 0.0, self.cutoff, self.num_gaussians)
        cos_env = 0.5 * (jnp.cos(dist * math.pi / self.cutoff) + 1.0)

        h = h.reshape(num_graphs, n_max, self.hidden_channels)
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        for _ in range(self.num_interactions):
            h = h + SchNetInteraction(
                self.hidden_channels, self.num_filters, self.num_gaussians,
                self.cutoff, dtype=dt, agg=self.agg, cfconv=self.cfconv
            )(h, edge_attr, cos_env, pair_mask,
              dist=dist if rbf_path else None)

        h = nn.Dense(self.hidden_channels, kernel_init=xavier_uniform, bias_init=zeros_init)(h)
        h = shifted_softplus(h)
        h = nn.Dense(self.hidden_channels, kernel_init=xavier_uniform, bias_init=zeros_init)(h)

        if self.mean is not None and self.std is not None:
            h = h * self.std + self.mean
        if self.use_atomref:
            # reference semantics exactly: ``Embedding(100, 1)`` per-node
            # scalar offset broadcast-added over the feature dim
            # (ref schnet.py:66-70, 112-113)
            atomref = nn.Embed(100, 1, embedding_init=zeros_init,
                               name="atomref")
            h = h + atomref(jnp.clip(z, 0, 99)).reshape(num_graphs, n_max, 1)

        m = node_mask.reshape(num_graphs, n_max, 1).astype(h.dtype)
        h = h * m
        if self.readout in ("add", "sum"):
            pooled = h.sum(axis=1)
        elif self.readout == "mean":
            pooled = h.sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        else:
            raise ValueError(f"unknown readout {self.readout}")
        if self.scale is not None:
            pooled = self.scale * pooled
        latent = h.reshape(num_graphs * n_max, self.hidden_channels)
        return pooled, latent

    def encode_batch(self, batch: GraphBatch):
        return self(
            batch.atomic_numbers, batch.positions, batch.node_mask,
            batch.num_graphs, batch.n_max,
        )
