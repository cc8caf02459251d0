"""2D->3D frame-based SE(3)-equivariant score models (dense-pair TPU design).

Re-design of the reference's four score-model variants (reference
Geom3D/models/MoleculeSDE/SDE_model_2D_to_3D.py: SDEModel2Dto3D_01..04) and
the shared EquivariantScoreNetwork (equivariant_scorenetwork.py).  The
architecture is identical — invariant scalar features (2D-embedding x
distance-Fourier x frame-coefficient embeddings) drive a transformer-GNN
whose per-edge MLP emits 3 dynamic coefficients that linearly mix the
equivariant frame basis; an edge->node mean aggregation yields the per-node
3-vector score.

TPU-first layout: the extended molecular graph is nearly all-pairs (1-4-hop
shortcuts), so per-edge quantities live on dense ``[B, N, N, ...]`` tensors
indexed ``[batch, source, dest]`` and masked by the extended adjacency.
Attention (the reference's PyG TransformerConv, softmax grouped by
destination) becomes masked dense attention — batched einsums on the MXU —
replacing the gather/segment-scatter path, which profiling showed dominates
the training step on TPU (~120 ms -> matmul-bound).  Pair-concat linears are
decomposed into two per-node matmuls broadcast-added over pairs, so no
``[B, N, N, 2*emb]`` tensor is ever materialized.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.core.segment import masked_segment_mean
from moleculesde_tpu.models.layers import (
    MLP, DenseParams, MaskedBatchNorm, PairMaskedBatchNorm,
    xavier_uniform, zeros_init)
from moleculesde_tpu.ops.fourier import (
    gaussian_fourier_projection, gaussian_fourier_projection_cm)
from moleculesde_tpu.ops.common import EPSILON
from moleculesde_tpu.ops.pair_block import (
    pair_relu_project, pair_relu_project_cm)
from moleculesde_tpu.sde import SDE, make_sde

_SQRT_GUARD = 1e-24

# DenseGATLayer channel-major attention: True runs the pair elementwise work
# on flat [B, hd, N*N] tensors (lane-exact; only the softmax keeps the
# [s, d]-structured form).  MEASURED AND REJECTED on v5e-1 (r3 ab runs):
# sampler 0.85 -> 1.60 ms/PC step at B=64, full pretrain step 21.8 -> 23.9
# ms at B=256 — the repeat/tile broadcasts, the softmax-boundary relayouts
# and the selector dot ADD more ops than the lane padding costs, on both the
# op-count-bound sampler and the bandwidth-bound step.  (Contrast with the
# same flat treatment of the FRAME planes, which won: those are pure
# elementwise chains with no softmax/structured op forcing [s, d] form.)
# Kept as a module-level A/B switch (benchmarks/ab_sampler.py / ab_step.py
# 'attend_flat' variant); both forms are numerically equivalent.
ATTEND_FLAT = False


def _safe_norm(x, axis=-1, keepdims=True):
    return jnp.sqrt(jnp.sum(x ** 2, axis=axis, keepdims=keepdims) + _SQRT_GUARD)


class PairDense(nn.Module):
    """Linear over concat(h_s, h_d) pair features without materializing the
    concatenated ``[B, N, N, 2*F]`` tensor: kernel [2F, out] split into the
    source and dest halves, applied per node, broadcast-added over pairs."""

    features: int

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """h: [B, N, F] -> (src_part [B, N, out], dst_part [B, N, out]);
        pair value is ``src_part[:, :, None] + dst_part[:, None, :] (+ bias)``."""
        f = h.shape[-1]
        kernel = self.param("kernel", xavier_uniform, (2 * f, self.features))
        bias = self.param("bias", zeros_init, (self.features,))
        src = h @ kernel[:f]
        dst = h @ kernel[f:] + bias
        return src, dst


def dense_frames(pos: jnp.ndarray):
    """All-pairs frame basis + invariant coefficients on [B, N, 3] positions.

    Dense analogue of ops.rejected.frames_edgelist.frame_features (reference coord2basis,
    SDE_model_2D_to_3D.py:35-47 and the coefficient block l.162-178), indexed
    ``[b, s, d]`` to match edge (row=s, col=d).  NaN-safe on the diagonal and
    padded rows via sqrt guards.

    TPU layout note: every 3-vector is kept as THREE separate ``[B, N, N]``
    component arrays instead of one ``[B, N, N, 3]`` tensor.  With the 3 on
    the minor axis the VPU pads 3 -> 128 lanes and the whole frame pipeline
    runs at ~2% lane utilization (profiled at 3.3 ms for B=64, N=32 —
    dominating the PC sampler); component-wise the minor dims are (N, N).

    Returns ``(basis, coff_s, coff_d, pseudo_angle)`` where ``basis`` is a
    3-tuple (diff, cross, vertical) of component triples ``(x, y, z)``,
    ``coff_s``/``coff_d`` are component triples of frame coefficients, and
    ``pseudo_angle`` is ``(sin, cos)``.
    """
    comps = [pos[..., k] for k in range(3)]  # [B, N] each
    ps = [c[:, :, None] for c in comps]      # source (row), broadcastable
    pd = [c[:, None, :] for c in comps]      # dest (col)

    diff = [s - d for s, d in zip(ps, pd)]
    # cross(p_s, p_d) componentwise
    cross = [ps[1] * pd[2] - ps[2] * pd[1],
             ps[2] * pd[0] - ps[0] * pd[2],
             ps[0] * pd[1] - ps[1] * pd[0]]

    def _norm3(v):
        return jnp.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2 + _SQRT_GUARD)

    dn = _norm3(diff) + EPSILON
    diff = [v / dn for v in diff]
    cn = _norm3(cross) + EPSILON
    cross = [v / cn for v in cross]
    vert = [diff[1] * cross[2] - diff[2] * cross[1],
            diff[2] * cross[0] - diff[0] * cross[2],
            diff[0] * cross[1] - diff[1] * cross[0]]

    def proj(r):  # project r onto the frame -> 3 coefficient planes
        return (
            diff[0] * r[0] + diff[1] * r[1] + diff[2] * r[2],
            # reflection anti-symmetry (ref l.359-360)
            jnp.abs(cross[0] * r[0] + cross[1] * r[1] + cross[2] * r[2]),
            vert[0] * r[0] + vert[1] * r[1] + vert[2] * r[2],
        )

    coff_s = proj(ps)
    coff_d = proj(pd)
    dot = sum(a * b for a, b in zip(coff_s, coff_d))
    ns = _norm3(coff_s)
    nd = _norm3(coff_d)
    pseudo_cos = dot / (ns + EPSILON) / (nd + EPSILON)
    pseudo_sin = jnp.sqrt(jnp.clip(1.0 - pseudo_cos ** 2, 1e-12))
    return (diff, cross, vert), coff_s, coff_d, (pseudo_sin, pseudo_cos)


def dense_frames_flat(pos: jnp.ndarray):
    """:func:`dense_frames` with every plane PAIR-FLATTENED to ``[B, N*N]``.

    Same math, same [b, s, d] indexing with ``p = s*N + d`` — but the minor
    dim is N*N (a lane-exact multiple of 128 for N>=12) instead of N, so on
    TPU every frame plane, and everything elementwise downstream of it, runs
    at full VPU lane width with zero HBM padding.  The padded form spends 4x
    the bandwidth at N=32 (minor 32 -> 128 lanes) across ~15 planes plus
    their backward — the flat form is what the channel-major score pipeline
    (``score_from_cond_cm``) consumes anyway, so this also deletes the
    [B,N,N] -> [B,NN] relayout copies at the GFP boundary.

    Returns ``(basis, (c0, c2), (pseudo_sin, pseudo_cos))``: ``basis`` is a
    3-tuple (diff, cross, vertical) of component triples, each ``[B, N*N]``;
    ``(c0, c2)`` are the two frame coefficients the GFP embeds (component 1
    is |.|-folded into the basis only, ref SDE_model_2D_to_3D.py:111-118);
    the unused ``coff_d`` triple is not returned (derived by the s<->d
    symmetry at the caller).
    """
    b, n, _ = pos.shape
    comps = [pos[..., k] for k in range(3)]                # [B, N]
    ps = [jnp.repeat(c, n, axis=1) for c in comps]         # source: p // N
    pd = [jnp.tile(c, (1, n)) for c in comps]              # dest:   p % N

    diff = [s - d for s, d in zip(ps, pd)]
    cross = [ps[1] * pd[2] - ps[2] * pd[1],
             ps[2] * pd[0] - ps[0] * pd[2],
             ps[0] * pd[1] - ps[1] * pd[0]]

    def _norm3(v):
        return jnp.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2 + _SQRT_GUARD)

    dn = _norm3(diff) + EPSILON
    diff = [v / dn for v in diff]
    cn = _norm3(cross) + EPSILON
    cross = [v / cn for v in cross]
    vert = [diff[1] * cross[2] - diff[2] * cross[1],
            diff[2] * cross[0] - diff[0] * cross[2],
            diff[0] * cross[1] - diff[1] * cross[0]]

    def proj(r):
        return (
            diff[0] * r[0] + diff[1] * r[1] + diff[2] * r[2],
            jnp.abs(cross[0] * r[0] + cross[1] * r[1] + cross[2] * r[2]),
            vert[0] * r[0] + vert[1] * r[1] + vert[2] * r[2],
        )

    coff_s = proj(ps)
    coff_d = proj(pd)
    dot = sum(a * b_ for a, b_ in zip(coff_s, coff_d))
    ns = _norm3(coff_s)
    nd = _norm3(coff_d)
    pseudo_cos = dot / (ns + EPSILON) / (nd + EPSILON)
    pseudo_sin = jnp.sqrt(jnp.clip(1.0 - pseudo_cos ** 2, 1e-12))
    return ((diff, cross, vert), (coff_s[0], coff_s[2]),
            (pseudo_sin, pseudo_cos))


class DenseGATLayer(nn.Module):
    """TransformerConv + FFN with post-norm residuals (ref
    equivariant_scorenetwork.py:13-40) as masked dense attention.

    PyG TransformerConv semantics: logits = q_d . (k_s + e_sd) / sqrt(c),
    softmax over sources s for each destination d, messages (v_s + e_sd) *
    alpha summed at d, heads concatenated, plus a root-skip linear.

    ``dtype=bfloat16`` halves the HBM traffic of the pair-resident tensors
    (the sampling hot path is bandwidth-bound); softmax stays in f32.
    """

    hidden_dim: int
    n_head: int
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edge_attr, pair_mask, deterministic: bool = True,
                 channel_major: bool = False):
        """``channel_major=False``: ``edge_attr`` is ``[B, N, N, H]``
        (feature-minor).  ``channel_major=True``: ``edge_attr`` is
        ``[B, H, N*N]`` — on TPU the H=32 minor dim lane-pads 4x to 128,
        so the cm layout quarters the HBM traffic of every pair-resident
        tensor in this layer (same parameters, same math)."""
        h, c = self.n_head, self.hidden_dim // self.n_head
        b, n, _ = x.shape

        def dense(feat, name=None):
            return nn.Dense(feat, kernel_init=xavier_uniform, name=name,
                            dtype=self.dtype)

        qk_, qb_ = DenseParams(h * c, x.shape[-1], name="lin_query")()
        kk_, kb_ = DenseParams(h * c, x.shape[-1], name="lin_key")()
        vk_, vb_ = DenseParams(h * c, x.shape[-1], name="lin_value")()
        ek, eb = DenseParams(h * c, edge_attr.shape[1] if channel_major
                             else edge_attr.shape[-1], name="lin_edge")()
        dt = self.dtype or x.dtype

        if channel_major:
            out = self._attend_cm(
                x, qk_, qb_, kk_, kb_, vk_, vb_, edge_attr, ek, eb,
                pair_mask, deterministic, dt)
        else:
            xd = x.astype(dt)
            q = xd @ qk_.astype(dt) + qb_.astype(dt)
            k = xd @ kk_.astype(dt) + kb_.astype(dt)
            v = xd @ vk_.astype(dt) + vb_.astype(dt)
            e = edge_attr.astype(dt) @ ek.astype(dt) + eb.astype(dt)
            q4 = q.reshape(b, n, h, c)
            k4 = k.reshape(b, n, h, c)
            v4 = v.reshape(b, n, h, c)
            e5 = e.reshape(b, n, n, h, c)

            # logits[b, h, s, d] = q_d . k_s + q_d . e_sd  (f32 softmax;
            # CPU XLA lacks bf16xbf16->f32 dots, so upcast after the einsum)
            logits = jnp.einsum("bdhc,bshc->bhsd", q4, k4).astype(jnp.float32)
            logits = logits + jnp.einsum("bdhc,bsdhc->bhsd", q4, e5
                                         ).astype(jnp.float32)
            logits = logits / jnp.sqrt(float(c))
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(pair_mask[:, None, :, :], logits, neg)
            alpha = jax.nn.softmax(logits, axis=2)  # over sources s (f32)
            alpha = alpha * pair_mask[:, None, :, :]  # isolated dests -> zero
            alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
            alpha = alpha.astype(v.dtype)

            out = jnp.einsum("bhsd,bshc->bdhc", alpha, v4)
            out = out + jnp.einsum("bhsd,bsdhc->bdhc", alpha, e5)
            out = out.reshape(b, n, h * c)
        mha = out + dense(h * c, "lin_skip")(x)

        x = x + nn.LayerNorm(dtype=self.dtype)(mha)
        ffn = dense(self.hidden_dim)(x)
        ffn = nn.silu(ffn)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        ffn = dense(self.hidden_dim)(ffn)
        x = x + nn.LayerNorm(dtype=self.dtype)(ffn)
        return x

    def _attend_cm(self, x, qk_, qb_, kk_, kb_, vk_, vb_, edge_cm, ek, eb,
                   pair_mask, deterministic, dt):
        """Attention with pair tensors in ``[B, C, N*N]`` channel-major
        layout (minor dim N*N — no lane padding).  Identical semantics to
        the feature-minor branch: the per-head logit ``q_d . (k_s + e_sd)``
        is an elementwise product on [B, H, N, N] channel planes summed per
        head (channels are blocked per head: head(C) = C // c).

        Copy-pressure notes from the compiled-HLO copy inventory
        (~73 copies/eval before): q/k/v fused into ONE dot (three separate
        ``bon`` einsums each materialized a [B,hd,N] transpose copy), and
        the head-sum / head-broadcast run as reshape-sum / broadcast-repeat
        instead of one-hot selector matmuls (each selector dot forced
        [B,8,NN] f32 layout round-trip copies)."""
        h, c = self.n_head, self.hidden_dim // self.n_head
        hd = h * c
        b, n, _ = x.shape

        xd = x.astype(dt)
        wqkv = jnp.concatenate([qk_, kk_, vk_], axis=1).astype(dt)  # [F,3hd]
        bqkv = jnp.concatenate([qb_, kb_, vb_]).astype(dt)
        qkv = (jnp.einsum("bnf,fo->bon", xd, wqkv)
               + bqkv[None, :, None])                # [B, 3hd, N]
        qT, kT, vT = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
        e_cm = (jnp.einsum("bcp,co->bop", edge_cm.astype(dt), ek.astype(dt))
                + eb.astype(dt)[None, :, None])      # [B, hd, NN]

        if ATTEND_FLAT:
            # pair elementwise work on FLAT [B, hd, N*N] tensors (lane
            # exact) — only the softmax runs in the [s, d]-structured form,
            # with one relayout each way on the small [B, H, N, N] logits;
            # the source-sum of the message runs as a [NN, N] selector dot
            ks = jnp.repeat(kT, n, axis=2)           # source: p // N
            qd = jnp.tile(qT, (1, 1, n))             # dest:   p % N
            ke = (ks + e_cm) * qd                    # [B, hd, NN]
            logits = (ke.reshape(b, h, c, n * n).sum(axis=2)
                      .astype(jnp.float32) / jnp.sqrt(float(c))
                      ).reshape(b, h, n, n)
            neg = jnp.finfo(logits.dtype).min
            l4 = jnp.where(pair_mask[:, None, :, :], logits, neg)
            alpha = jax.nn.softmax(l4, axis=2)       # over sources s (f32)
            alpha = alpha * pair_mask[:, None, :, :]
            alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
            af = jnp.broadcast_to(
                alpha.reshape(b, h, n * n).astype(dt)[:, :, None],
                (b, h, c, n * n)).reshape(b, hd, n * n)
            m2 = af * (jnp.repeat(vT, n, axis=2) + e_cm)   # [B, hd, NN]
            sel = (jnp.arange(n * n)[:, None] % n
                   == jnp.arange(n)[None, :]).astype(dt)
            msg = jnp.einsum("bcp,pd->bdc", m2, sel)       # [B, N, hd]
            return msg

        e4 = e_cm.reshape(b, hd, n, n)               # [b, C, s, d]
        ke = (kT[:, :, :, None] + e4) * qT[:, :, None, :]   # [b, C, s, d]
        logits = (ke.reshape(b, h, c, n, n).sum(axis=2)     # head-blocked sum
                  .astype(jnp.float32) / jnp.sqrt(float(c)))
        neg = jnp.finfo(logits.dtype).min
        l4 = jnp.where(pair_mask[:, None, :, :], logits, neg)
        alpha = jax.nn.softmax(l4, axis=2)           # over sources s (f32)
        alpha = alpha * pair_mask[:, None, :, :]
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
        alpha_full = jnp.broadcast_to(
            alpha.astype(dt)[:, :, None], (b, h, c, n, n)).reshape(b, hd, n, n)
        # reduce over sources with the node axis ordered [B, d, C] directly
        msg = jnp.einsum("bcsd->bdc",
                         alpha_full * (vT[:, :, :, None] + e4))  # [B, N, hd]
        return msg


class EquivariantScoreNetwork(nn.Module):
    """Stacked GAT modules emitting a per-node equivariant 3-vector score
    (ref equivariant_scorenetwork.py:84-169), dense-pair formulation."""

    hidden_dim: int
    hidden_coff_dim: int = 128
    num_layers: int = 2
    num_convs: int = 2
    n_head: int = 8
    dropout: float = 0.1
    short_cut: bool = False
    concat_hidden: bool = False
    dtype: Optional[jnp.dtype] = None  # bf16 halves pair-tensor HBM traffic

    @nn.compact
    def __call__(self, node_attr, edge_attr, pair_mask, equivariant_basis,
                 deterministic: bool = True, channel_major: bool = False):
        """node_attr [B,N,H]; edge_attr [B,N,N,H] feature-minor, or
        [B,H,N*N] when ``channel_major`` (lane-padding-free pair layout —
        see DenseGATLayer); pair_mask [B,N,N] bool; ``equivariant_basis``
        is the component-structured (diff, cross, vertical) triple from
        :func:`dense_frames` — each a 3-tuple of [B, N, N] planes (see the
        layout note there).  Returns gradient [B, N, 3]."""
        basis = equivariant_basis  # ((dx,dy,dz), (cx,cy,cz), (vx,vy,vz))
        b, n, _ = node_attr.shape
        hiddens = []
        conv_input = node_attr
        grad_comps = [jnp.zeros((b, n), dtype=node_attr.dtype)
                      for _ in range(3)]

        # per-dest valid-source counts for the EquiLayer mean (ref l.43-81)
        count = jnp.maximum(pair_mask.sum(axis=1), 1)
        if channel_major:
            # flat pipeline (dense_frames_flat): mask as [B, N*N], and the
            # EquiLayer source-mean as a [N*N, N] selector matmul (sum over
            # p with p % N == d) — MXU instead of a lane-padded reduce
            maskf = pair_mask.reshape(b, n * n).astype(node_attr.dtype)
            sel_d = (jnp.arange(n * n)[:, None] % n
                     == jnp.arange(n)[None, :]).astype(jnp.float32)
        else:
            maskf = pair_mask.astype(node_attr.dtype)

        for module_idx in range(self.num_layers):
            for conv_idx in range(self.num_convs):
                hidden = DenseGATLayer(self.hidden_dim, self.n_head,
                                       self.dropout, dtype=self.dtype)(
                    conv_input, edge_attr, pair_mask, deterministic,
                    channel_major=channel_major)
                if conv_idx < self.num_convs - 1:
                    hidden = nn.silu(hidden)
                if self.short_cut and hidden.shape == conv_input.shape:
                    hidden = hidden + conv_input
                hiddens.append(hidden)
                conv_input = hidden

            node_feature = (jnp.concatenate(hiddens, axis=-1)
                            if self.concat_hidden else hiddens[-1])

            # basis MLP input = [h_s + h_d, edge_attr]; its first linear
            # W [2H, coff_dim] splits as W_h (h_s + h_d) + W_e e + b, letting
            # the node part run per node instead of per pair (ref l.113-119).
            # The pair-resident intermediates ([B, N, N, coff_dim]) are the
            # largest activations of the whole step; jax.checkpoint keeps them
            # out of the saved-residual set (recomputed in backward) so large
            # batches stay HBM-resident.
            wh, _ = DenseParams(self.hidden_coff_dim, node_feature.shape[-1],
                                use_bias=False,
                                name=f"basis_node_{module_idx}")()
            we, be = DenseParams(self.hidden_coff_dim,
                                 edge_attr.shape[1] if channel_major
                                 else edge_attr.shape[-1],
                                 name=f"basis_edge_{module_idx}")()
            wo, bo = DenseParams(3, self.hidden_coff_dim,
                                 name=f"basis_out_{module_idx}")()

            def coff_mix(node_f, edge_a, basis, maskf, wh, we, be, wo, bo):
                dt = self.dtype or node_f.dtype
                h_part = node_f.astype(dt) @ wh.astype(dt)
                e_part = edge_a.astype(dt) @ we.astype(dt) + be.astype(dt)
                coff = jax.nn.silu(
                    h_part[:, :, None, :] + h_part[:, None, :, :] + e_part)
                # dynamic coefficients with component-MAJOR layout [3,B,N,N]
                # (a [..., 3]-minor dot output would run at 3/128 lanes)
                c = jnp.einsum("bsdf,fc->cbsd", coff, wo.astype(dt)
                               ).astype(jnp.float32) \
                    + bo[:, None, None, None]
                # mix the frame basis per component and mean over sources
                return [
                    ((c[0] * bx[0] + c[1] * bx[1] + c[2] * bx[2]) * maskf
                     ).sum(axis=1)
                    for bx in zip(*basis)  # (dx,cx,vx), (dy,cy,vy), (dz,cz,vz)
                ]

            def coff_mix_cm(node_f, edge_cm, basis, maskf, wh, we, be, wo, bo):
                # coff-mix for the flat channel-major pipeline.  The
                # basis-MLP block runs FEATURE-minor: at coff_dim=128 the
                # [B, N*N, 128] slab is exactly lane-width (no padding),
                # the silu consumes the dot outputs in their natural layout,
                # and the closing einsum contracts the minor dim — whereas a
                # channel-major [B, 128, N*N] slab forced XLA to relayout
                # e_part AND the silu result around every dot (HLO copy
                # inventory: 4x 16 MB copies/eval, ~130 us/step).  The
                # component planes ``c`` and the basis mixing stay flat
                # ([B, N*N] minor — the [3, B, N, N] form lane-padded 4x and
                # billed ~1.2 ms/step fwd+bwd in the r3 trace); the closing
                # source-mean is the ``sel_d`` selector dot.
                dt = self.dtype or node_f.dtype
                cd = wh.shape[1]
                h_part = node_f.astype(dt) @ wh.astype(dt)        # [B, N, cd]
                e_part = (jnp.einsum("bcp,co->bpo", edge_cm.astype(dt),
                                     we.astype(dt))
                          + be.astype(dt))                        # [B,NN,cd]
                # pair add in the 4-D broadcast form (fuses into the silu
                # with nothing materialized — repeat/tile would write the
                # 67 MB broadcasts); [B, N, N, cd] and [B, NN, cd] share one
                # memory layout at cd=128 minor, so the closing reshape is
                # a free leading-dim merge
                coff = jax.nn.silu(
                    h_part[:, :, None, :] + h_part[:, None, :, :]
                    + e_part.reshape(b, n, n, cd))
                c = jnp.einsum("bpf,fc->cbp", coff.reshape(b, n * n, cd),
                               wo.astype(dt)).astype(jnp.float32) \
                    + bo[:, None, None]                           # [3, B, NN]
                return [
                    ((c[0] * bx[0] + c[1] * bx[1] + c[2] * bx[2]) * maskf
                     ) @ sel_d
                    for bx in zip(*basis)
                ]

            # checkpoint only on the training (feature) path: the cm path is
            # sampler-only (never differentiated) and the remat boundary
            # forces two 16 MB layout copies per eval (HLO copy inventory)
            mix_fn = coff_mix if not channel_major else coff_mix_cm
            if not channel_major:
                mix_fn = jax.checkpoint(mix_fn)
            mixed = mix_fn(
                node_feature, edge_attr, basis, maskf, wh, we, be, wo, bo)
            # EquiLayer(aggr="mean"): mean over sources s at destination d
            grad_comps = [g + m / count for g, m in zip(grad_comps, mixed)]

        gradient = jnp.stack(grad_comps, axis=-1)  # [B, N, 3]
        return {"node_feature": node_feature, "gradient": gradient}


class SDEModel2Dto3D(nn.Module):
    """Unified implementation of the reference's SDEModel2Dto3D_01..04.

    ``variant`` selects the edge-feature recipe (ref SDE_model_2D_to_3D.py):
      1: edge_attr = edge_2D_emb + frame_invariant                  (l.69-249)
      2: ... + perturbed-distance Fourier gate:
         edge_attr = dist_inv * edge_2D_emb + frame_invariant       (l.252-445)
      3: linear edge_2D_emb + bond-type embedding on ext_attr       (l.448-632)
      4: like 3 with [h_s * h_d, h_s + h_d] pair features           (l.635-819)
    """

    emb_dim: int
    hidden_dim: int = 32
    variant: int = 2
    beta_min: float = 0.2
    beta_max: float = 1.0
    num_diffusion_timesteps: int = 1000
    sde_type: str = "VE"
    short_cut: bool = False
    concat_hidden: bool = False
    use_extend_graph: bool = True
    # compute the bandwidth-dominant pair-feature block in bfloat16 (HBM-bound
    # on TPU; frames, losses and the score head stay f32)
    bf16_pairs: bool = False
    # pair-block implementation: "auto" = fused Pallas kernel on TPU
    # (ops/pair_block.py: never materializes [B, N, N, emb]), checkpointed XLA
    # elsewhere; "xla" / "pallas" / "pallas_interpret" force one.
    pair_impl: str = "auto"
    # compute dtype of the invariant-feature/score-network pipeline.
    # "bfloat16" halves pair-tensor HBM traffic (the sampling chain is
    # bandwidth-bound); frame geometry, softmax and the equivariant mixing
    # stay f32.  Same params either way — sampler CLIs opt in via
    # model.clone(score_dtype="bfloat16") without touching checkpoints.
    score_dtype: str = "float32"
    # pair-tensor layout of the training-loss / get_score pipeline:
    # "channel" runs the score eval with every pair tensor as [B, C, N*N]
    # (pair axis minor — lane-padding-free on TPU, fewer layout copies; see
    # score_from_cond_cm), "feature" is the reference-shaped [B, N, N, C]
    # path.  Identical parameters and math either way (equivalence tested
    # per variant in tests/test_score_models.py).
    loss_layout: str = "channel"
    # opt-in: emit the variant-1/2 edge embedding channel-major straight from
    # the Pallas kernel (ops/pair_block.py::pair_relu_project_cm) instead of
    # feature-minor + caller transpose.  Validated (tests/test_pair_block.py)
    # but measured NEUTRAL-to-negative in the full training step on v5e
    # (23.6 ms vs 22.0-23.4 ms baseline process variance @ B=256): the
    # transposed [B,C,N] input relayouts + f32 [B,H,NN] kernel write offset
    # the deleted 0.44 ms caller-side transpose.  Kept for N>32 shapes where
    # the feature-minor write's 4x lane padding grows quadratically.
    pair_cm_direct: bool = False

    @property
    def sde_pos(self) -> SDE:
        return make_sde(self.sde_type, self.beta_min, self.beta_max,
                        self.num_diffusion_timesteps)

    def setup(self):
        h = self.hidden_dim
        if self.variant in (1, 2):
            self.edge_2D_emb_0 = PairDense(self.emb_dim)
            self.edge_2D_emb_bn = PairMaskedBatchNorm()
            self.edge_2D_emb_1 = DenseParams(h, self.emb_dim)
        elif self.variant == 3:
            self.edge_2D_emb = PairDense(h)
        else:  # variant 4
            self.edge_2D_emb_kernel = self.param(
                "edge_2D_emb_kernel", xavier_uniform, (2 * self.emb_dim, h))
            self.edge_2D_emb_bias = self.param(
                "edge_2D_emb_bias", zeros_init, (h,))
        if self.variant in (3, 4):
            self.edge_emb = nn.Embed(100, h, embedding_init=xavier_uniform)
        dt = jnp.bfloat16 if self.score_dtype == "bfloat16" else None
        self.coff_fourier_W = self.param(
            "coff_fourier_W", nn.initializers.normal(1.0), (h,))
        # raw kernel/bias (identical param tree to nn.Dense) so the
        # channel-major path can apply it as an einsum over the channel axis
        self.coff_mlp = DenseParams(h, 4 * h)
        self.project = MLP([h, h], activation="silu", dtype=dt)
        if self.variant == 2:
            self.dist_fourier_W = self.param(
                "dist_fourier_W", nn.initializers.normal(1.0), (h,))
            self.input_mlp = MLP([h], activation="silu", dtype=dt)
        self.node_emb = MLP([h], activation="silu", dtype=dt)
        self.score_network = EquivariantScoreNetwork(
            hidden_dim=h, hidden_coff_dim=128,
            short_cut=self.short_cut, concat_hidden=self.concat_hidden,
            dtype=dt)

    def _pair_mask_attr(self, batch: GraphBatch):
        """Dense [B, N, N] extended-adjacency mask + bond-type labels,
        indexed [b, s, d], scattered once from the padded edge lists.
        The device-side ingest path (data/compact.py) builds the dense form
        directly on the TPU — use it as-is."""
        if batch.ext_dense_mask is not None:
            return batch.ext_dense_mask, batch.ext_dense_attr
        if self.use_extend_graph:
            src, dst, emask, eattr = (batch.ext_src, batch.ext_dst,
                                      batch.ext_mask, batch.ext_attr)
        else:
            src, dst, emask = batch.edge_src, batch.edge_dst, batch.edge_mask
            eattr = batch.edge_feats[:, 0] + 1
        b_idx = jnp.where(emask, src // batch.n_max, batch.num_graphs)
        s = src % batch.n_max
        d = dst % batch.n_max
        shape = (batch.num_graphs, batch.n_max, batch.n_max)
        mask = jnp.zeros(shape, dtype=bool).at[b_idx, s, d].set(True, mode="drop")
        attr = jnp.zeros(shape, dtype=jnp.int32).at[b_idx, s, d].set(
            eattr.astype(jnp.int32), mode="drop")
        return mask, attr

    def precompute_conditioning(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        use_running_average: bool = True,
        layout: str = "feature",
    ) -> Dict[str, jnp.ndarray]:
        """Position-independent conditioning features.

        Everything here depends only on the 2D graph (node embeddings, bond
        topology) — it is loop-invariant across the reverse-SDE sampling chain
        (the reference recomputes it in every one of the 1000 get_score calls,
        SDE_model_2D_to_3D.py:393-445), so samplers hoist it out of the
        ``lax.scan`` and reuse the result at every step.
        """
        b, n = batch.num_graphs, batch.n_max
        h = self.hidden_dim
        pair_mask, pair_attr = self._pair_mask_attr(batch)
        h2d = node_2d_repr.reshape(b, n, -1)

        # --- 2D edge embedding -------------------------------------------------
        cm_direct = False
        if self.variant in (1, 2):
            src_p, dst_p = self.edge_2D_emb_0(h2d)
            a, c = self.edge_2D_emb_bn(src_p, dst_p, pair_mask,
                                       use_running_average)
            w1, b1 = self.edge_2D_emb_1()
            if layout == "channel" and self.pair_cm_direct:
                # kernel emits [B, H, N*N] directly — no feature-minor
                # (4x-padded) write and no caller-side relayout
                edge_attr_2d = pair_relu_project_cm(
                    a, c, w1, b1, bf16=self.bf16_pairs, impl=self.pair_impl)
                cm_direct = True
            else:
                edge_attr_2d = pair_relu_project(
                    a, c, w1, b1, bf16=self.bf16_pairs, impl=self.pair_impl)
        else:
            if self.variant == 3:
                src_p, dst_p = self.edge_2D_emb(h2d)
                edge_attr_2d = src_p[:, :, None, :] + dst_p[:, None, :, :]
            else:  # variant 4: [h_s * h_d, h_s + h_d] pair features (ref l.726)
                kernel = self.edge_2D_emb_kernel
                bias = self.edge_2D_emb_bias
                w_mul, w_add = kernel[: self.emb_dim], kernel[self.emb_dim :]
                # (h_s * h_d) @ W1 decomposes via einsum; (h_s + h_d) @ W2 splits
                edge_attr_2d = (
                    jnp.einsum("bsf,bdf,fo->bsdo", h2d, h2d, w_mul)
                    + (h2d @ w_add)[:, :, None, :]
                    + (h2d @ w_add)[:, None, :, :]
                    + bias
                )
            bond_emb = self.edge_emb(jnp.clip(pair_attr, 0, 99))
            edge_attr_2d = edge_attr_2d + bond_emb

        node_attr = self.node_emb(h2d)
        if layout == "channel" and not cm_direct:
            # [B, N, N, H] -> [B, H, N*N]: pair tensors with the big axis
            # minor are lane-padding-free on TPU (score_from_cond_cm).
            # Cast to the score compute dtype BEFORE the physical transpose:
            # the pair kernel emits f32, and an uncast f32 slab here (a) pays
            # 2x bytes on this relayout copy and (b) promotes every
            # downstream add/mask-mul of the cm loss path back to f32
            # (score_from_cond_cm consumes it in ``cdt`` regardless) — the
            # r4 HLO inventory billed ~34 MB/chunk of f32 copies to this
            # boundary and the line-793 mask multiply.
            if self.score_dtype == "bfloat16":
                edge_attr_2d = edge_attr_2d.astype(jnp.bfloat16)
            edge_attr_2d = edge_attr_2d.reshape(b, n * n, -1).transpose(0, 2, 1)
        return {"edge_attr_2d": edge_attr_2d, "node_attr": node_attr,
                "pair_mask": pair_mask}

    def score_from_cond(
        self,
        cond: Dict[str, jnp.ndarray],
        batch: GraphBatch,
        pos: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Position-dependent half: frames + invariant coefficient features +
        equivariant score network -> raw gradient [N_nodes, 3]."""
        h = self.hidden_dim
        b, n = batch.num_graphs, batch.n_max
        pair_mask = cond["pair_mask"]
        edge_attr_2d = cond["edge_attr_2d"]
        pos3 = pos.reshape(b, n, 3)

        # --- equivariant frames + invariant coefficients -----------------------
        basis, coff_s, coff_d, (pseudo_sin, pseudo_cos) = dense_frames(pos3)

        w_coff = jax.lax.stop_gradient(self.coff_fourier_W)  # frozen (ref GFP l.62)
        wm, bm = self.coff_mlp()
        cdt = jnp.bfloat16 if self.score_dtype == "bfloat16" else jnp.float32

        # GFP on coff_s only (components 0 and 2; component 1 is |.|-folded,
        # ref l.111-118).  dense_frames symmetry under the s<->d pair swap:
        # diff and cross flip sign, vert is even, so coff_d = pair-transpose
        # of coff_s with component 0 negated — embed_d is the SAME sin/cos
        # slab pushed through coff_mlp with the sin(c0) weight block negated
        # (sin odd, cos even), then pair-transposed.  Halves the dominant
        # transcendental cost of both the train step and the sampler.
        e0 = gaussian_fourier_projection(coff_s[0][..., None], w_coff)
        e2 = gaussian_fourier_projection(coff_s[2][..., None], w_coff)
        full = jnp.concatenate([e0, e2], axis=-1).astype(cdt)  # [B,N,N,4h]
        wm_c = wm.astype(cdt)      # rows: [sin0 | cos0 | sin2 | cos2]
        wm_neg = jnp.concatenate([-wm_c[:h], wm_c[h:]], axis=0)
        bm_c = bm.astype(cdt)
        embed_s = full @ wm_c + bm_c
        embed_d = (full @ wm_neg).swapaxes(1, 2) + bm_c
        edge_embed = jnp.concatenate(
            [pseudo_sin[..., None], pseudo_cos[..., None], embed_s, embed_d],
            axis=-1)
        frame_inv = self.project(edge_embed)

        if self.variant == 2:
            # componentwise pair distances (minor dims (N, N), not 3)
            sq = sum((pos3[..., k][:, :, None] - pos3[..., k][:, None, :]) ** 2
                     for k in range(3))
            dist = jnp.sqrt(sq + _SQRT_GUARD)[..., None]
            w_dist = jax.lax.stop_gradient(self.dist_fourier_W)
            dist_emb = gaussian_fourier_projection(dist, w_dist)
            dist_inv = self.input_mlp(dist_emb)
            edge_attr = dist_inv * edge_attr_2d + frame_inv
        else:
            edge_attr = edge_attr_2d + frame_inv
        edge_attr = edge_attr * pair_mask[..., None]

        out = self.score_network(
            cond["node_attr"], edge_attr, pair_mask, basis, deterministic)
        return out["gradient"].reshape(b * n, 3)

    def score_from_cond_cm(
        self,
        cond: Dict[str, jnp.ndarray],
        batch: GraphBatch,
        pos: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Channel-major twin of :meth:`score_from_cond` (same parameters,
        same math): every pair-resident tensor is ``[B, C, N*N]`` with the
        large pair axis minor instead of ``[B, N, N, C]``.

        Why: on TPU HBM arrays pad the minor dim to 128 lanes and elementwise
        ops run one lane per minor element, so the feature-minor layout at
        C=32 wastes 4x bandwidth AND computes at 25% VPU lane utilization —
        the sampler device trace shows two such fusions carrying 58% of the
        PC chain.  ``cond`` must come from ``precompute_conditioning(...,
        layout="channel")``."""
        h = self.hidden_dim
        b, n = batch.num_graphs, batch.n_max
        nn_ = n * n
        pair_mask = cond["pair_mask"]
        edge2d_cm = cond["edge_attr_2d"]  # [B, H, N*N]
        assert edge2d_cm.ndim == 3, "cond must be precomputed with layout='channel'"
        pos3 = pos.reshape(b, n, 3)

        # frame planes natively pair-flattened [B, N*N]: zero lane padding
        # for the whole frame pipeline and its backward (the [B, N, N] form
        # runs the ~15 planes at 25% lane utilization), and no relayout
        # copies at the GFP boundary
        basis, (c0, c2), (pseudo_sin, pseudo_cos) = dense_frames_flat(pos3)

        w_coff = jax.lax.stop_gradient(self.coff_fourier_W)
        wm, bm = self.coff_mlp()
        cdt = jnp.bfloat16 if self.score_dtype == "bfloat16" else jnp.float32

        # GFP sin/cos ONCE, on coff_s only.  dense_frames symmetry under the
        # s<->d pair swap: diff flips sign, cross flips sign, vert is even,
        # so coff_d = pair-transpose(coff_s) with component 0 negated.  GFP
        # embeds components 0 and 2, hence embed_d = pair-transpose of the
        # SAME sin/cos slab pushed through coff_mlp with the sin(c0) weight
        # block negated (sin odd, cos even).  Halves the chain's dominant
        # transcendental cost (device trace: 444us/step of sine fusions).
        e0 = gaussian_fourier_projection_cm(c0, w_coff)
        e2 = gaussian_fourier_projection_cm(c2, w_coff)
        full = jnp.concatenate([e0, e2], axis=1).astype(cdt)  # [B, 4h, NN]
        wm_c = wm.astype(cdt)      # rows: [sin0 | cos0 | sin2 | cos2]
        wm_neg = jnp.concatenate([-wm_c[:h], wm_c[h:]], axis=0)
        bm_c = bm.astype(cdt)[None, :, None]
        embed_s = jnp.einsum("bcp,co->bop", full, wm_c) + bm_c
        embed_d = (jnp.einsum("bcp,co->bop", full, wm_neg)
                   ).reshape(b, h, n, n).swapaxes(2, 3).reshape(b, h, nn_) \
            + bm_c
        edge_embed = jnp.concatenate(
            [pseudo_sin[:, None, :].astype(cdt),
             pseudo_cos[:, None, :].astype(cdt), embed_s, embed_d],
            axis=1)
        frame_inv = self.project(edge_embed, channel_major=True)

        if self.variant == 2:
            # componentwise pair distances, natively flat (repeat = source
            # index p // N, tile = dest index p % N — broadcasts, fused)
            sq = sum((jnp.repeat(pos3[..., k], n, axis=1)
                      - jnp.tile(pos3[..., k], (1, n))) ** 2
                     for k in range(3))
            dist = jnp.sqrt(sq + _SQRT_GUARD)
            w_dist = jax.lax.stop_gradient(self.dist_fourier_W)
            dist_emb = gaussian_fourier_projection_cm(dist, w_dist)
            dist_inv = self.input_mlp(dist_emb, channel_major=True)
            edge_attr = dist_inv * edge2d_cm + frame_inv
        else:
            edge_attr = edge2d_cm + frame_inv
        edge_attr = edge_attr * pair_mask.reshape(b, 1, nn_)

        out = self.score_network(
            cond["node_attr"], edge_attr, pair_mask, basis, deterministic,
            channel_major=True)
        return out["gradient"].reshape(b * n, 3)

    def score_from_cond_fused(
        self,
        cond: Dict[str, jnp.ndarray],
        batch: GraphBatch,
        pos: jnp.ndarray,
    ) -> jnp.ndarray:
        """Position-dependent half as ONE fused Pallas kernel
        (ops/score_kernel.py): frames + Fourier features + 4 GAT layers +
        basis mixing, VMEM-resident per molecule tile.  Forward-only —
        samplers use it (they never differentiate the score); training and
        autodiff go through :meth:`score_from_cond`."""
        from moleculesde_tpu.ops.score_kernel import (
            pack_score_params, score_eval_fused)

        if self.short_cut or self.concat_hidden:
            return self.score_from_cond(cond, batch, pos, True)
        b, n = batch.num_graphs, batch.n_max
        kvariant = 2 if self.variant == 2 else 1
        packed = pack_score_params(self.variables["params"], kvariant)
        out = score_eval_fused(
            pos.reshape(b, n, 3), cond["node_attr"],
            cond["edge_attr_2d"].astype(jnp.float32), cond["pair_mask"],
            packed, variant=kvariant,
            bf16=(self.score_dtype == "bfloat16"),
            interpret=(jax.default_backend() != "tpu"))
        return out.reshape(b * n, 3)

    def _score_output(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        pos: jnp.ndarray,
        deterministic: bool,
        use_running_average: bool,
    ) -> jnp.ndarray:
        """Shared feature pipeline + score network -> raw gradient [N_nodes, 3]."""
        cm = self.loss_layout == "channel"
        cond = self.precompute_conditioning(
            node_2d_repr, batch, use_running_average,
            layout="channel" if cm else "feature")
        if cm:
            return self.score_from_cond_cm(cond, batch, pos, deterministic)
        return self.score_from_cond(cond, batch, pos, deterministic)

    def __call__(self, node_2d_repr, batch, key, anneal_power=0.0,
                 deterministic=False, use_running_average=False):
        return self.loss(node_2d_repr, batch, key, anneal_power,
                         deterministic, use_running_average)

    def loss(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        key: jax.Array,
        anneal_power: float = 0.0,
        deterministic: bool = False,
        use_running_average: bool = False,
    ):
        """Denoising score-matching loss (ref SDE_model_2D_to_3D.py:306-391)."""
        sde = self.sde_pos
        n_steps = self.num_diffusion_timesteps
        pos = batch.positions
        node2graph = batch.node2graph()
        b = batch.num_graphs

        k_noise, k_t = jax.random.split(key)
        pos_noise = jax.random.normal(k_noise, pos.shape)

        # antithetic discrete timesteps (ref l.321-322)
        half = jax.random.randint(k_t, (b // 2 + 1,), 0, n_steps)
        time_step = jnp.concatenate([half, n_steps - half - 1])[:b]
        time_step = time_step / n_steps * (1 - EPSILON) + EPSILON
        t_pos = time_step[node2graph]

        mean_pos, std_pos = sde.marginal_prob(pos, t_pos)
        pos_perturbed = mean_pos + std_pos[:, None] * pos_noise

        scores = self._score_output(
            node_2d_repr, batch, pos_perturbed, deterministic, use_running_average)

        if anneal_power == 0.0:
            loss_pos = jnp.sum((scores - pos_noise) ** 2, axis=-1)
        else:
            loss_pos = jnp.sum(
                (scores - pos_noise) ** 2 * (std_pos ** anneal_power)[:, None], axis=-1)
        loss_pos = masked_segment_mean(loss_pos, node2graph, b, batch.node_mask)
        return {"position": loss_pos.mean()}

    def get_score(
        self,
        node_2d_repr: jnp.ndarray,
        batch: GraphBatch,
        pos_perturbed: jnp.ndarray,
        t_pos: jnp.ndarray,
    ) -> jnp.ndarray:
        """Score for reverse-SDE sampling: -net(x_t)/std(t)
        (ref SDE_model_2D_to_3D.py:393-445).  Eval mode (no dropout, running
        BN statistics)."""
        out = self._score_output(
            node_2d_repr, batch, pos_perturbed,
            deterministic=True, use_running_average=True)
        _, std_pos = self.sde_pos.marginal_prob(pos_perturbed, t_pos)
        return -out / std_pos[:, None]
