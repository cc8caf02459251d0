"""Multi-head tanh attention-map bank for the 3D->2D score networks.

Computes, for every adjacency channel c (reference
Geom3D/models/MoleculeSDE/layers/edge_network_dense.py:66-79 — chunked
per-head query/key dots, tanh, then the head mean taken by the caller):

    a[b, c, n, m] = (1/H) * sum_h tanh( (q_h . k_h) / sqrt(ds) )

with ``q``/``k`` of shape ``[B, C, N, A]`` and heads taken as contiguous
``ds``-wide chunks of the feature axis (``H = A // ds``).

This module holds the PRODUCTION formulations ("xla" and the lane-exact
"wide" variant, the TPU default).  A fused Pallas kernel was measured and
REJECTED end-to-end (r3: 1.3x in-kernel win, -3.6 ms/step at its layout
boundary); it lives in ``ops.rejected.attn_bank`` as a validated opt-in
(``impl="pallas"`` lazy-imports it).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _attn_map_bank_xla(q, k, ds: int):
    """XLA formulation (also the CPU path): materialized per-head logits,
    tanh in the operand dtype, head mean accumulated in f32.

    Two formulations measured WORSE in the full step (r3 device traces,
    batch 256): (a) tanh(u).astype(f32).mean(...) writes and re-reads the
    [B, C, H, N, N] logits (4x lane-padded at N=32) in f32 — mean(...,
    dtype=f32) reads them at half the width; (b) a per-head loop over
    minor-dim operand slices avoids the logits tensor entirely but re-reads
    the full padded q/k per head and quadruples the cluster's op count
    (26.35 vs 25.82 ms/step end-to-end)."""
    b, c, n, a = q.shape
    h = a // ds
    qh = q.reshape(b, c, n, h, ds)
    kh = k.reshape(b, c, n, h, ds)
    u = jnp.einsum("bcnhd,bcmhd->bchnm", qh, kh) / jnp.asarray(
        math.sqrt(ds), q.dtype)
    return jnp.mean(jnp.tanh(u), axis=2, dtype=jnp.float32)


def _attn_map_bank_xla_wide(q, k, ds: int):
    """Lane-exact reformulation of the per-head logits.

    The standard XLA path materializes ``u`` as ``[B, C, H, N, N]`` whose
    minor dim N=32 lane-pads 4x (the r3 trace bills ~2.3 ms/step fwd+bwd to
    this cluster at batch 256).  Here the head axis is fused into the lane
    axis instead: one batched dot against a head-blocked key tensor yields
    ``u`` as ``[B, C, N, H*N]`` (minor 256 = two exact lanes, zero padding),
    tanh runs on the unpadded tensor, and the head mean is a tiny
    ``[H*N, N]`` selector matmul (MXU, f32 accumulation) — the same
    mean-via-matmul trick the score-kernel uses for row sums.

      kblk[b,c,a,h*N+m] = k[b,c,m,a] * (a // ds == h)
      u[b,c,n,h*N+m]    = sum_a q[b,c,n,a] kblk[b,c,a,h*N+m]
                        = q_h[b,c,n] . k_h[b,c,m]          (exact same math)

    The extra FLOPs (the dot contracts the full A axis per head instead of
    ds) are ~1 GFLOP at batch 256 — noise on the MXU; the traffic saving is
    the win.  Numerics match the standard path: logits and tanh in the
    operand dtype, head mean accumulated in f32.
    """
    b, c, n, a = q.shape
    h = a // ds
    kT = jnp.swapaxes(k, -1, -2)                       # [B, C, A, N]
    # tile along the minor axis (concat — no relayout), then zero the
    # off-head blocks with a constant [A, H*N] mask
    ktile = jnp.tile(kT, (1, 1, 1, h))                 # [B, C, A, H*N]
    lane = jnp.arange(h * n) // n                      # block index per lane
    blk = (jnp.arange(a)[:, None] // ds == lane[None, :]).astype(q.dtype)
    u = jnp.einsum("bcna,bcaz->bcnz", q, ktile * blk) / jnp.asarray(
        math.sqrt(ds), q.dtype)
    t = jnp.tanh(u)
    sel = jnp.tile(jnp.eye(n, dtype=q.dtype), (h, 1)) / jnp.asarray(
        h, q.dtype)                                    # [H*N, N]
    return jax.lax.dot_general(
        t, sel, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [B, C, N, N] f32


def attn_map_bank(
    q: jnp.ndarray,
    k: jnp.ndarray,
    ds: int,
    *,
    bf16: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Head-mean tanh attention maps ``[B, C, N, N]`` (f32) from per-channel
    q/k ``[B, C, N, A]``; heads are ds-wide feature chunks.

    ``impl``: "auto" | "wide" | "xla" | "pallas" | "pallas_interpret".
    "auto" resolves to "wide" on TPU and "xla" elsewhere — the measured
    end-to-end result.  The pallas impls live in ``ops.rejected.attn_bank``
    (measured-and-rejected; kept as a validated opt-in).  ``bf16`` runs the
    q/k dots in bfloat16 (tanh and the accumulation stay f32).
    """
    q = jnp.asarray(q)
    k = jnp.asarray(k)
    if impl == "auto":
        # "wide" measured 23.4 -> 22.2 ms/step on the full batch-256 pretrain
        # step (v5e-1, r3 ab_step.py) by keeping the per-head logits lane
        # exact; on CPU the standard form avoids the tile/selector overhead
        impl = "wide" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        dt = jnp.bfloat16 if bf16 else jnp.float32
        return _attn_map_bank_xla(q.astype(dt), k.astype(dt), ds)
    if impl == "wide":
        dt = jnp.bfloat16 if bf16 else jnp.float32
        return _attn_map_bank_xla_wide(q.astype(dt), k.astype(dt), ds)
    if impl in ("pallas", "pallas_interpret"):
        from moleculesde_tpu.ops.rejected.attn_bank import attn_map_bank_pallas
        # keep the caller's storage dtype (bf16 on the production path):
        # casting to f32 at this boundary materializes convert-copies around
        # every kernel call; in-kernel accumulation is f32 regardless
        dt = jnp.bfloat16 if bf16 else jnp.float32
        return attn_map_bank_pallas(q.astype(dt), k.astype(dt), ds, bf16,
                                    impl == "pallas_interpret")
    raise ValueError(f"unknown attn_map_bank impl: {impl}")
