"""Fully-fused per-channel attention-map bank for the 3D->2D score networks:
q/k production AND head-mean tanh maps in one kernel.

Reference semantics (Geom3D/models/MoleculeSDE/layers/edge_network_dense.py:
48-79 — per-channel two-layer q/k nets with tanh after the first layer,
chunked-head dots, tanh, head mean):

    q_c = tanh(qk @ Wq1[c] + bq1[c]) @ Wq2[c] + bq2[c]        # [B, N, A]
    k_c = tanh(qk @ Wk1[c] + bk1[c]) @ Wk2[c] + bk2[c]
    a[b, c, n, m] = (1/H) sum_h tanh( (q_c,h[n] . k_c,h[m]) / sqrt(ds) )

Why fuse from the NODE features: the first fused-bank attempt
(ops/attn_bank.py, kernel retained as a negative result) consumed
already-materialized q/k ``[B, C, N, A]`` and lost 3.6 ms/step end-to-end
to boundary relayouts + lost producer fusion.  Here the kernel input is the
node-sized ``qk [B, N, F]`` (natural layout, ~10 MB at batch 256) and the
only pair-shaped HBM tensor is the output ``[B, C, N, N]`` — every q/k/
logits/tanh intermediate stays in VMEM.  The XLA cluster this replaces
(q/k einsums + logits + head mean, fwd+bwd) measures ~3.5 ms/step at batch
256 in the r3 device trace.

MEASURED OUTCOME (r3, v5e-1, batch 256, full pretrain step, device trace):
REJECTED — 28.0 ms/step vs 24.0 with the XLA bank.  The statically
unrolled channels x heads structure (C=8 x H=8 = 64 logits dots per grid
step, each a tiny [TB*N, 32]-operand MXU op, plus 3 more dots each in
backward) serializes on the MXU: the backward kernel alone runs 0.77 ms
per layer.  XLA's single ``bcnhd,bcmhd->bchnm`` einsum batches all 64
(c, h) pairs into ONE dot and wins despite materializing the lane-padded
logits.  Lesson recorded: VMEM-residency buys nothing when it turns one
large batched contraction into dozens of small sequential ones.  The
kernel stays as a validated opt-in (``attn_impl="fused"``); the default
("auto") is the XLA bank.

The symmetrization ``(a + a^T)/2`` and the V branch stay in XLA.

Custom VJP: backward recomputes q/k per channel from the saved node
features (nothing pair-shaped is saved) and emits real gradients for the
node features and all eight weight tensors.

Mosaic patterns per ops/pair_block.py / score_kernel.py: vector params as
2-D ``[C, A]``; head selection by iota lane masks (no minor-dim slicing);
leading-dim static indexing for per-channel weights (loop unrolled over the
small static C); weight-grad accumulation across the sequential grid via
``pl.when(program_id)``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_mask(a: int, lo: int, hi: int, dtype) -> jnp.ndarray:
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, a), 1)
    return ((lane >= lo) & (lane < hi)).astype(dtype)


def _qk_c(qk, w1, b1, w2, b2, dt):
    """One channel's two-layer net on [X, F] -> (t1 f32 [X, A], out f32
    [X, A]).  ``b1``/``b2`` arrive as [1, A] (Mosaic: no 1-D values)."""
    pre = jax.lax.dot_general(
        qk, w1.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1
    t1 = jnp.tanh(pre)
    out = jax.lax.dot_general(
        t1.astype(dt), w2.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2
    return t1, out


def _fwd_kernel(qk_ref, wq1_ref, bq1_ref, wq2_ref, bq2_ref,
                wk1_ref, bk1_ref, wk2_ref, bk2_ref, o_ref,
                *, ds: int, bf16: bool):
    tb, n, f = qk_ref.shape
    c_dim, _, a = wq1_ref.shape
    h = a // ds
    dt = jnp.bfloat16 if bf16 else jnp.float32
    inv = 1.0 / math.sqrt(ds)
    qk = qk_ref[...].reshape(tb * n, f).astype(dt)

    for c in range(c_dim):
        _, q = _qk_c(qk, wq1_ref[c], bq1_ref[c:c + 1, :],
                     wq2_ref[c], bq2_ref[c:c + 1, :], dt)
        _, k = _qk_c(qk, wk1_ref[c], bk1_ref[c:c + 1, :],
                     wk2_ref[c], bk2_ref[c:c + 1, :], dt)
        q3 = q.reshape(tb, n, a).astype(dt)
        k3 = k.reshape(tb, n, a).astype(dt)
        acc = jnp.zeros((tb, n, n), jnp.float32)
        for hh in range(h):
            m = _head_mask(a, hh * ds, (hh + 1) * ds, dt)
            u = jax.lax.dot_general(
                q3, k3 * m, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc = acc + jnp.tanh(u * inv)
        o_ref[:, c] = acc / h


def _bwd_kernel(qk_ref, wq1_ref, bq1_ref, wq2_ref, bq2_ref,
                wk1_ref, bk1_ref, wk2_ref, bk2_ref, g_ref,
                dqk_ref, dwq1_ref, dbq1_ref, dwq2_ref, dbq2_ref,
                dwk1_ref, dbk1_ref, dwk2_ref, dbk2_ref,
                *, ds: int, bf16: bool):
    tb, n, f = qk_ref.shape
    c_dim, _, a = wq1_ref.shape
    h = a // ds
    dt = jnp.bfloat16 if bf16 else jnp.float32
    inv = 1.0 / math.sqrt(ds)
    qk = qk_ref[...].reshape(tb * n, f).astype(dt)
    first = pl.program_id(0) == 0

    dqk = jnp.zeros((tb * n, f), jnp.float32)
    for c in range(c_dim):
        tq, q = _qk_c(qk, wq1_ref[c], bq1_ref[c:c + 1, :],
                      wq2_ref[c], bq2_ref[c:c + 1, :], dt)
        tk, k = _qk_c(qk, wk1_ref[c], bk1_ref[c:c + 1, :],
                      wk2_ref[c], bk2_ref[c:c + 1, :], dt)
        q3 = q.reshape(tb, n, a).astype(dt)
        k3 = k.reshape(tb, n, a).astype(dt)
        g = g_ref[:, c].astype(jnp.float32)           # [TB, N, N]
        dq3 = jnp.zeros((tb, n, a), jnp.float32)
        dk3 = jnp.zeros((tb, n, a), jnp.float32)
        for hh in range(h):
            m = _head_mask(a, hh * ds, (hh + 1) * ds, dt)
            kh = k3 * m
            u = jax.lax.dot_general(
                q3, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            t = jnp.tanh(u * inv)
            du = (g * (1.0 - t * t) * (inv / h)).astype(dt)
            dq3 = dq3 + jax.lax.dot_general(
                du, kh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dkh = jax.lax.dot_general(
                du, q3, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dk3 = dk3 + dkh * m.astype(jnp.float32)

        for (d3, t1, w1r, w2r, dw1r, db1r, dw2r, db2r) in (
            (dq3, tq, wq1_ref, wq2_ref, dwq1_ref, dbq1_ref, dwq2_ref,
             dbq2_ref),
            (dk3, tk, wk1_ref, wk2_ref, dwk1_ref, dbk1_ref, dwk2_ref,
             dbk2_ref),
        ):
            dout = d3.reshape(tb * n, a)
            doutl = dout.astype(dt)
            dw2 = jax.lax.dot_general(
                t1.astype(dt), doutl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db2 = dout.sum(axis=0)[None, :]
            dt1 = jax.lax.dot_general(
                doutl, w2r[c].astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dpre = dt1 * (1.0 - t1 * t1)
            dprel = dpre.astype(dt)
            dw1 = jax.lax.dot_general(
                qk, dprel, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db1 = dpre.sum(axis=0)[None, :]
            dqk = dqk + jax.lax.dot_general(
                dprel, w1r[c].astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(first)
            def _(dw1r=dw1r, db1r=db1r, dw2r=dw2r, db2r=db2r, c=c,
                  dw1=dw1, db1=db1, dw2=dw2, db2=db2):
                dw1r[c] = dw1
                db1r[c:c + 1, :] = db1
                dw2r[c] = dw2
                db2r[c:c + 1, :] = db2

            @pl.when(jnp.logical_not(first))
            def _(dw1r=dw1r, db1r=db1r, dw2r=dw2r, db2r=db2r, c=c,
                  dw1=dw1, db1=db1, dw2=dw2, db2=db2):
                dw1r[c] += dw1
                db1r[c:c + 1, :] += db1
                dw2r[c] += dw2
                db2r[c:c + 1, :] += db2

    dqk_ref[...] = dqk.reshape(tb, n, f).astype(dqk_ref.dtype)


def _pick_tb(b: int, cap: int) -> int:
    tb = max(1, min(cap, b))
    while b % tb:
        tb -= 1
    return tb


def _w_specs(c_dim, f, a):
    return [
        pl.BlockSpec((c_dim, f, a), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c_dim, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_dim, a, a), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c_dim, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _fwd_call(qk, ws, *, ds: int, bf16: bool, interpret: bool):
    b, n, f = qk.shape
    c_dim, _, a = ws[0].shape
    tb = _pick_tb(b, 16)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ds=ds, bf16=bf16),
        grid=(b // tb,),
        in_specs=[pl.BlockSpec((tb, n, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _w_specs(c_dim, f, a) + _w_specs(c_dim, f, a),
        out_specs=pl.BlockSpec((tb, c_dim, n, n), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_dim, n, n), jnp.float32),
        interpret=interpret,
    )(qk, *ws)


def _bwd_call(qk, ws, g, *, ds: int, bf16: bool, interpret: bool):
    b, n, f = qk.shape
    c_dim, _, a = ws[0].shape
    tb = _pick_tb(b, 8)
    w_shapes = [
        jax.ShapeDtypeStruct((c_dim, f, a), jnp.float32),
        jax.ShapeDtypeStruct((c_dim, a), jnp.float32),
        jax.ShapeDtypeStruct((c_dim, a, a), jnp.float32),
        jax.ShapeDtypeStruct((c_dim, a), jnp.float32),
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, ds=ds, bf16=bf16),
        grid=(b // tb,),
        in_specs=[pl.BlockSpec((tb, n, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _w_specs(c_dim, f, a) + _w_specs(c_dim, f, a)
        + [pl.BlockSpec((tb, c_dim, n, n), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((tb, n, f), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)]
        + _w_specs(c_dim, f, a) + _w_specs(c_dim, f, a),
        out_shape=[jax.ShapeDtypeStruct((b, n, f), qk.dtype)]
        + w_shapes + w_shapes,
        interpret=interpret,
    )(qk, *ws, g)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _attn_qk_bank_pallas(qk, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                         ds: int, bf16: bool, interpret: bool):
    return _fwd_call(qk, (wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2),
                     ds=ds, bf16=bf16, interpret=interpret)


def _rule_fwd(qk, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, ds, bf16,
              interpret):
    ws = (wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2)
    return _fwd_call(qk, ws, ds=ds, bf16=bf16, interpret=interpret), (qk, ws)


def _rule_bwd(ds, bf16, interpret, res, g):
    qk, ws = res
    outs = _bwd_call(qk, ws, g, ds=ds, bf16=bf16, interpret=interpret)
    return tuple(outs)


_attn_qk_bank_pallas.defvjp(_rule_fwd, _rule_bwd)


def _attn_qk_bank_xla(qk, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, ds, dt):
    """XLA formulation (also the CPU path): stacked-channel einsums +
    materialized per-head logits (the form this kernel replaces)."""
    q = jnp.tanh(jnp.einsum("bnf,cfa->bcna", qk.astype(dt), wq1.astype(dt))
                 + bq1.astype(dt)[None, :, None])
    q = jnp.einsum("bcna,cao->bcno", q, wq2.astype(dt)) \
        + bq2.astype(dt)[None, :, None]
    k = jnp.tanh(jnp.einsum("bnf,cfa->bcna", qk.astype(dt), wk1.astype(dt))
                 + bk1.astype(dt)[None, :, None])
    k = jnp.einsum("bcna,cao->bcno", k, wk2.astype(dt)) \
        + bk2.astype(dt)[None, :, None]
    b, c, n, a = q.shape
    h = a // ds
    qh = q.reshape(b, c, n, h, ds)
    kh = k.reshape(b, c, n, h, ds)
    u = jnp.einsum("bcnhd,bcmhd->bchnm", qh, kh) / jnp.asarray(
        math.sqrt(ds), q.dtype)
    return jnp.mean(jnp.tanh(u), axis=2, dtype=jnp.float32)


def attn_qk_bank(
    qk: jnp.ndarray,
    wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
    ds: int,
    *,
    bf16: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Per-channel q/k nets + head-mean tanh attention maps ``[B, C, N, N]``
    (f32) from node features ``qk [B, N, F]``.

    ``impl``: "pallas" | "pallas_interpret" | "xla" | "auto" (kernel on TPU,
    XLA elsewhere).  ``bf16`` runs all dots in bfloat16 (tanh and
    accumulation in f32).
    """
    dt = jnp.bfloat16 if bf16 else jnp.float32
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _attn_qk_bank_xla(qk, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
                                 ds, dt)
    if impl in ("pallas", "pallas_interpret"):
        f32 = jnp.float32
        return _attn_qk_bank_pallas(
            qk.astype(dt), wq1.astype(f32), bq1.astype(f32),
            wq2.astype(f32), bq2.astype(f32), wk1.astype(f32),
            bk1.astype(f32), wk2.astype(f32), bk2.astype(f32),
            ds, bf16, impl == "pallas_interpret")
    raise ValueError(f"unknown attn_qk_bank impl: {impl}")
