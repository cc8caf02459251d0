"""Fused GIN message block: edge gather + bond embedding + relu + aggregate
in one kernel, per-graph one-hots built in VMEM.

Reference semantics (Geom3D/models/molecule_gnn_model.py:13-32, the GINConv
message path; torch_scatter aggregation):

    agg[b, n, :] = sum_{e: dst_e = n} relu( x[b, src_e, :] + bond_emb_e )

The XLA formulation (core/segment.py one-hot matmuls) is already
scatter-free, but its three pieces schedule as separate dots whose operand
layouts disagree — the r3 device trace shows ~0.8 ms/step of ~20 MB
relayout copies of the [B, E, F] message tensor at batch 256 plus the
one-hot materializations.  Here the one-hots are rebuilt from the int edge
indices inside the kernel (iota compares — never touching HBM), the message
tensor lives only in VMEM, and the whole block is two batched MXU dots plus
an elementwise relu per tile.

Masked edges arrive with ``src/dst`` set to ``n`` (out of range), exactly
like the XLA path: their one-hot rows/columns are zero, so they gather
zeros and aggregate nothing.

Gradient support: x and the (concatenated) bond embedding table get real
gradients; the integer edge indices get float0 zeros; the bond one-hots are
constant selectors (zero cotangent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehots(src, dst, n: int, dt):
    tb, e = src.shape
    ar = jax.lax.broadcasted_iota(jnp.int32, (tb, e, n), 2)
    return ((ar == src[:, :, None]).astype(dt),
            (ar == dst[:, :, None]).astype(dt))


def _msg_parts(x_ref, src_ref, dst_ref, boh_ref, tbl_ref, *, bf16: bool):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    tb, n, f = x_ref.shape
    oh_s, oh_d = _onehots(src_ref[...], dst_ref[...], n, dt)
    x = x_ref[...].astype(dt)
    gather = jax.lax.dot_general(
        oh_s, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    boh = boh_ref[...].astype(dt)                    # [TB, E, D]
    emb = jax.lax.dot_general(
        boh, tbl_ref[...].astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pre = gather + emb                               # [TB, E, F] f32
    return oh_s, oh_d, boh, pre


def _fwd_kernel(x_ref, src_ref, dst_ref, boh_ref, tbl_ref, o_ref,
                *, bf16: bool):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    _, oh_d, _, pre = _msg_parts(x_ref, src_ref, dst_ref, boh_ref, tbl_ref,
                                 bf16=bf16)
    msg = jnp.maximum(pre, 0.0).astype(dt)
    o_ref[...] = jax.lax.dot_general(
        oh_d, msg, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _bwd_kernel(x_ref, src_ref, dst_ref, boh_ref, tbl_ref, g_ref,
                dx_ref, dtbl_ref, *, bf16: bool):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    tb, n, f = x_ref.shape
    oh_s, oh_d, boh, pre = _msg_parts(x_ref, src_ref, dst_ref, boh_ref,
                                      tbl_ref, bf16=bf16)
    g = g_ref[...].astype(dt)                        # [TB, N, F]
    # g_msg[b, e, :] = g[b, dst_e, :]
    g_msg = jax.lax.dot_general(
        oh_d, g, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dmsg = jnp.where(pre > 0.0, g_msg, 0.0).astype(dt)
    # dx[b, n, :] = sum_{e: src_e = n} dmsg[b, e, :]
    dx_ref[...] = jax.lax.dot_general(
        oh_s, dmsg, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    # dtable = sum over all (b, e): boh^T @ dmsg, accumulated across the grid
    d = boh.shape[-1]
    dtbl = jax.lax.dot_general(
        boh.reshape(tb * boh.shape[1], d),
        dmsg.reshape(tb * dmsg.shape[1], f),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtbl_ref[...] = dtbl

    @pl.when(pl.program_id(0) != 0)
    def _():
        dtbl_ref[...] += dtbl


def _pick_tb(b: int, cap: int) -> int:
    tb = max(1, min(cap, b))
    while b % tb:
        tb -= 1
    return tb


def _specs(tb, n, e, d, f):
    return [
        pl.BlockSpec((tb, n, f), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, e, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _fwd_call(x, src, dst, boh, tbl, *, bf16: bool, interpret: bool):
    b, n, f = x.shape
    e = src.shape[1]
    d = tbl.shape[0]
    tb = _pick_tb(b, 16)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bf16=bf16),
        grid=(b // tb,),
        in_specs=_specs(tb, n, e, d, f),
        out_specs=pl.BlockSpec((tb, n, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        interpret=interpret,
    )(x, src, dst, boh, tbl)


def _bwd_call(x, src, dst, boh, tbl, g, *, bf16: bool, interpret: bool):
    b, n, f = x.shape
    e = src.shape[1]
    d = tbl.shape[0]
    tb = _pick_tb(b, 8)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, bf16=bf16),
        grid=(b // tb,),
        in_specs=_specs(tb, n, e, d, f) + [
            pl.BlockSpec((tb, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, f), x.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
        ],
        interpret=interpret,
    )(x, src, dst, boh, tbl, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gin_messages_pallas(x, src, dst, boh, tbl, bf16: bool, interpret: bool):
    return _fwd_call(x, src, dst, boh, tbl, bf16=bf16, interpret=interpret)


def _rule_fwd(x, src, dst, boh, tbl, bf16, interpret):
    out = _fwd_call(x, src, dst, boh, tbl, bf16=bf16, interpret=interpret)
    return out, (x, src, dst, boh, tbl)


def _rule_bwd(bf16, interpret, res, g):
    x, src, dst, boh, tbl = res
    dx, dtbl = _bwd_call(x, src, dst, boh, tbl, g, bf16=bf16,
                         interpret=interpret)
    f0 = jax.dtypes.float0
    return (dx, np.zeros(src.shape, f0), np.zeros(dst.shape, f0),
            jnp.zeros_like(boh), dtbl)


_gin_messages_pallas.defvjp(_rule_fwd, _rule_bwd)


def _gin_messages_xla(x, src, dst, boh, tbl):
    b, n, f = x.shape
    e = src.shape[1]
    oh_s = (src[:, :, None] == jnp.arange(n)).astype(x.dtype)
    oh_d = (dst[:, :, None] == jnp.arange(n)).astype(x.dtype)
    gather = jnp.einsum("ben,bnf->bef", oh_s, x)
    emb = boh.astype(x.dtype) @ tbl.astype(x.dtype)
    msg = jax.nn.relu(gather + emb)
    return jnp.einsum("ben,bef->bnf", oh_d,
                      msg.astype(x.dtype)).astype(jnp.float32)


def gin_messages(
    x: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    bond_onehot: jnp.ndarray,
    table: jnp.ndarray,
    *,
    bf16: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Fused GIN message block (module docstring): returns [B, N, F] f32.

    ``x``: [B, N, F] node features; ``src``/``dst``: [B, E] int32 LOCAL
    edge endpoints with masked edges set to N; ``bond_onehot``: [B, E, D]
    concatenated bond-feature one-hots; ``table``: [D, F] row-stacked bond
    embedding tables.  ``impl``: "pallas" | "pallas_interpret" | "xla" |
    "auto" (kernel on TPU, XLA elsewhere).
    """
    dt = jnp.bfloat16 if bf16 else jnp.float32
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _gin_messages_xla(x.astype(dt), src.astype(jnp.int32),
                                 dst.astype(jnp.int32), bond_onehot, table)
    if impl in ("pallas", "pallas_interpret"):
        return _gin_messages_pallas(
            x.astype(dt), src.astype(jnp.int32), dst.astype(jnp.int32),
            bond_onehot.astype(dt), table.astype(jnp.float32),
            bf16, impl == "pallas_interpret")
    raise ValueError(f"unknown gin_messages impl: {impl}")
