"""Fully-fused Pallas TPU kernel for one 2D->3D score evaluation (sampling).

The reverse-SDE PC sampler calls the score network ``2 * corrector_steps * N``
times per chain (reference pretrain_MoleculeSDE_inference_2D_to_3D_VE_VP.py:
92-212).  As XLA programs, each evaluation is ~40 medium fusions whose
``[B, N, N, {32,128}]`` pair intermediates bounce through HBM — device traces
(benchmarks/trace_sampler.py) show the chain is bandwidth/latency bound, not
FLOP bound.  At molecular sizes (N<=64) an entire evaluation fits in VMEM, so
this kernel runs the whole pipeline — frame construction (score_2d3d.py::
dense_frames), Gaussian-Fourier coefficient embeddings, the projection MLP,
four DenseGAT attention layers and both basis-mixing modules (reference
equivariant_scorenetwork.py:121-169) — for a tile of molecules in one grid
step, touching HBM only for the inputs and the [B, N, 3] output.

Forward-only by design: sampling never differentiates the score, and the
training loss keeps the XLA path (which has the fused pair kernel + remat of
ops/pair_block.py).  Numerics: matmuls optionally run in bf16 (the sampler's
``--sampler_precision``); frame geometry, softmax and LayerNorm statistics
stay f32.  Validated against the XLA implementation in interpret mode
(tests/test_score_kernel.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moleculesde_tpu.ops.common import EPSILON

_SQRT_GUARD = 1e-24


# ---------------------------------------------------------------------------
# parameter packing: flax param tree -> flat tuple with a static layout
# ---------------------------------------------------------------------------


def pack_score_params(params: Dict[str, Any], variant: int,
                      num_layers: int = 2, num_convs: int = 2,
                      n_head: int = 8):
    """Flatten the SDEModel2Dto3D params needed by the kernel into an
    ordered tuple of arrays.  Every vector is stored as a [1, len] matrix —
    Mosaic gives 1-D refs replicated-lane layouts that fail to relayout.
    Also appends static selector constants (head selector, its transpose,
    ones, component one-hots) used by the all-heads attention and basis
    mixing formulations.  Layout must match ``_unpack``."""
    p = params
    sn = p["score_network"]

    def row(v):
        return jnp.asarray(v, jnp.float32).reshape(1, -1)

    flat: List[jnp.ndarray] = [
        row(p["coff_fourier_W"]),                  # [1, h]
        p["coff_mlp"]["kernel"], row(p["coff_mlp"]["bias"]),
        p["project"]["Dense_0"]["kernel"], row(p["project"]["Dense_0"]["bias"]),
        p["project"]["Dense_1"]["kernel"], row(p["project"]["Dense_1"]["bias"]),
    ]
    if variant == 2:
        flat += [row(p["dist_fourier_W"]),
                 p["input_mlp"]["Dense_0"]["kernel"],
                 row(p["input_mlp"]["Dense_0"]["bias"])]
    for li in range(num_layers * num_convs):
        g = sn[f"DenseGATLayer_{li}"]
        flat += [
            g["lin_query"]["kernel"], row(g["lin_query"]["bias"]),
            g["lin_key"]["kernel"], row(g["lin_key"]["bias"]),
            g["lin_value"]["kernel"], row(g["lin_value"]["bias"]),
            g["lin_edge"]["kernel"], row(g["lin_edge"]["bias"]),
            g["lin_skip"]["kernel"], row(g["lin_skip"]["bias"]),
            g["Dense_0"]["kernel"], row(g["Dense_0"]["bias"]),
            g["Dense_1"]["kernel"], row(g["Dense_1"]["bias"]),
            row(g["LayerNorm_0"]["scale"]), row(g["LayerNorm_0"]["bias"]),
            row(g["LayerNorm_1"]["scale"]), row(g["LayerNorm_1"]["bias"]),
        ]
    for m in range(num_layers):
        wo = jnp.asarray(sn[f"basis_out_{m}"]["kernel"], jnp.float32)
        bo = jnp.asarray(sn[f"basis_out_{m}"]["bias"], jnp.float32)
        # pad the [coff_dim, 3] output projection to 8 zero-filled columns so
        # the dot keeps a tile-able minor dim and cols 3..7 vanish
        wo = jnp.pad(wo, ((0, 0), (0, 8 - wo.shape[1])))
        bo = jnp.pad(bo, (0, 8 - bo.shape[0]))
        flat += [
            sn[f"basis_node_{m}"]["kernel"],
            sn[f"basis_edge_{m}"]["kernel"], row(sn[f"basis_edge_{m}"]["bias"]),
            wo, row(bo),
        ]
    # static selectors
    hdim = p["coff_mlp"]["kernel"].shape[1]
    c_head = hdim // n_head
    sel = jnp.zeros((hdim, 8), jnp.float32)
    for hh in range(n_head):
        sel = sel.at[hh * c_head:(hh + 1) * c_head, hh].set(1.0)
    flat += [sel, sel.T,                      # [H, 8], [8, H]
             jnp.ones((8, 8), jnp.float32)]   # row-sum matmul
    eye8 = jnp.eye(8, dtype=jnp.float32)
    flat += [eye8[k].reshape(1, 8) for k in range(3)]  # component one-hots
    return tuple(jnp.asarray(w, jnp.float32) for w in flat)


def _unpack(ws, variant, num_layers, num_convs):
    it = iter(ws)

    def take(n):
        return [next(it) for _ in range(n)]

    out = {"coff_W": next(it)}
    out["coff_mlp"] = take(2)
    out["proj1"] = take(2)
    out["proj2"] = take(2)
    if variant == 2:
        out["dist_W"] = next(it)
        out["input_mlp"] = take(2)
    out["gat"] = [take(18) for _ in range(num_layers * num_convs)]
    out["basis"] = [take(5) for _ in range(num_layers)]
    out["sel"], out["selT"], out["ones8"] = take(3)
    out["eyes"] = take(3)
    return out


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _layernorm(x, scale, bias):
    """LayerNorm over the minor axis, statistics in f32 (flax semantics)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale + bias).astype(x.dtype)


def _kernel(pos_ref, node_ref, edge2d_ref, mask_ref, *w_refs,
            out_ref, variant, num_layers, num_convs, n_head, bf16):
    ws = _unpack([r[...] for r in w_refs], variant, num_layers, num_convs)
    cdt = jnp.bfloat16 if bf16 else jnp.float32

    pos = pos_ref[...]          # [TB, N, 3] f32
    node_attr = node_ref[...]   # [TB, N, H]
    edge2d = edge2d_ref[...]    # [TB, N, N, H]
    maskf = mask_ref[...]       # [TB, N, N] f32
    tb, n, hdim = node_attr.shape

    # ---- frames: component planes [TB, N, N] (score_2d3d.dense_frames) ----
    comps = [pos[..., k] for k in range(3)]
    ps = [c[:, :, None] for c in comps]
    pd = [c[:, None, :] for c in comps]
    diff = [a - b for a, b in zip(ps, pd)]
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
        return (diff[0] * r[0] + diff[1] * r[1] + diff[2] * r[2],
                jnp.abs(cross[0] * r[0] + cross[1] * r[1] + cross[2] * r[2]),
                vert[0] * r[0] + vert[1] * r[1] + vert[2] * r[2])

    coff_s = proj(ps)
    coff_d = proj(pd)
    dot = sum(a * b for a, b in zip(coff_s, coff_d))
    pseudo_cos = dot / (_norm3(coff_s) + EPSILON) / (_norm3(coff_d) + EPSILON)
    pseudo_sin = jnp.sqrt(jnp.clip(1.0 - pseudo_cos ** 2, 1e-12))

    # ---- invariant edge features -----------------------------------------
    # coff_embed(c) = [sin/cos GFP of c0 | sin/cos GFP of c2] @ W_mlp + b.
    # W_mlp [4h, h] splits into four [h, h] row blocks so the concat is
    # never materialized.
    w_c = ws["coff_W"] * (2.0 * math.pi)  # [1, h]
    wm, bm = ws["coff_mlp"]
    h = hdim
    blocks = [wm[i * h:(i + 1) * h].astype(cdt) for i in range(4)]

    def mm(a2, w):  # [rows, k] @ [k, m] in the compute dtype, f32 out
        return jax.lax.dot_general(
            a2.astype(cdt), w.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    flat = tb * n * n

    def pairh(plane, w_row):
        # [TB, N, N] x [1, h] -> [flat, h] (2-D weights only: 1-D refs get
        # replicated-lane layouts Mosaic cannot relayout)
        return (plane[..., None] * w_row[None]).reshape(flat, w_row.shape[-1])

    def coff_embed(coff):
        p0 = pairh(coff[0], w_c)  # [flat, h]
        p2 = pairh(coff[2], w_c)
        acc = mm(jnp.sin(p0), blocks[0])
        acc += mm(jnp.cos(p0), blocks[1])
        acc += mm(jnp.sin(p2), blocks[2])
        acc += mm(jnp.cos(p2), blocks[3])
        return acc + bm  # [flat, h] f32

    embed_s = coff_embed(coff_s)
    embed_d = coff_embed(coff_d)

    # project MLP on concat([sin, cos, embed_s, embed_d]) without the concat:
    # W1 [2h+2, h] rows 0/1 multiply the pseudo angle, the rest split s/d.
    w1, b1 = ws["proj1"]
    w2, b2 = ws["proj2"]
    pre = (pairh(pseudo_sin, w1[0:1])
           + pairh(pseudo_cos, w1[1:2])
           + mm(embed_s, w1[2:2 + h]) + mm(embed_d, w1[2 + h:]) + b1)
    frame_inv = mm(jax.nn.silu(pre), w2) + b2  # [flat, h] f32

    if variant == 2:
        sq = sum((c[:, :, None] - c[:, None, :]) ** 2 for c in comps)
        dist = jnp.sqrt(sq + _SQRT_GUARD)
        w_d = ws["dist_W"] * (2.0 * math.pi)
        wi, bi = ws["input_mlp"]
        half = wi.shape[0] // 2
        dp = pairh(dist, w_d)
        # input_mlp is a single Linear: MLP([h]) applies no activation
        # (reference layers/common.py:31-40 activates only BETWEEN layers)
        dist_inv = mm(jnp.sin(dp), wi[:half]) + mm(jnp.cos(dp), wi[half:]) + bi
        edge_attr = dist_inv * edge2d.reshape(flat, h) + frame_inv
    else:
        edge_attr = edge2d.reshape(flat, h) + frame_inv
    edge_attr = (edge_attr.reshape(tb, n, n, h) * maskf[..., None]
                 ).reshape(flat, h)
    edge_attr = edge_attr.astype(cdt)

    # ---- score network ----------------------------------------------------
    scale = 1.0 / math.sqrt(float(hdim // n_head))
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    sel, selT, ones8 = ws["sel"], ws["selT"], ws["ones8"]
    # fold the EquiLayer mean into the mask (no per-dest division later)
    count_k = jnp.maximum(maskf.sum(axis=1, keepdims=True), 1.0)  # [TB,1,N]
    maskn = maskf / count_k

    def bc_pair(t3, axis):
        # [TB, N, H] broadcast over sources (axis=1) or dests (axis=2)
        if axis == 1:
            t4 = jnp.broadcast_to(t3[:, None, :, :], (tb, n, n, hdim))
        else:
            t4 = jnp.broadcast_to(t3[:, :, None, :], (tb, n, n, hdim))
        return t4.reshape(flat, hdim)

    x = node_attr.astype(cdt)  # [TB, N, H]
    grad8 = jnp.zeros((tb, n, 8), jnp.float32)  # cols 0..2 = x/y/z
    li = 0
    for m in range(num_layers):
        for conv in range(num_convs):
            (wq, bq, wk, bk, wv, bv, we_, be_, wsk, bsk,
             wf1, bf1, wf2, bf2, s1, o1, s2, o2) = ws["gat"][li]
            li += 1
            x2 = x.reshape(tb * n, hdim)
            q3 = (mm(x2, wq) + bq).reshape(tb, n, hdim)
            k3 = (mm(x2, wk) + bk).reshape(tb, n, hdim)
            v3 = (mm(x2, wv) + bv).reshape(tb, n, hdim)
            e2 = mm(edge_attr, we_) + be_  # [flat, H] f32

            # ALL-heads attention: logits for the 8 heads in one [flat, 8]
            # matmul with the head-selector (no per-head slicing -- Mosaic
            # rejects minor-dim indexing/reduction of 4-D tiles)
            q_pair = bc_pair(q3, 1)  # q at the destination, bcast over s
            k_pair = bc_pair(k3, 2)  # k at the source, bcast over d
            ke = (k_pair + e2) * q_pair
            logits8 = mm(ke, sel) * scale                # [flat, 8]
            l4 = logits8.reshape(tb, n, n, 8)
            l4 = jnp.where(maskf[..., None] > 0, l4, neg)
            mx = l4.max(axis=1, keepdims=True)
            ex = jnp.exp(l4 - mx)
            alpha = ex / jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-30)
            alpha = alpha * maskf[..., None]             # [TB, s, d, 8] f32
            # expand head weights back to channels and aggregate messages:
            # out[d, C] = sum_s alpha[s, d, head(C)] * (v[s, C] + e[s, d, C])
            alpha_full = mm(alpha.reshape(flat, 8), selT)  # [flat, H]
            msg = (alpha_full * (bc_pair(v3, 2) + e2)).reshape(
                tb, n, n, hdim).sum(axis=1)              # [TB, d, H] f32

            mha = msg + (mm(x2, wsk) + bsk).reshape(tb, n, hdim)
            x = x + _layernorm(mha.astype(cdt), s1, o1)
            ffn = jax.nn.silu(mm(x.reshape(tb * n, hdim), wf1) + bf1)
            ffn = (mm(ffn.astype(cdt), wf2) + bf2).reshape(tb, n, hdim)
            x = x + _layernorm(ffn.astype(cdt), s2, o2)
            if conv < num_convs - 1:
                # silu on a bf16 operand trips a Mosaic verifier bug
                # (f32 constant broadcast into a bf16 vector); keep it f32
                x = jax.nn.silu(x.astype(jnp.float32))
            x = x.astype(cdt)

        # basis module m: dynamic coefficients cc [flat, 8] (cols 0..2 live,
        # 3..7 zero via the padded wo); per component, the basis planes embed
        # into 8-col space with one-hot rows, a row-sum matmul replaces the
        # (unsupported) minor reduction, and the normalized mask folds in the
        # EquiLayer mean before the source-sum.  The 128-wide coff slab is
        # processed in channel chunks (silu is elementwise, the wo contraction
        # is additive across chunks) so large batch tiles stay within VMEM.
        wh, wbe, bbe, wo, bo = ws["basis"][m]
        cdim = wh.shape[1]
        chunk = min(64, cdim)
        cc = jnp.zeros((flat, 8), jnp.float32) + bo
        for c0_ in range(0, cdim, chunk):
            csl = slice(c0_, c0_ + chunk)
            hp = mm(x.reshape(tb * n, hdim), wh[:, csl]).reshape(tb, n, chunk)
            ep = mm(edge_attr, wbe[:, csl]) + bbe[:, csl]          # [flat,ch]
            coff = jax.nn.silu(hp[:, :, None, :] + hp[:, None, :, :]
                               + ep.reshape(tb, n, n, chunk))
            cc = cc + mm(coff.reshape(flat, chunk), wo[csl])       # [flat, 8]
        e0, e1, e2_ = ws["eyes"]
        for comp, bx in enumerate(zip(diff, cross, vert)):
            b8 = (bx[0][..., None] * e0[None] + bx[1][..., None] * e1[None]
                  + bx[2][..., None] * e2_[None]).reshape(flat, 8)
            rows = mm(cc * b8, ones8)                  # [flat, 8] = row sums
            contrib = (rows.reshape(tb, n, n, 8)
                       * maskn[..., None]).sum(axis=1)  # [TB, d, 8]
            sel_c = ws["eyes"][comp]
            grad8 = grad8 + contrib * sel_c[None]

    out_ref[...] = grad8  # [TB, N, 8]


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


def _pick_tb(b: int, n: int, budget_bytes: int = 9 * 1024 * 1024) -> int:
    # measured VMEM footprint ~4.5 MB per batch-tile unit at N=32 (chunked
    # basis slabs + pair-H tensors + Mosaic's own scratch); TB=4 OOMs the
    # 16 MB scoped limit, so N=32 lands on TB=2
    per = n * n * 32 * 4 * 35
    tb = max(1, budget_bytes // per)
    tb = min(tb, b)
    while b % tb:
        tb -= 1
    return tb


@functools.partial(
    jax.jit, static_argnames=("variant", "num_layers", "num_convs", "n_head",
                              "bf16", "interpret"))
def score_eval_fused(
    pos3: jnp.ndarray,          # [B, N, 3] f32
    node_attr: jnp.ndarray,     # [B, N, H] f32
    edge_attr_2d: jnp.ndarray,  # [B, N, N, H] f32
    pair_mask: jnp.ndarray,     # [B, N, N] bool
    packed_params: Tuple[jnp.ndarray, ...],
    *,
    variant: int = 1,
    num_layers: int = 2,
    num_convs: int = 2,
    n_head: int = 8,
    bf16: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused score evaluation -> raw gradient [B, N, 3] (f32)."""
    b, n, hdim = node_attr.shape
    tb = _pick_tb(b, n)
    maskf = pair_mask.astype(jnp.float32)

    kern = functools.partial(
        _kernel, variant=variant, num_layers=num_layers,
        num_convs=num_convs, n_head=n_head, bf16=bf16)
    n_in = 4 + len(packed_params)

    def body(*refs):
        kern(*refs[:n_in], out_ref=refs[n_in])

    tile = lambda *shape: pl.BlockSpec(  # noqa: E731
        (tb,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in packed_params
    ]
    g8 = pl.pallas_call(
        body,
        grid=(b // tb,),
        in_specs=[tile(n, 3), tile(n, hdim), tile(n, n, hdim), tile(n, n)]
        + w_specs,
        out_specs=tile(n, 8),
        out_shape=jax.ShapeDtypeStruct((b, n, 8), jnp.float32),
        interpret=interpret,
    )(pos3.astype(jnp.float32), node_attr.astype(jnp.float32),
      edge_attr_2d.astype(jnp.float32), maskf, *packed_params)
    return g8[:, :, :3]  # [B, N, 3]
