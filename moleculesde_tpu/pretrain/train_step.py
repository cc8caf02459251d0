"""The jitted joint pretraining step — one XLA program per step.

Equivalent of the reference training inner loop (reference
examples/pretrain_MoleculeSDE.py:106-156): 2D GIN forward, 3D SchNet/PaiNN
forward, dual contrastive loss, 2D->3D score-matching loss, 3D->2D dense
node/adj score-matching loss, one Adam update — but fused into a single
compiled step with explicit PRNG-key plumbing and donated state buffers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.models import SDEModel2Dto3D, SDEModel3Dto2D
from moleculesde_tpu.pretrain.contrastive import dual_cl
from moleculesde_tpu.pretrain.train_state import (
    PretrainConfig,
    PretrainState,
    make_optimizer,
)


def _split_rows(x, nb: int, k: int, shards: int = 1):
    """Split a flat per-graph-row array ([nb * rows_per_graph, ...]) into
    ``k`` chunks with the SAME (chunk, device)-block membership as
    :func:`split_microbatches` (see its ``shards`` note)."""
    per = x.shape[0] // nb
    mb = nb // k
    if shards == 1:
        return x.reshape((k, mb * per) + x.shape[1:])
    mp = mb // shards
    y = x.reshape((shards, k, mp * per) + x.shape[1:])
    return jnp.swapaxes(y, 0, 1).reshape((k, mb * per) + x.shape[1:])


def _unsplit_rows(y, nb: int, k: int, shards: int = 1):
    """Inverse of :func:`_split_rows`: [k, mb*per, ...] -> [nb*per, ...]
    (used to reassemble per-chunk encoder cotangents into full-batch rows)."""
    mb = nb // k
    per = y.shape[1] // mb
    if shards == 1:
        return y.reshape((k * mb * per,) + y.shape[2:])
    mp = mb // shards
    z = y.reshape((k, shards, mp * per) + y.shape[2:])
    return jnp.swapaxes(z, 0, 1).reshape((nb * per,) + y.shape[2:])


def make_pretrain_loss(models: Dict[str, Any], cfg: PretrainConfig,
                       shards: int = 1):
    """The joint pretraining loss (contrastive + both score-matching terms).

    Factored out of :func:`make_pretrain_step` so the gradient-accumulating
    microbatch path can be verified against per-chunk calls in tests.

    With ``cfg.microbatch_scope == "score"`` (and ``cfg.microbatch`` set)
    only the two SDE score losses run chunked — a ``jax.checkpoint``-ed
    ``lax.scan`` over ``B/mb`` conditioning/batch chunks INSIDE the loss —
    while the encoders and the contrastive term see the full batch.  The
    round-4 VMEM-residency cliff (README "Batch scaling") is a property of
    the score models' [B, N, N, C] pair fusions alone: the encoders' pair
    tensors live inside tiled Pallas kernels (cfconv / gin_messages) that
    are batch-size-indifferent, so chunking them too (scope "step") only
    halves their dot sizes and doubles their op count.  Autodiff through
    the scan accumulates the encoder cotangents across chunks; the
    checkpoint keeps each chunk's pair tensors out of the saved-residual
    set (recomputed in the VMEM regime on the backward pass)."""

    def _score_losses_scanned(params, batch_stats23, batch, node_2d, node_3d,
                              k_23, k_32, k_drop, k: int):
        chunks = split_microbatches(batch, k, shards)
        nb = batch.num_graphs
        n2 = _split_rows(node_2d, nb, k, shards)
        n3 = _split_rows(node_3d, nb, k, shards)

        def body(carry, xs):
            bs23, acc23, acc32 = carry
            chunk, c2, c3, i = xs
            out23, mut23 = models["SDE_2Dto3D_model"].apply(
                {"params": params["SDE_2Dto3D_model"], "batch_stats": bs23},
                c2, chunk, jax.random.fold_in(k_23, i), cfg.anneal_power,
                deterministic=False, use_running_average=False,
                rngs={"dropout": jax.random.fold_in(k_drop, i)},
                mutable=["batch_stats"], method=SDEModel2Dto3D.loss)
            loss_x, loss_adj = models["SDE_3Dto2D_model"].apply(
                {"params": params["SDE_3Dto2D_model"]},
                c3, chunk, jax.random.fold_in(k_32, i), cfg.anneal_power,
                cfg.reduce_mean, method=SDEModel3Dto2D.loss)
            return (mut23["batch_stats"], acc23 + out23["position"],
                    acc32 + 0.5 * (loss_x + loss_adj)), None

        (bs23, l23, l32), _ = jax.lax.scan(
            jax.checkpoint(body),
            (batch_stats23, jnp.zeros(()), jnp.zeros(())),
            (chunks, n2, n3, jnp.arange(k)))
        return l23 / k, l32 / k, bs23

    def loss_fn(params, batch_stats, batch: GraphBatch, key: jax.Array,
                coeff_contrastive: jnp.ndarray):
        k_drop, k_cl, k_23, k_32 = jax.random.split(key, 4)

        node_2d, mut2d = models["model_2D"].apply(
            {"params": params["model_2D"], "batch_stats": batch_stats["model_2D"]},
            batch, deterministic=False, use_running_average=False,
            rngs={"dropout": k_drop}, mutable=["batch_stats"])

        _, node_3d = models["model_3D"].apply(
            {"params": params["model_3D"]},
            batch.atomic_numbers, batch.positions, batch.node_mask,
            batch.num_graphs, batch.n_max)

        metrics = {}
        total = 0.0

        cl_loss, cl_acc = dual_cl(
            node_2d, node_3d, k_cl,
            metric=cfg.cl_similarity_metric, T=cfg.T,
            neg_samples=cfg.cl_neg_samples, mask=batch.node_mask,
            normalize=cfg.normalize)
        total = total + coeff_contrastive * cl_loss
        metrics["CL_loss"] = cl_loss
        metrics["CL_acc"] = cl_acc

        mb = cfg.microbatch if cfg.microbatch_scope == "score" else 0
        if (mb and batch.num_graphs > mb and batch.num_graphs % mb == 0
                and cfg.coeff_generative_2dto3d > 0
                and cfg.coeff_generative_3dto2d > 0):
            loss_23, loss_32, bs23 = _score_losses_scanned(
                params, batch_stats["SDE_2Dto3D_model"], batch,
                node_2d, node_3d, k_23, k_32, k_drop,
                batch.num_graphs // mb)
            total = (total + cfg.coeff_generative_2dto3d * loss_23
                     + cfg.coeff_generative_3dto2d * loss_32)
            metrics["SDE_loss_2Dto3D"] = loss_23
            metrics["SDE_loss_3Dto2D"] = loss_32
            metrics["loss"] = total
            return total, (metrics, {"model_2D": mut2d["batch_stats"],
                                     "SDE_2Dto3D_model": bs23})

        if cfg.coeff_generative_2dto3d > 0:
            out23, mut23 = models["SDE_2Dto3D_model"].apply(
                {"params": params["SDE_2Dto3D_model"],
                 "batch_stats": batch_stats["SDE_2Dto3D_model"]},
                node_2d, batch, k_23, cfg.anneal_power,
                deterministic=False, use_running_average=False,
                rngs={"dropout": k_drop}, mutable=["batch_stats"],
                method=SDEModel2Dto3D.loss)
            loss_23 = out23["position"]
            total = total + cfg.coeff_generative_2dto3d * loss_23
            metrics["SDE_loss_2Dto3D"] = loss_23
        else:
            mut23 = {"batch_stats": batch_stats["SDE_2Dto3D_model"]}
            metrics["SDE_loss_2Dto3D"] = jnp.zeros(())

        if cfg.coeff_generative_3dto2d > 0:
            loss_x, loss_adj = models["SDE_3Dto2D_model"].apply(
                {"params": params["SDE_3Dto2D_model"]},
                node_3d, batch, k_32, cfg.anneal_power, cfg.reduce_mean,
                method=SDEModel3Dto2D.loss)
            loss_32 = 0.5 * (loss_x + loss_adj)
            total = total + cfg.coeff_generative_3dto2d * loss_32
            metrics["SDE_loss_3Dto2D"] = loss_32
        else:
            metrics["SDE_loss_3Dto2D"] = jnp.zeros(())

        new_batch_stats = {
            "model_2D": mut2d["batch_stats"],
            "SDE_2Dto3D_model": mut23["batch_stats"],
        }
        metrics["loss"] = total
        return total, (metrics, new_batch_stats)

    return loss_fn


def make_pretrain_grads_spliced(models: Dict[str, Any], cfg: PretrainConfig,
                                shards: int = 1):
    """Score-scope microbatch gradients WITHOUT remat — a manual VJP splice.

    ``microbatch_scope='score'`` chunks only the SDE losses but pays for it
    with ``jax.checkpoint`` on the scan body: every chunk's score forward
    runs TWICE (the scan carries residuals across iterations otherwise).
    This variant splices the backward by hand so nothing recomputes:

      1. encoders forward ONCE at full batch through ``jax.vjp`` (their
         residuals are small — the pair tensors live inside tiled Pallas
         kernels);
      2. contrastive term + its (node_2d, node_3d) cotangents via ``jax.vjp``;
      3. a ``lax.scan`` over B/mb chunks runs ``value_and_grad`` of the two
         SDE losses wrt (SDE params, node_2d chunk, node_3d chunk) — grad
         INSIDE the body, so residuals never cross iterations and no
         checkpoint is needed;
      4. the averaged chunk cotangents reassemble (``_unsplit_rows``) into
         full-batch node cotangents and flow through the encoder VJPs once.

    Identical semantics to scope='score' (same per-chunk fold_in noise,
    sequential SDE batch-stats, same loss weighting) with one fewer score
    forward per chunk; parity is tested in tests/test_microbatch.py."""

    def grads_fn(params, batch_stats, batch: GraphBatch, key: jax.Array,
                 coeff_contrastive: jnp.ndarray, k: int):
        k_drop, k_cl, k_23, k_32 = jax.random.split(key, 4)
        nb = batch.num_graphs

        def enc2d(p2d):
            node_2d, mut = models["model_2D"].apply(
                {"params": p2d, "batch_stats": batch_stats["model_2D"]},
                batch, deterministic=False, use_running_average=False,
                rngs={"dropout": k_drop}, mutable=["batch_stats"])
            return node_2d, mut["batch_stats"]

        node_2d, vjp_2d, bs2d = jax.vjp(enc2d, params["model_2D"],
                                        has_aux=True)

        def enc3d(p3d):
            _, node_3d = models["model_3D"].apply(
                {"params": p3d}, batch.atomic_numbers, batch.positions,
                batch.node_mask, batch.num_graphs, batch.n_max)
            return node_3d

        node_3d, vjp_3d = jax.vjp(enc3d, params["model_3D"])

        def cl_fn(n2, n3):
            cl_loss, cl_acc = dual_cl(
                n2, n3, k_cl, metric=cfg.cl_similarity_metric, T=cfg.T,
                neg_samples=cfg.cl_neg_samples, mask=batch.node_mask,
                normalize=cfg.normalize)
            return coeff_contrastive * cl_loss, (cl_loss, cl_acc)

        cl_term, vjp_cl, (cl_loss, cl_acc) = jax.vjp(
            cl_fn, node_2d, node_3d, has_aux=True)
        g_n2, g_n3 = vjp_cl(jnp.ones(()))

        chunks = split_microbatches(batch, k, shards)
        n2c = _split_rows(node_2d, nb, k, shards)
        n3c = _split_rows(node_3d, nb, k, shards)
        p_sde = {"SDE_2Dto3D_model": params["SDE_2Dto3D_model"],
                 "SDE_3Dto2D_model": params["SDE_3Dto2D_model"]}

        def chunk_loss(p, bs23, chunk, c2, c3, i):
            out23, mut23 = models["SDE_2Dto3D_model"].apply(
                {"params": p["SDE_2Dto3D_model"], "batch_stats": bs23},
                c2, chunk, jax.random.fold_in(k_23, i), cfg.anneal_power,
                deterministic=False, use_running_average=False,
                rngs={"dropout": jax.random.fold_in(k_drop, i)},
                mutable=["batch_stats"], method=SDEModel2Dto3D.loss)
            loss_x, loss_adj = models["SDE_3Dto2D_model"].apply(
                {"params": p["SDE_3Dto2D_model"]},
                c3, chunk, jax.random.fold_in(k_32, i), cfg.anneal_power,
                cfg.reduce_mean, method=SDEModel3Dto2D.loss)
            l23 = out23["position"]
            l32 = 0.5 * (loss_x + loss_adj)
            total = (cfg.coeff_generative_2dto3d * l23
                     + cfg.coeff_generative_3dto2d * l32)
            return total, (mut23["batch_stats"], l23, l32)

        gfn = jax.value_and_grad(chunk_loss, argnums=(0, 3, 4), has_aux=True)

        def body(carry, xs):
            bs23, gacc, l23a, l32a = carry
            chunk, c2, c3, i = xs
            (_, (bs23n, l23, l32)), (gp, gc2, gc3) = gfn(
                p_sde, bs23, chunk, c2, c3, i)
            gacc = jax.tree_util.tree_map(lambda a, g: a + g, gacc, gp)
            return (bs23n, gacc, l23a + l23, l32a + l32), (gc2, gc3)

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, p_sde)
        (bs23, g_sde, l23s, l32s), (g2s, g3s) = jax.lax.scan(
            body,
            (batch_stats["SDE_2Dto3D_model"], zeros_g,
             jnp.zeros(()), jnp.zeros(())),
            (chunks, n2c, n3c, jnp.arange(k)))
        inv = 1.0 / k
        g_sde = jax.tree_util.tree_map(lambda g: g * inv, g_sde)
        loss_23, loss_32 = l23s * inv, l32s * inv

        g_n2 = g_n2 + _unsplit_rows(g2s, nb, k, shards) * inv
        g_n3 = g_n3 + _unsplit_rows(g3s, nb, k, shards) * inv
        (g_p2d,) = vjp_2d(g_n2)
        (g_p3d,) = vjp_3d(g_n3)

        grads = {"model_2D": g_p2d, "model_3D": g_p3d, **g_sde}
        total = (cl_term + cfg.coeff_generative_2dto3d * loss_23
                 + cfg.coeff_generative_3dto2d * loss_32)
        metrics = {"CL_loss": cl_loss, "CL_acc": cl_acc,
                   "SDE_loss_2Dto3D": loss_23, "SDE_loss_3Dto2D": loss_32,
                   "loss": total}
        new_bs = {"model_2D": bs2d, "SDE_2Dto3D_model": bs23}
        return grads, metrics, new_bs

    return grads_fn


def split_microbatches(batch, k: int, shards: int = 1):
    """Split a batch into ``k`` equal leading-axis chunks (a pytree whose
    array leaves gain a leading ``k`` axis; static fields keep per-chunk
    values).

    CompactBatch carries graph-LOCAL indices and ``[B, ...]`` arrays only, so
    the split is a pure reshape.  GraphBatch flattens nodes/edges as
    ``b * n_max + i``, so the four edge endpoint arrays are shifted to
    chunk-local node numbering.  Padded edges point at GLOBAL node 0 (the
    core/batch.py collation contract), which goes negative after the shift;
    clamping at 0 restores the same "padded edges point at row 0" invariant
    inside every chunk (they are masked by ``edge_mask`` regardless).

    ``shards`` makes the split data-parallel-friendly: with the batch's
    leading axis sharded over ``shards`` mesh devices, chunk ``j`` takes each
    device's ``j``-th local block (reshape keeps the device axis OUTERMOST,
    so the scan axis ends up unsharded and every device contributes
    ``mb/shards`` molecules to every chunk).  A contiguous split would shard
    the scan axis instead — each scan iteration would then run on a fraction
    of the mesh while the rest idles.  ``shards=1`` is the single-device
    contiguous split."""
    from moleculesde_tpu.data.compact import CompactBatch

    nb = batch.num_graphs
    mb = nb // k
    if mb % shards:
        raise ValueError(
            f"microbatch {mb} not divisible by mesh size {shards}")
    mp = mb // shards  # graphs per (chunk, device) block

    def split(x):
        if shards == 1:
            return x.reshape((k, x.shape[0] // k) + x.shape[1:])
        per = x.shape[0] // nb  # rows per graph (1, n_max, e_max, ...)
        y = x.reshape((shards, k, mp * per) + x.shape[1:])
        return jnp.swapaxes(y, 0, 1).reshape((k, mb * per) + x.shape[1:])

    if isinstance(batch, CompactBatch):
        return jax.tree_util.tree_map(split, batch).replace(num_graphs=mb)

    # node-row base of (chunk j, device d)'s first graph MINUS its chunk-local
    # row: graph i of that block is global d*(nb/shards) + j*mp + i at
    # chunk-local d*mp + i.  shards=1 reduces to the contiguous j*mb shift.
    base = ((jnp.arange(k)[:, None] * mp
             + jnp.arange(shards)[None, :] * (nb // shards - mp))
            * batch.n_max)                                # [k, shards]

    def split_shift(x):
        per = x.shape[0] // nb
        y = x.reshape(shards, k, mp * per)
        y = jnp.swapaxes(y, 0, 1)                         # [k, shards, ...]
        y = jnp.maximum(y - base[:, :, None].astype(x.dtype), 0)
        return y.reshape(k, mb * per)

    chunked = jax.tree_util.tree_map(split, batch)
    shifted = {
        name: split_shift(getattr(batch, name))
        for name in ("edge_src", "edge_dst", "ext_src", "ext_dst")
        if getattr(batch, name) is not None
    }
    return chunked.replace(num_graphs=mb, **shifted)


def make_pretrain_step(
    models: Dict[str, Any], cfg: PretrainConfig, jit: bool = True,
    shards: int = 1,
) -> Callable[[PretrainState, GraphBatch, jax.Array, jnp.ndarray],
              Tuple[PretrainState, Dict[str, jnp.ndarray]]]:
    """Build the train step.  ``coeff_contrastive`` is passed at call time as
    a traced scalar so the contrastive warm-skip (reference
    pretrain_MoleculeSDE.py:339-344) does not trigger recompilation.

    With ``cfg.microbatch = m`` and a batch of ``B > m`` molecules the step
    runs as a ``lax.scan`` over ``B / m`` chunks, averaging gradients and
    metrics and applying ONE optimizer update — the VMEM-residency fix for
    the inverted batch-scaling curve (round-4 trace analysis, README "Batch
    scaling"): XLA's alternate-memory pass keeps the score models' 16 MB
    pair tensors VMEM-resident at batch 256 but spills them to HBM at 1024+,
    where the same fusions run 9-17x slower for 4x the bytes.  Chunking
    keeps every microbatch inside the VMEM regime.  Semantics match
    standard gradient accumulation: BN batch stats update sequentially per
    chunk, and each chunk draws its own fold_in(key, chunk) noise.

    ``shards`` (the mesh size when the step runs data-parallel, see
    make_sharded_pretrain_step) selects the shard-aligned chunk layout of
    :func:`split_microbatches` so the accumulation scan stays unsharded and
    every device contributes to every chunk."""
    tx = make_optimizer(cfg)
    loss_fn = make_pretrain_loss(models, cfg, shards)
    spliced_fn = (make_pretrain_grads_spliced(models, cfg, shards)
                  if cfg.microbatch_scope == "splice" else None)

    def accumulate(state: PretrainState, batch, key, coeff_contrastive, k):
        from moleculesde_tpu.data.compact import CompactBatch, expand_on_device

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        chunks = split_microbatches(batch, k, shards)
        compact = isinstance(batch, CompactBatch)

        def body(carry, xs):
            bs, grads_acc, metrics_acc = carry
            chunk, i = xs
            if compact:
                chunk = expand_on_device(chunk)
            (_, (metrics, new_bs)), grads = grad_fn(
                state.params, bs, chunk, jax.random.fold_in(key, i),
                coeff_contrastive)
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g, grads_acc, grads)
            metrics_acc = jax.tree_util.tree_map(
                lambda a, m: a + m, metrics_acc, metrics)
            return (new_bs, grads_acc, metrics_acc), None

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zeros_m = {name: jnp.zeros(()) for name in (
            "CL_loss", "CL_acc", "SDE_loss_2Dto3D", "SDE_loss_3Dto2D",
            "loss")}
        (new_bs, grads, metrics), _ = jax.lax.scan(
            body, (state.batch_stats, zeros_g, zeros_m),
            (chunks, jnp.arange(k)),
            # straight-line the accumulation when the chunk count is tiny:
            # at k=2 the while-loop per-iteration boundary (carry copies +
            # no cross-chunk scheduling) costs more than the code-size win,
            # and unrolling lets XLA overlap chunk i's backward with chunk
            # i+1's forward
            unroll=k if k <= int(cfg.microbatch_unroll) else 1)
        inv = 1.0 / k
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
        return grads, metrics, new_bs

    def step_fn(state: PretrainState, batch, key: jax.Array,
                coeff_contrastive: jnp.ndarray):
        # Compact ingest: the batch arrives as minimal host arrays and is
        # featurized on device inside this same program (data/compact.py) —
        # the type dispatch is resolved at trace time.
        from moleculesde_tpu.data.compact import CompactBatch, expand_on_device

        # derive this step's randomness inside the program: callers pass the
        # SAME base key every step, so the training loop dispatches exactly
        # one device program per step (a separate host-side random.split is a
        # tiny extra program whose dispatch latency dominates on remote TPUs)
        key = jax.random.fold_in(key, state.step)
        mb = cfg.microbatch if cfg.microbatch_scope == "step" else 0
        mb_splice = cfg.microbatch if cfg.microbatch_scope == "splice" else 0
        if mb and batch.num_graphs > mb and batch.num_graphs % mb == 0:
            grads, metrics, new_bs = accumulate(
                state, batch, key, coeff_contrastive, batch.num_graphs // mb)
        elif (mb_splice and batch.num_graphs > mb_splice
                and batch.num_graphs % mb_splice == 0
                and cfg.coeff_generative_2dto3d > 0
                and cfg.coeff_generative_3dto2d > 0):
            if isinstance(batch, CompactBatch):
                batch = expand_on_device(batch)
            grads, metrics, new_bs = spliced_fn(
                state.params, state.batch_stats, batch, key,
                coeff_contrastive, batch.num_graphs // mb_splice)
        else:
            if isinstance(batch, CompactBatch):
                batch = expand_on_device(batch)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (metrics, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, batch, key,
                coeff_contrastive)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1)
        return new_state, metrics

    if jit:
        return jax.jit(step_fn, donate_argnums=(0,))
    return step_fn
