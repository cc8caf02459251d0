"""Gradient-accumulating microbatch step (VMEM-residency fix for the
inverted batch-scaling curve; round-4 trace analysis in README "Batch
scaling") verified against explicit per-chunk gradient averaging.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.data.compact import expand_on_device
from moleculesde_tpu.data.synthetic import synthetic_batch, synthetic_compact_batch
from moleculesde_tpu.pretrain import PretrainConfig, create_pretrain_state
from moleculesde_tpu.pretrain.train_state import make_optimizer
from moleculesde_tpu.pretrain.train_step import (
    make_pretrain_loss,
    make_pretrain_step,
    split_microbatches,
)


def _cfg(mb=0):
    # full f32 so the scan-vs-eager comparison is tight (bf16 rounding under
    # different fusion orders gives ~3e-3 rel noise, swamping a real bug)
    return PretrainConfig(
        emb_dim=16, num_layer=2, dropout_ratio=0.0,
        schnet_num_filters=8, schnet_num_interactions=2,
        schnet_num_gaussians=10, hidden_dim_2dto3d=8, microbatch=mb,
        bf16_pairs=False, score_dtype_2dto3d="float32", schnet_bf16=False,
        gnn2d_bf16=False, bf16_attn_3dto2d=False)


def _expected_accumulation(models, cfg, state, batch, key, coeff, k):
    """Hand-rolled reference: average per-chunk grads/metrics with the
    batch-stats carried sequentially (the scan's exact contract)."""
    loss_fn = make_pretrain_loss(models, cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    chunks = split_microbatches(batch, k)
    step_key = jax.random.fold_in(key, int(state.step))
    bs = state.batch_stats
    grads_sum, metrics_sum = None, None
    for i in range(k):
        chunk = jax.tree_util.tree_map(lambda x: x[i], chunks)
        if hasattr(chunk, "edge_valid"):  # CompactBatch
            chunk = expand_on_device(chunk)
        (_, (metrics, bs)), grads = grad_fn(
            state.params, bs, chunk, jax.random.fold_in(step_key, i), coeff)
        add = lambda a, b: b if a is None else jax.tree_util.tree_map(
            jnp.add, a, b)
        grads_sum = add(grads_sum, grads)
        metrics_sum = add(metrics_sum, metrics)
    inv = 1.0 / k
    grads = jax.tree_util.tree_map(lambda g: g * inv, grads_sum)
    tx = make_optimizer(cfg)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics_sum)
    return params, bs, metrics


@pytest.mark.parametrize("compact", [True, False])
def test_microbatched_step_matches_manual_accumulation(compact):
    cfg = _cfg(mb=4)
    if compact:
        batch = synthetic_compact_batch(num_graphs=8, n_max=8, seed=3)
        init = expand_on_device(batch)
    else:
        batch = synthetic_batch(num_graphs=8, n_max=8, seed=3)
        init = batch
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, init, key)
    coeff = jnp.asarray(1.0)

    exp_params, exp_bs, exp_metrics = _expected_accumulation(
        models, cfg, state, batch, key, coeff, k=2)

    step = make_pretrain_step(models, cfg, jit=True)
    new_state, metrics = step(state, batch, key, coeff)
    assert int(new_state.step) == 1
    # rtol: the jitted scan fuses/reassociates float32 reductions differently
    # from the eager per-chunk loop (same class of mismatch as
    # tests/test_parallel.py:61-68, which uses the same tolerance)
    for name in ("loss", "CL_loss", "SDE_loss_2Dto3D", "SDE_loss_3Dto2D"):
        np.testing.assert_allclose(float(metrics[name]),
                                   float(exp_metrics[name]), rtol=1e-3)
    flat_a = jax.tree_util.tree_leaves(new_state.params)
    flat_b = jax.tree_util.tree_leaves(exp_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(exp_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_microbatch_disabled_when_batch_not_larger():
    """batch == microbatch takes the plain path (identical to microbatch=0)."""
    batch = synthetic_compact_batch(num_graphs=4, n_max=8, seed=5)
    key = jax.random.PRNGKey(1)
    cfg0, cfg4 = _cfg(0), _cfg(4)
    models, state0 = create_pretrain_state(cfg0, expand_on_device(batch), key)
    state4 = jax.tree_util.tree_map(jnp.copy, state0)
    s0, m0 = make_pretrain_step(models, cfg0)(state0, batch, key,
                                              jnp.asarray(1.0))
    s4, m4 = make_pretrain_step(models, cfg4)(state4, batch, key,
                                              jnp.asarray(1.0))
    np.testing.assert_allclose(float(m4["loss"]), float(m0["loss"]),
                               rtol=1e-6)


def test_split_microbatches_graphbatch_edge_shift():
    batch = synthetic_batch(num_graphs=6, n_max=8, seed=9)
    chunks = split_microbatches(batch, 3)
    assert chunks.num_graphs == 2
    # every chunk's edge endpoints index inside the chunk's node rows
    # (padded edges — which point at GLOBAL node 0 per the collation
    # contract — are clamped to chunk row 0)
    n_rows = 2 * batch.n_max
    for i in range(3):
        src = np.asarray(chunks.edge_src[i])
        assert src.min() >= 0 and src.max() < n_rows
        dst = np.asarray(chunks.edge_dst[i])
        assert dst.min() >= 0 and dst.max() < n_rows
    # chunk 0 equals the first third verbatim
    np.testing.assert_array_equal(np.asarray(chunks.edge_src[0]),
                                  np.asarray(batch.edge_src[: len(
                                      np.asarray(chunks.edge_src[0]))]))


def test_score_scope_microbatch_matches_manual():
    """microbatch_scope='score': encoders + CL at full batch, SDE losses
    scanned over chunks — verified against an explicit per-chunk evaluation
    with the same folded keys and sequential SDE batch stats."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(mb=4), microbatch_scope="score")
    batch = synthetic_batch(num_graphs=8, n_max=8, seed=4)
    key = jax.random.PRNGKey(2)
    models, state = create_pretrain_state(cfg, batch, key)
    coeff = jnp.asarray(1.0)

    loss_fn = make_pretrain_loss(models, cfg)
    step_key = jax.random.fold_in(key, 0)
    total, (metrics, new_bs) = jax.jit(loss_fn)(
        state.params, state.batch_stats, batch, step_key, coeff)

    # manual reference
    from moleculesde_tpu.models import SDEModel2Dto3D, SDEModel3Dto2D
    from moleculesde_tpu.pretrain.contrastive import dual_cl
    from moleculesde_tpu.pretrain.train_step import _split_rows

    k_drop, k_cl, k_23, k_32 = jax.random.split(step_key, 4)
    node_2d, _ = models["model_2D"].apply(
        {"params": state.params["model_2D"],
         "batch_stats": state.batch_stats["model_2D"]},
        batch, deterministic=False, use_running_average=False,
        rngs={"dropout": k_drop}, mutable=["batch_stats"])
    _, node_3d = models["model_3D"].apply(
        {"params": state.params["model_3D"]},
        batch.atomic_numbers, batch.positions, batch.node_mask,
        batch.num_graphs, batch.n_max)
    cl_loss, _ = dual_cl(node_2d, node_3d, k_cl,
                         metric=cfg.cl_similarity_metric, T=cfg.T,
                         neg_samples=cfg.cl_neg_samples,
                         mask=batch.node_mask, normalize=cfg.normalize)

    k = 2
    chunks = split_microbatches(batch, k)
    n2 = _split_rows(node_2d, 8, k)
    n3 = _split_rows(node_3d, 8, k)
    bs23 = state.batch_stats["SDE_2Dto3D_model"]
    l23 = l32 = 0.0
    for i in range(k):
        chunk = jax.tree_util.tree_map(lambda x: x[i], chunks)
        out23, mut23 = models["SDE_2Dto3D_model"].apply(
            {"params": state.params["SDE_2Dto3D_model"], "batch_stats": bs23},
            n2[i], chunk, jax.random.fold_in(k_23, i), cfg.anneal_power,
            deterministic=False, use_running_average=False,
            rngs={"dropout": jax.random.fold_in(k_drop, i)},
            mutable=["batch_stats"], method=SDEModel2Dto3D.loss)
        bs23 = mut23["batch_stats"]
        lx, ladj = models["SDE_3Dto2D_model"].apply(
            {"params": state.params["SDE_3Dto2D_model"]},
            n3[i], chunk, jax.random.fold_in(k_32, i), cfg.anneal_power,
            method=SDEModel3Dto2D.loss)
        l23 += float(out23["position"])
        l32 += float(0.5 * (lx + ladj))
    expect = float(cl_loss) + l23 / k + l32 / k
    np.testing.assert_allclose(float(total), expect, rtol=1e-3)
    np.testing.assert_allclose(float(metrics["SDE_loss_2Dto3D"]), l23 / k,
                               rtol=1e-3)

    # and the full jitted step runs + updates
    step = make_pretrain_step(models, cfg)
    new_state, m = step(state, batch, key, coeff)
    assert np.isfinite(float(m["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.parametrize("compact", [True, False])
def test_splice_scope_matches_score_scope(compact):
    """microbatch_scope='splice' (hand-spliced backward: encoder VJPs at
    full batch + grad-inside-scan SDE chunks) computes the SAME gradients
    as scope='score' (remat scan differentiated end to end) — identical
    per-chunk keys, loss weighting, and sequential SDE batch stats, so the
    post-step params must agree to float32 reassociation tolerance."""
    import dataclasses

    if compact:
        batch = synthetic_compact_batch(num_graphs=8, n_max=8, seed=6)
        init = expand_on_device(batch)
    else:
        batch = synthetic_batch(num_graphs=8, n_max=8, seed=6)
        init = batch
    key = jax.random.PRNGKey(3)
    coeff = jnp.asarray(1.0)

    states, metrics = {}, {}
    for scope in ("score", "splice"):
        cfg = dataclasses.replace(_cfg(mb=4), microbatch_scope=scope)
        models, state = create_pretrain_state(cfg, init, key)
        step = make_pretrain_step(models, cfg)
        new_state, m = step(state, batch, key, coeff)
        states[scope], metrics[scope] = new_state, m

    for name in ("loss", "CL_loss", "SDE_loss_2Dto3D", "SDE_loss_3Dto2D"):
        np.testing.assert_allclose(float(metrics["splice"][name]),
                                   float(metrics["score"][name]), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(states["splice"].params),
                    jax.tree_util.tree_leaves(states["score"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(states["splice"].batch_stats),
                    jax.tree_util.tree_leaves(states["score"].batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
