"""Fused score-evaluation kernel (ops/score_kernel.py) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel2Dto3D
from moleculesde_tpu.ops.score_kernel import pack_score_params, score_eval_fused


def _setup(variant, b=4, n=8, emb=16, h=8, seed=0):
    batch = synthetic_batch(num_graphs=b, n_max=n, seed=seed)
    key = jax.random.PRNGKey(seed)
    node_2d = jax.random.normal(key, (batch.num_nodes, emb))
    model = SDEModel2Dto3D(emb_dim=emb, hidden_dim=h, variant=variant)
    v = model.init({"params": key, "dropout": key}, node_2d, batch, key,
                   method=SDEModel2Dto3D.loss)
    v = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    cond = model.apply(v, node_2d, batch, True,
                       method=SDEModel2Dto3D.precompute_conditioning)
    pos = batch.positions + 0.05 * jax.random.normal(key, batch.positions.shape)
    return model, v, cond, batch, pos


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_fused_kernel_matches_xla(variant):
    model, v, cond, batch, pos = _setup(variant)
    b, n = batch.num_graphs, batch.n_max
    ref = np.asarray(model.apply(v, cond, batch, pos,
                                 method=SDEModel2Dto3D.score_from_cond))
    kvariant = 2 if variant == 2 else 1
    packed = pack_score_params(v["params"], kvariant)
    got = np.asarray(score_eval_fused(
        pos.reshape(b, n, 3), cond["node_attr"], cond["edge_attr_2d"],
        cond["pair_mask"], packed, variant=kvariant,
        interpret=True)).reshape(b * n, 3)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err


def test_fused_kernel_bf16_close():
    model, v, cond, batch, pos = _setup(1)
    b, n = batch.num_graphs, batch.n_max
    ref = np.asarray(model.apply(v, cond, batch, pos,
                                 method=SDEModel2Dto3D.score_from_cond))
    packed = pack_score_params(v["params"], 1)
    got = np.asarray(score_eval_fused(
        pos.reshape(b, n, 3), cond["node_attr"], cond["edge_attr_2d"],
        cond["pair_mask"], packed, variant=1, bf16=True,
        interpret=True)).reshape(b * n, 3)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.06, err


def test_score_from_cond_fused_method_on_cpu_interprets():
    """The model method routes to the interpreted kernel off-TPU and agrees
    with the XLA path, so the sampler's fused branch is testable anywhere."""
    model, v, cond, batch, pos = _setup(2)
    ref = np.asarray(model.apply(v, cond, batch, pos,
                                 method=SDEModel2Dto3D.score_from_cond))
    got = np.asarray(model.apply(v, cond, batch, pos,
                                 method=SDEModel2Dto3D.score_from_cond_fused))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err


def test_sampler_fused_flag_matches_xla_sampler():
    """sample_positions_pc(fused=True) (interpreted kernel on CPU) equals the
    XLA sampler bit-for-bit in distribution-relevant terms (same PRNG)."""
    from moleculesde_tpu.sampling import sample_positions_pc

    model, v, cond, batch, pos = _setup(1)
    key = jax.random.PRNGKey(3)
    node_2d = jnp.zeros((batch.num_nodes, 16))
    out_x = sample_positions_pc(model, v, node_2d, batch, key, n_steps=5,
                                fused=False)
    out_f = sample_positions_pc(model, v, node_2d, batch, key, n_steps=5,
                                fused=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-4, rtol=1e-3)
