"""Fused GIN message kernel (ops/gin_messages.py) validated against the
one-hot-einsum formulation it replaces (reference
molecule_gnn_model.py:13-32 message semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.ops.gin_messages import gin_messages


@pytest.fixture(scope="module")
def operands():
    key = jax.random.PRNGKey(5)
    b, n, e, d, f = 4, 8, 16, 6, 12
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, n, f))
    src = jax.random.randint(ks[1], (b, e), 0, n + 1)  # n == masked slot
    dst = jax.random.randint(ks[2], (b, e), 0, n + 1)
    boh = jax.nn.one_hot(jax.random.randint(ks[3], (b, e), 0, d), d)
    tbl = jax.random.normal(jax.random.fold_in(key, 9), (d, f)) * 0.5
    return x, src, dst, boh, tbl


def test_gin_messages_pallas_matches_xla(operands):
    out_xla = gin_messages(*operands, bf16=False, impl="xla")
    out_pls = gin_messages(*operands, bf16=False, impl="pallas_interpret")
    assert out_xla.shape == (4, 8, 12)
    np.testing.assert_allclose(np.asarray(out_pls), np.asarray(out_xla),
                               atol=1e-5, rtol=1e-5)


def test_gin_messages_masked_edges_contribute_zero(operands):
    x, src, dst, boh, tbl = operands
    n = x.shape[1]
    out_all_masked = gin_messages(x, jnp.full_like(src, n),
                                  jnp.full_like(dst, n), boh, tbl,
                                  bf16=False, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_all_masked), 0.0, atol=1e-6)


def test_gin_messages_grads_match_xla(operands):
    x, src, dst, boh, tbl = operands

    def grads(impl):
        def f(x_, tbl_):
            out = gin_messages(x_, src, dst, boh, tbl_, bf16=False,
                               impl=impl)
            w = jnp.arange(out.size).reshape(out.shape) / out.size
            return jnp.sum(out * w)
        return jax.grad(f, argnums=(0, 1))(x, tbl)

    for g_ref, g_k in zip(grads("xla"), grads("pallas_interpret")):
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                                   atol=2e-4, rtol=2e-4)


def test_gnn2d_msg_impls_agree():
    """GNN2D forward identical under the XLA and (interpreted) fused
    message block — same parameter tree."""
    from moleculesde_tpu.data.synthetic import synthetic_batch
    from moleculesde_tpu.models.gnn2d import GNN2D

    batch = synthetic_batch(num_graphs=4, n_max=8, seed=2)
    key = jax.random.PRNGKey(0)
    outs = {}
    variables = None
    for impl in ("xla", "pallas_interpret"):
        model = GNN2D(num_layers=2, emb_dim=16, msg_impl=impl)
        if variables is None:
            variables = model.init(key, batch)
        outs[impl] = model.apply(
            variables, batch, deterministic=True,
            use_running_average=False, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(outs["pallas_interpret"]),
                               np.asarray(outs["xla"]), atol=1e-5, rtol=1e-4)
