"""Fully-fused q/k attention bank (rejected; ops/rejected/attn_qk_bank.py)
validated against
the stacked-einsum XLA formulation it replaces (reference
edge_network_dense.py:48-79 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.ops.rejected.attn_qk_bank import attn_qk_bank


@pytest.fixture(scope="module")
def operands():
    key = jax.random.PRNGKey(11)
    b, n, f, c, a = 4, 8, 12, 3, 8
    ks = jax.random.split(key, 9)
    qk = jax.random.normal(ks[0], (b, n, f))
    mk = lambda i, shape: jax.random.normal(ks[i], shape) * 0.4
    return (qk, mk(1, (c, f, a)), mk(2, (c, a)), mk(3, (c, a, a)),
            mk(4, (c, a)), mk(5, (c, f, a)), mk(6, (c, a)),
            mk(7, (c, a, a)), mk(8, (c, a)))


def test_attn_qk_bank_matches_xla(operands):
    for ds in (2, 4):
        out_xla = attn_qk_bank(*operands, ds, impl="xla")
        out_pls = attn_qk_bank(*operands, ds, impl="pallas_interpret")
        assert out_xla.shape == (4, 3, 8, 8)
        np.testing.assert_allclose(np.asarray(out_pls), np.asarray(out_xla),
                                   atol=1e-5, rtol=1e-5)


def test_attn_qk_bank_grads_match_xla(operands):
    def grads(impl):
        def f(*args):
            out = attn_qk_bank(*args, 4, impl=impl)
            w = jnp.arange(out.size).reshape(out.shape) / out.size
            return jnp.sum(out * w)
        return jax.grad(f, argnums=tuple(range(9)))(*operands)

    for g_ref, g_k in zip(grads("xla"), grads("pallas_interpret")):
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                                   atol=2e-4, rtol=2e-4)


def test_attn_qk_bank_bf16_close(operands):
    out_f32 = attn_qk_bank(*operands, 4, impl="pallas_interpret")
    out_bf = attn_qk_bank(*operands, 4, bf16=True, impl="pallas_interpret")
    assert float(jnp.max(jnp.abs(out_bf - out_f32))) < 3e-2


def test_score_3d2d_fused_attn_agrees():
    """SDEModel3Dto2D loss identical under the default and fused-interpret
    attention banks — same parameter tree."""
    from moleculesde_tpu.data.synthetic import synthetic_batch
    from moleculesde_tpu.models import SDEModel3Dto2D

    batch = synthetic_batch(num_graphs=4, n_max=8, seed=1)
    key = jax.random.PRNGKey(0)
    emb = 16
    node_3d = jax.random.normal(jax.random.fold_in(key, 2),
                                (batch.num_nodes, emb))
    losses = {}
    variables = None
    for impl in ("xla", "fused_interpret"):
        model = SDEModel3Dto2D(dim3d=emb, nhid=8, num_layers=2, variant=1,
                               bf16_attn=False, attn_impl=impl)
        if variables is None:
            variables = model.init(key, node_3d, batch, key,
                                   method=SDEModel3Dto2D.loss)
        lx, ladj = model.apply(variables, node_3d, batch, key,
                               method=SDEModel3Dto2D.loss)
        losses[impl] = (float(lx), float(ladj))
    np.testing.assert_allclose(losses["fused_interpret"], losses["xla"],
                               rtol=1e-5)
