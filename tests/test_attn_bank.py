"""Attention-map bank implementations (live dispatcher ops/attn_maps.py;
rejected Pallas kernel ops/rejected/attn_bank.py) validated against the XLA
per-head einsum formulation it replaces (reference
edge_network_dense.py:66-79 semantics: chunked-head q/k dots -> tanh ->
head mean)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.ops.attn_maps import attn_map_bank


@pytest.fixture(scope="module")
def qk():
    key = jax.random.PRNGKey(3)
    b, c, n, a = 4, 3, 8, 16
    q = jax.random.normal(key, (b, c, n, a))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, c, n, a))
    return q, k


def test_attn_bank_pallas_matches_xla(qk):
    q, k = qk
    for ds in (2, 4):
        out_xla = attn_map_bank(q, k, ds, impl="xla")
        out_pls = attn_map_bank(q, k, ds, impl="pallas_interpret")
        assert out_xla.shape == (4, 3, 8, 8)
        np.testing.assert_allclose(np.asarray(out_pls), np.asarray(out_xla),
                                   atol=1e-5)


def test_attn_bank_wide_matches_xla(qk):
    """The lane-exact "wide" formulation (TPU default via impl="auto") is
    the same math as the standard per-head einsum path."""
    q, k = qk
    for ds in (2, 4):
        out_xla = attn_map_bank(q, k, ds, impl="xla")
        out_wide = attn_map_bank(q, k, ds, impl="wide")
        np.testing.assert_allclose(np.asarray(out_wide), np.asarray(out_xla),
                                   atol=1e-5)
    # and its autodiff (einsum VJP) agrees too
    def f(impl):
        def scalar(qq, kk):
            out = attn_map_bank(qq, kk, 4, impl=impl)
            w = jnp.arange(out.size).reshape(out.shape) / out.size
            return jnp.sum(out * w)
        return jax.grad(scalar, argnums=(0, 1))(q, k)
    for g_ref, g_w in zip(f("xla"), f("wide")):
        np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)


def test_attn_bank_grads_match_xla(qk):
    q, k = qk

    def scalar(impl):
        def f(qq, kk):
            out = attn_map_bank(qq, kk, 4, impl=impl)
            # asymmetric weighting so dq != dk trivially
            w = jnp.arange(out.size).reshape(out.shape) / out.size
            return jnp.sum(out * w)
        return jax.grad(f, argnums=(0, 1))(q, k)

    for g_ref, g_k in zip(scalar("xla"), scalar("pallas_interpret")):
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)


def test_attn_bank_bf16_close(qk):
    q, k = qk
    out_f32 = attn_map_bank(q, k, 4, impl="pallas_interpret")
    out_bf = attn_map_bank(q, k, 4, bf16=True, impl="pallas_interpret")
    # tanh is contraction-stable; bf16 dots stay within ~1% on tanh outputs
    assert float(jnp.max(jnp.abs(out_bf - out_f32))) < 3e-2


def test_score_3d2d_attn_impls_agree():
    """SDEModel3Dto2D loss is identical under the XLA and (interpreted)
    Pallas attention banks — same parameter tree."""
    from moleculesde_tpu.data.synthetic import synthetic_batch
    from moleculesde_tpu.models import SDEModel3Dto2D

    batch = synthetic_batch(num_graphs=4, n_max=8, seed=1)
    key = jax.random.PRNGKey(0)
    emb = 16
    node_3d = jax.random.normal(jax.random.fold_in(key, 2),
                                (batch.num_nodes, emb))
    losses = {}
    variables = None
    for impl in ("xla", "pallas_interpret"):
        model = SDEModel3Dto2D(dim3d=emb, nhid=8, num_layers=2, variant=1,
                               bf16_attn=False, attn_impl=impl)
        if variables is None:
            variables = model.init(key, node_3d, batch, key,
                                   method=SDEModel3Dto2D.loss)
        lx, ladj = model.apply(variables, node_3d, batch, key,
                               method=SDEModel3Dto2D.loss)
        losses[impl] = (float(lx), float(ladj))
    assert np.all(np.isfinite(losses["xla"]))
    np.testing.assert_allclose(losses["pallas_interpret"], losses["xla"],
                               rtol=1e-5)
