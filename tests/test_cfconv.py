"""Fused CFConv kernel (ops/cfconv.py) validated against the XLA
formulation it replaces (reference Geom3D/models/schnet.py:138-195
semantics: filter MLP over smeared distances, cutoff envelope, neighbor
aggregation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.ops.cfconv import fused_cfconv


@pytest.fixture(scope="module")
def operands():
    key = jax.random.PRNGKey(7)
    b, n, g, f = 4, 8, 5, 16
    ks = jax.random.split(key, 7)
    ea = jax.nn.softmax(jax.random.normal(ks[0], (b, n, n, g)))
    env = jax.nn.sigmoid(jax.random.normal(ks[1], (b, n, n)))
    x = jax.random.normal(ks[2], (b, n, f))
    w1 = jax.random.normal(ks[3], (g, f)) * 0.3
    b1 = jax.random.normal(ks[4], (f,)) * 0.1
    w2 = jax.random.normal(ks[5], (f, f)) * 0.3
    b2 = jax.random.normal(ks[6], (f,)) * 0.1
    return ea, env, x, w1, b1, w2, b2


def test_cfconv_pallas_matches_xla(operands):
    out_xla = fused_cfconv(*operands, bf16=False, impl="xla")
    out_pls = fused_cfconv(*operands, bf16=False, impl="pallas_interpret")
    assert out_xla.shape == (4, 8, 16)
    np.testing.assert_allclose(np.asarray(out_pls), np.asarray(out_xla),
                               atol=1e-5, rtol=1e-5)


def test_cfconv_grads_match_xla(operands):
    ea, env, x, w1, b1, w2, b2 = operands

    def loss(impl):
        def f(x_, w1_, b1_, w2_, b2_):
            out = fused_cfconv(ea, env, x_, w1_, b1_, w2_, b2_,
                               bf16=False, impl=impl)
            wgt = jnp.arange(out.size).reshape(out.shape) / out.size
            return jnp.sum(out * wgt)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)

    for g_ref, g_k in zip(loss("xla"), loss("pallas_interpret")):
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                                   atol=2e-4, rtol=2e-4)


def test_cfconv_zero_grad_contract(operands):
    """The kernel's documented contract: ea and env receive ZERO cotangents
    (positions must not be differentiated through it)."""
    ea, env, x, w1, b1, w2, b2 = operands

    def f(ea_, env_):
        return jnp.sum(fused_cfconv(ea_, env_, x, w1, b1, w2, b2,
                                    bf16=False, impl="pallas_interpret"))

    dea, denv = jax.grad(f, argnums=(0, 1))(ea, env)
    assert float(jnp.abs(dea).max()) == 0.0
    assert float(jnp.abs(denv).max()) == 0.0
    # ...while the XLA formulation carries real gradients there
    def fx(ea_, env_):
        return jnp.sum(fused_cfconv(ea_, env_, x, w1, b1, w2, b2,
                                    bf16=False, impl="xla"))
    dea_x, denv_x = jax.grad(fx, argnums=(0, 1))(ea, env)
    assert float(jnp.abs(dea_x).max()) > 0.0
    assert float(jnp.abs(denv_x).max()) > 0.0


def test_cfconv_bf16_close(operands):
    out_f32 = fused_cfconv(*operands, bf16=False, impl="pallas_interpret")
    out_bf = fused_cfconv(*operands, bf16=True, impl="pallas_interpret")
    denom = np.maximum(np.abs(np.asarray(out_f32)), 1.0)
    assert np.max(np.abs(np.asarray(out_bf - out_f32)) / denom) < 3e-2


def test_schnet_cfconv_impls_agree():
    """SchNet forward is identical under the XLA and (interpreted) Pallas
    CFConv — same parameter tree (Dense_0..Dense_4 naming preserved)."""
    from moleculesde_tpu.data.synthetic import synthetic_batch
    from moleculesde_tpu.models.schnet import SchNet

    batch = synthetic_batch(num_graphs=4, n_max=8, seed=3)
    args = (batch.atomic_numbers, batch.positions, batch.node_mask,
            batch.num_graphs, batch.n_max)
    key = jax.random.PRNGKey(0)
    outs = {}
    variables = None
    for impl in ("xla", "pallas_interpret", "pallas_rbf_interpret"):
        model = SchNet(hidden_channels=16, num_filters=8,
                       num_interactions=2, num_gaussians=5, cutoff=10.0,
                       cfconv=impl)
        if variables is None:
            variables = model.init(key, *args)
        outs[impl] = model.apply(variables, *args)[1]
    np.testing.assert_allclose(np.asarray(outs["pallas_interpret"]),
                               np.asarray(outs["xla"]), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(outs["pallas_rbf_interpret"]),
                               np.asarray(outs["xla"]), atol=1e-5, rtol=1e-4)


def test_cfconv_rbf_matches_smear_then_cfconv(operands):
    """fused_cfconv_rbf(dist, ...) == fused_cfconv(gaussian_smearing(dist))
    — the smearing is synthesized in VMEM from raw distances."""
    from moleculesde_tpu.ops.cfconv import fused_cfconv_rbf
    from moleculesde_tpu.ops.fourier import gaussian_smearing

    _, env, x, w1, b1, w2, b2 = operands
    dist = jnp.abs(jax.random.normal(jax.random.PRNGKey(11), (4, 8, 8))) * 4.0
    g, cutoff = w1.shape[0], 10.0
    ea = gaussian_smearing(dist, 0.0, cutoff, g)
    ref = fused_cfconv(ea, env, x, w1, b1, w2, b2, bf16=False, impl="xla")
    out = fused_cfconv_rbf(dist, env, x, w1, b1, w2, b2, start=0.0,
                           stop=cutoff, num_gaussians=g, bf16=False,
                           impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cfconv_rbf_grads_and_contract(operands):
    from moleculesde_tpu.ops.cfconv import fused_cfconv_rbf
    from moleculesde_tpu.ops.fourier import gaussian_smearing

    _, env, x, w1, b1, w2, b2 = operands
    dist = jnp.abs(jax.random.normal(jax.random.PRNGKey(12), (4, 8, 8))) * 4.0
    g, cutoff = w1.shape[0], 10.0

    def f_ref(x_, w1_, b1_, w2_, b2_):
        ea = gaussian_smearing(dist, 0.0, cutoff, g)
        out = fused_cfconv(ea, env, x_, w1_, b1_, w2_, b2_, bf16=False,
                           impl="xla")
        wgt = jnp.arange(out.size).reshape(out.shape) / out.size
        return jnp.sum(out * wgt)

    def f_k(x_, w1_, b1_, w2_, b2_):
        out = fused_cfconv_rbf(dist, env, x_, w1_, b1_, w2_, b2_, start=0.0,
                               stop=cutoff, num_gaussians=g, bf16=False,
                               impl="pallas_interpret")
        wgt = jnp.arange(out.size).reshape(out.shape) / out.size
        return jnp.sum(out * wgt)

    for g_ref, g_k in zip(
            jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2),
            jax.grad(f_k, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)):
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                                   atol=2e-4, rtol=2e-4)

    # zero-cotangent contract for dist/env
    def f_de(d_, e_):
        return jnp.sum(fused_cfconv_rbf(d_, e_, x, w1, b1, w2, b2, start=0.0,
                                        stop=cutoff, num_gaussians=g,
                                        bf16=False, impl="pallas_interpret"))
    dd, de = jax.grad(f_de, argnums=(0, 1))(dist, env)
    assert float(jnp.abs(dd).max()) == 0.0
    assert float(jnp.abs(de).max()) == 0.0
