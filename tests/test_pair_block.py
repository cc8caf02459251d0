"""Fused pair block (ops/pair_block.py): analytic BN statistics and the
Pallas relu-project kernel, validated against the materialized reference
computation (what round 1 shipped in score_2d3d.py: broadcast-add ->
MaskedBatchNorm -> relu -> Dense; reference SDE_model_2D_to_3D.py:344-372)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.models.layers import PairMaskedBatchNorm
from moleculesde_tpu.ops.pair_block import pair_mean_var, pair_relu_project


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(42)
    b, n, c, h = 4, 8, 24, 6
    src = jax.random.normal(key, (b, n, c)) * 1.7 + 0.4
    dst = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c)) - 0.2
    mask = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.4, (b, n, n))
    w = jax.random.normal(jax.random.fold_in(key, 3), (c, h)) / np.sqrt(c)
    return src, dst, mask, w


def test_pair_mean_var_matches_materialized(data):
    src, dst, mask, _ = data
    pair = src[:, :, None, :] + dst[:, None, :, :]
    m = np.asarray(mask.reshape(-1), np.float32)
    x = np.asarray(pair.reshape(-1, pair.shape[-1]))
    cnt = m.sum()
    mean_ref = (x * m[:, None]).sum(0) / cnt
    var_ref = (((x - mean_ref) ** 2) * m[:, None]).sum(0) / cnt
    mean, var = pair_mean_var(src, dst, mask)
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=1e-5, rtol=1e-5)


def test_pair_relu_project_pallas_matches_xla(data):
    src, dst, mask, w = data
    bias = jnp.linspace(-1.0, 1.0, w.shape[-1])
    out_xla = pair_relu_project(src, dst, w, bias, impl="xla")
    out_pls = pair_relu_project(src, dst, w, bias, impl="pallas_interpret")
    assert out_xla.shape == (4, 8, 8, 6)
    np.testing.assert_allclose(
        np.asarray(out_pls), np.asarray(out_xla), atol=1e-5)
    # fused bias is a plain output offset
    out_nob = pair_relu_project(src, dst, w, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_pls - bias), np.asarray(out_nob),
                               atol=1e-5)


def test_pair_relu_project_pallas_grads_match_xla(data):
    src, dst, mask, w = data
    bias = jnp.linspace(-0.5, 0.5, w.shape[-1])

    def scalar(impl):
        def f(a, c, ww, bb):
            out = pair_relu_project(a, c, ww, bb, impl=impl)
            return jnp.sum(out * jnp.arange(out.shape[-1]))
        return jax.grad(f, argnums=(0, 1, 2, 3))(src, dst, w, bias)

    for g_ref, g_k in zip(scalar("xla"), scalar("pallas_interpret")):
        np.testing.assert_allclose(
            np.asarray(g_k).reshape(-1), np.asarray(g_ref).reshape(-1),
            atol=1e-4, rtol=1e-4)


def test_pair_relu_project_uneven_batch_tile(data):
    """Batch sizes that don't divide the VMEM budget tile still work."""
    src, dst, mask, w = data
    src3, dst3 = src[:3], dst[:3]
    out_xla = pair_relu_project(src3, dst3, w, impl="xla")
    out_pls = pair_relu_project(src3, dst3, w, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_pls), np.asarray(out_xla),
                               atol=1e-5)


def test_folded_bn_matches_materialized_batchnorm(data):
    """PairMaskedBatchNorm's folded (a, c) reproduces MaskedBatchNorm applied
    to the materialized pair tensor — training and eval modes."""
    from moleculesde_tpu.models.layers import MaskedBatchNorm

    src, dst, mask, _ = data
    b, n, c = src.shape
    pair = (src[:, :, None, :] + dst[:, None, :, :]).reshape(-1, c)

    folded = PairMaskedBatchNorm()
    dense = MaskedBatchNorm()
    v_f = folded.init(jax.random.PRNGKey(0), src, dst, mask)
    v_d = dense.init(jax.random.PRNGKey(0), pair, mask.reshape(-1))
    # give the affine params a non-trivial value
    v_f = jax.tree_util.tree_map(lambda x: x, v_f)
    scale = jnp.linspace(0.5, 2.0, c)
    bias = jnp.linspace(-1.0, 1.0, c)
    params = {"params": {"scale": scale, "bias": bias}}

    for ura in (False, True):
        (a, cc), mut_f = folded.apply(
            {**params, "batch_stats": v_f["batch_stats"]},
            src, dst, mask, ura, mutable=["batch_stats"])
        y_ref, mut_d = dense.apply(
            {**params, "batch_stats": v_d["batch_stats"]},
            pair, mask.reshape(-1), ura, mutable=["batch_stats"])
        y_fold = (a[:, :, None, :] + cc[:, None, :, :]).reshape(-1, c)
        np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mut_f["batch_stats"]["mean"]),
            np.asarray(mut_d["batch_stats"]["mean"]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mut_f["batch_stats"]["var"]),
            np.asarray(mut_d["batch_stats"]["var"]), atol=1e-5, rtol=1e-4)


def test_score_model_pair_impls_agree():
    """SDEModel2Dto3D produces the same loss with the XLA fallback and the
    (interpreted) Pallas kernel pair block."""
    from moleculesde_tpu.data.synthetic import synthetic_batch
    from moleculesde_tpu.models import SDEModel2Dto3D

    batch = synthetic_batch(num_graphs=4, n_max=8, seed=0)
    key = jax.random.PRNGKey(0)
    emb = 16
    node_2d = jax.random.normal(jax.random.fold_in(key, 5),
                                (batch.num_nodes, emb))
    losses = {}
    variables = None
    for impl, cm_direct in (("xla", False), ("pallas_interpret", False),
                            ("pallas_interpret", True)):
        model = SDEModel2Dto3D(emb_dim=emb, hidden_dim=8, variant=1,
                               pair_impl=impl, pair_cm_direct=cm_direct)
        if variables is None:
            variables = model.init({"params": key, "dropout": key},
                                   node_2d, batch, key,
                                   method=SDEModel2Dto3D.loss)
        out, _ = model.apply(
            variables, node_2d, batch, key, 0.0, True, False,
            mutable=["batch_stats"], rngs={"dropout": key},
            method=SDEModel2Dto3D.loss)
        losses[(impl, cm_direct)] = float(out["position"])
    ref = losses[("xla", False)]
    assert np.isfinite(ref)
    np.testing.assert_allclose(losses[("pallas_interpret", False)], ref,
                               rtol=1e-5)
    # cm-direct opt-in: kernel emits [B, H, N*N]; same loss
    np.testing.assert_allclose(losses[("pallas_interpret", True)], ref,
                               rtol=1e-5)


def test_pair_relu_project_cm_matches_feature_form(data):
    """Channel-major kernel output == transposed feature-form output, and
    all grads agree (the cm kernel builds the pair slab via selector
    matmuls and emits [B, H, N*N] directly)."""
    from moleculesde_tpu.ops.pair_block import pair_relu_project_cm

    src, dst, mask, w = data
    b, n, _ = src.shape
    h = w.shape[-1]
    bias = jnp.linspace(-0.5, 0.5, h)

    ref = pair_relu_project(src, dst, w, bias, impl="xla")
    ref_cm = ref.reshape(b, n * n, h).transpose(0, 2, 1)
    out = pair_relu_project_cm(src, dst, w, bias, impl="pallas_interpret")
    assert out.shape == (b, h, n * n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_cm), atol=1e-5)
    # xla fallback of the cm wrapper
    out_xla = pair_relu_project_cm(src, dst, w, bias, impl="xla")
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref_cm),
                               atol=1e-5)

    def scalar(fn, impl):
        def f(a, c, ww, bb):
            out = fn(a, c, ww, bb, impl=impl)
            return jnp.sum(out * out)
        return jax.grad(f, argnums=(0, 1, 2, 3))(src, dst, w, bias)

    for g_ref, g_k in zip(
            scalar(pair_relu_project, "xla"),
            scalar(lambda *a, impl: pair_relu_project_cm(*a, impl=impl),
                   "pallas_interpret")):
        np.testing.assert_allclose(
            np.asarray(g_k).reshape(-1), np.asarray(g_ref).reshape(-1),
            atol=1e-4, rtol=1e-4)
