import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.pretrain import (
    PretrainConfig,
    create_pretrain_state,
    do_cl,
    dual_cl,
    make_pretrain_step,
)


# ----------------------------------------------------------------- contrastive
def test_infonce_perfect_alignment_low_loss():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True) * 10  # diag is max logit
    loss_aligned, acc_aligned = do_cl(x, x, key, "InfoNCE_dot_prod", T=0.1)
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 4)) * 10
    loss_rand, _ = do_cl(x, y, key, "InfoNCE_dot_prod", T=0.1)
    assert float(acc_aligned) == 1.0
    assert float(loss_aligned) < float(loss_rand)


def test_infonce_masked_rows_ignored():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (6, 4))
    mask = jnp.array([True, True, True, True, False, False])
    # garbage in masked rows must not change the loss
    x_dirty = x.at[4:].set(1e3)
    l1, a1 = do_cl(x, x, key, "InfoNCE_dot_prod", mask=mask)
    l2, a2 = do_cl(x_dirty, x_dirty, key, "InfoNCE_dot_prod", mask=mask)
    # masked-out columns get -1e9 logits; masked rows excluded from mean
    x_valid = x[:4]
    l3, _ = do_cl(x_valid, x_valid, key, "InfoNCE_dot_prod")
    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-5)


@pytest.mark.parametrize("metric", ["InfoNCE_dot_prod", "EBM_dot_prod", "EBM_node_dot_prod"])
def test_all_metrics_finite_and_symmetric(metric):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (10, 6))
    y = jax.random.normal(jax.random.PRNGKey(3), (10, 6))
    mask = jnp.ones((10,), dtype=bool)
    loss, acc = dual_cl(x, y, key, metric=metric, mask=mask)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0


def test_ebm_node_dot_prod_grad():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (6, 4))
    y = jax.random.normal(jax.random.PRNGKey(5), (6, 4))
    g = jax.grad(lambda a: dual_cl(a, y, key)[0])(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


# ------------------------------------------------------------- pretrain step
@pytest.fixture(scope="module")
def small_cfg():
    return PretrainConfig(
        emb_dim=16, num_layer=2, dropout_ratio=0.0,
        schnet_num_filters=8, schnet_num_interactions=2, schnet_num_gaussians=10,
        hidden_dim_2dto3d=8)


def test_pretrain_step_runs_and_descends(small_cfg):
    batch = synthetic_batch(num_graphs=4, n_max=8, seed=2)
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(small_cfg, batch, key)
    step = make_pretrain_step(models, small_cfg)

    losses = []
    fixed = jax.random.PRNGKey(42)  # same noise/timesteps -> deterministic objective
    for i in range(4):
        state, metrics = step(state, batch, fixed, jnp.asarray(1.0))
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 4
    # optimizing a deterministic objective on the same batch must descend
    assert losses[-1] < losses[0]


def test_pretrain_contrastive_skip_coefficient(small_cfg):
    """coeff_contrastive=0 (warm-skip epochs) removes the CL term without
    recompiling (ref pretrain_MoleculeSDE.py:339-344)."""
    batch = synthetic_batch(num_graphs=4, n_max=8, seed=2)
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(small_cfg, batch, key)
    step = make_pretrain_step(models, small_cfg)
    _, m1 = step(state, batch, key, jnp.asarray(0.0))
    assert np.isfinite(float(m1["loss"]))
    assert np.isfinite(float(m1["CL_loss"]))


def test_pretrain_painn_variant():
    cfg = PretrainConfig(
        emb_dim=16, num_layer=2, dropout_ratio=0.0, model_3d="PaiNN",
        painn_n_interactions=2, painn_n_rbf=8, hidden_dim_2dto3d=8,
        sde_2dto3d_variant=2, sde_3dto2d_variant=2)
    batch = synthetic_batch(num_graphs=4, n_max=8, seed=3)
    key = jax.random.PRNGKey(1)
    models, state = create_pretrain_state(cfg, batch, key)
    step = make_pretrain_step(models, cfg)
    state, metrics = step(state, batch, key, jnp.asarray(1.0))
    assert np.isfinite(float(metrics["loss"]))


def test_per_module_lr_groups(small_cfg):
    """gnn_2d_lr_scale=0 freezes the 2D components while 3D still updates
    (ref pretrain_MoleculeSDE.py:331-337 param groups)."""
    import dataclasses

    cfg = dataclasses.replace(small_cfg, gnn_2d_lr_scale=0.0, lr=1e-2)
    batch = synthetic_batch(num_graphs=4, n_max=8, seed=5)
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, batch, key)
    before = jax.tree_util.tree_map(jnp.copy, state.params)
    step = make_pretrain_step(models, cfg)
    state, _ = step(state, batch, key, jnp.asarray(1.0))

    def total_change(a, b):
        return sum(float(jnp.abs(x - y).sum()) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    assert total_change(before["model_2D"], state.params["model_2D"]) == 0.0
    assert total_change(before["SDE_2Dto3D_model"], state.params["SDE_2Dto3D_model"]) == 0.0
    assert total_change(before["model_3D"], state.params["model_3D"]) > 0.0
    assert total_change(before["SDE_3Dto2D_model"], state.params["SDE_3Dto2D_model"]) > 0.0


def test_ebm_node_negative_partner_uniform_over_others():
    """The sort-free negative sampler (random cyclic shift, contrastive.py)
    must give every row a uniformly random OTHER row as its negative partner
    — the distributional semantics of the reference's torch.randperm
    negatives (ref util.py:54-57), minus randperm's self-pairing fixed
    points."""
    n = 7
    i = 3
    counts = np.zeros(n, dtype=int)
    draws = 3000
    for s in range(draws):
        r = int(jax.random.randint(jax.random.PRNGKey(s), (), 1, n))
        counts[(i + r) % n] += 1
    assert counts[i] == 0  # never self-paired
    expected = draws / (n - 1)
    assert np.all(np.abs(counts[np.arange(n) != i] - expected) < 5 * np.sqrt(expected))


def test_ebm_node_dot_prod_masked_partner_zero_weight():
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (8, 4))
    y = jax.random.normal(jax.random.PRNGKey(12), (8, 4))
    mask = jnp.array([True] * 6 + [False] * 2)
    # garbage in masked rows must not change the loss: the negative of a
    # valid row whose shifted partner is masked gets weight zero
    y_dirty = y.at[6:].set(1e6)
    for s in range(5):
        k = jax.random.PRNGKey(100 + s)
        l1, _ = do_cl(x, y, k, "EBM_node_dot_prod", mask=mask)
        l2, _ = do_cl(x, y_dirty, k, "EBM_node_dot_prod", mask=mask)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_flattened_adam_matches_optax_groups():
    """The flattened 2-group Adam (train_state.make_optimizer) must produce
    the same updates as the tree-wise optax formulation it replaced."""
    import optax

    from moleculesde_tpu.pretrain.train_state import make_optimizer

    cfg = PretrainConfig(lr=1e-3, decay=0.01, gnn_2d_lr_scale=1.0,
                         gnn_3d_lr_scale=0.5)
    key = jax.random.PRNGKey(0)
    params = {
        "model_2D": {"w": jax.random.normal(key, (3, 4)),
                     "b": jnp.ones((4,))},
        "model_3D": {"w": jax.random.normal(jax.random.PRNGKey(1), (2, 2))},
        "SDE_2Dto3D_model": {"k": jnp.full((5,), 0.3)},
        "SDE_3Dto2D_model": {"k": jnp.full((2, 3), -0.7)},
    }
    grads = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape), params)

    def label_fn(p):
        return {k: ("g2d" if k in ("model_2D", "SDE_2Dto3D_model") else "g3d")
                for k in p}

    def adam(scale):
        return optax.chain(optax.add_decayed_weights(cfg.decay),
                           optax.scale_by_adam(),
                           optax.scale(-cfg.lr * scale))

    ref_tx = optax.multi_transform(
        {"g2d": adam(cfg.gnn_2d_lr_scale), "g3d": adam(cfg.gnn_3d_lr_scale)},
        label_fn)
    tx = make_optimizer(cfg)

    ref_state = ref_tx.init(params)
    state = tx.init(params)
    p_ref, p_new = params, params
    for step in range(3):
        ref_upd, ref_state = ref_tx.update(grads, ref_state, p_ref)
        upd, state = tx.update(grads, state, p_new)
        for path in (("model_2D", "w"), ("model_3D", "w"),
                     ("SDE_2Dto3D_model", "k"), ("SDE_3Dto2D_model", "k")):
            a = np.asarray(ref_upd[path[0]][path[1]])
            b = np.asarray(upd[path[0]][path[1]])
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7,
                                       err_msg=f"step {step} {path}")
        p_ref = jax.tree_util.tree_map(lambda p, u: p + u, p_ref, ref_upd)
        p_new = jax.tree_util.tree_map(lambda p, u: p + u, p_new, upd)
