import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel2Dto3D, SDEModel3Dto2D


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(num_graphs=4, n_max=8, seed=1)


def _init_2d3d(batch, variant, emb_dim=16):
    model = SDEModel2Dto3D(
        emb_dim=emb_dim, hidden_dim=8, variant=variant,
        beta_min=0.2, beta_max=1.0, num_diffusion_timesteps=100)
    node_2d = jax.random.normal(jax.random.PRNGKey(5), (batch.num_nodes, emb_dim))
    node_2d = node_2d * batch.node_mask[:, None]
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, node_2d, batch, key,
                           method=SDEModel2Dto3D.loss)
    return model, variables, node_2d


@pytest.mark.parametrize("variant", [1, 2, 3, 4])
def test_2d3d_loss_finite_all_variants(batch, variant):
    model, variables, node_2d = _init_2d3d(batch, variant)
    key = jax.random.PRNGKey(1)
    out, _ = model.apply(
        variables, node_2d, batch, key, 0.0,
        rngs={"dropout": key}, mutable=["batch_stats"],
        method=SDEModel2Dto3D.loss)
    assert np.isfinite(float(out["position"]))
    assert float(out["position"]) > 0


def test_2d3d_grads_finite_and_nonzero(batch):
    model, variables, node_2d = _init_2d3d(batch, 2)
    key = jax.random.PRNGKey(2)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            node_2d, batch, key, 0.0, True, False,
            mutable=["batch_stats"], method=SDEModel2Dto3D.loss)
        return out["position"]

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_2d3d_anneal_power_changes_loss(batch):
    model, variables, node_2d = _init_2d3d(batch, 1)
    key = jax.random.PRNGKey(3)
    kwargs = dict(mutable=["batch_stats"], method=SDEModel2Dto3D.loss)
    out0, _ = model.apply(variables, node_2d, batch, key, 0.0, True, False, **kwargs)
    out2, _ = model.apply(variables, node_2d, batch, key, 2.0, True, False, **kwargs)
    assert float(out0["position"]) != float(out2["position"])


def test_2d3d_score_rotation_equivariance(batch):
    """score(R x) = R score(x): the SE(3)-equivariance property of the
    frame-mixed score (SURVEY.md section 4 property test)."""
    model, variables, node_2d = _init_2d3d(batch, 2)
    t_pos = jnp.full((batch.num_nodes,), 0.5)
    pos = batch.positions

    theta = 0.9
    R = jnp.array([
        [np.cos(theta), -np.sin(theta), 0.0],
        [np.sin(theta), np.cos(theta), 0.0],
        [0.0, 0.0, 1.0]], dtype=jnp.float32)

    s1 = model.apply(variables, node_2d, batch, pos, t_pos,
                     method=SDEModel2Dto3D.get_score)
    s2 = model.apply(variables, node_2d, batch, pos @ R.T, t_pos,
                     method=SDEModel2Dto3D.get_score)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1 @ R.T), atol=2e-4)


def test_2d3d_score_padded_rows_zero(batch):
    model, variables, node_2d = _init_2d3d(batch, 1)
    t_pos = jnp.full((batch.num_nodes,), 0.3)
    s = model.apply(variables, node_2d, batch, batch.positions, t_pos,
                    method=SDEModel2Dto3D.get_score)
    assert np.all(np.isfinite(np.asarray(s)))
    pad = np.asarray(s)[~np.asarray(batch.node_mask)]
    np.testing.assert_allclose(pad, 0.0, atol=1e-6)


def _init_3d2d(batch, variant, emb_dim=16, one_hot=True):
    model = SDEModel3Dto2D(
        dim3d=emb_dim, nhid=8, num_layers=2, num_linears=2,
        c_init=2, c_hid=4, c_final=3, adim=8,
        variant=variant, beta_min=0.1, beta_max=1.0,
        num_diffusion_timesteps=100, noise_on_one_hot=one_hot)
    node_3d = jax.random.normal(jax.random.PRNGKey(6), (batch.num_nodes, emb_dim))
    key = jax.random.PRNGKey(0)
    variables = model.init(key, node_3d, batch, key, method=SDEModel3Dto2D.loss)
    return model, variables, node_3d


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_3d2d_loss_finite_all_variants(batch, variant):
    model, variables, node_3d = _init_3d2d(batch, variant)
    lx, ladj = model.apply(variables, node_3d, batch, jax.random.PRNGKey(1),
                           method=SDEModel3Dto2D.loss)
    assert np.isfinite(float(lx)) and np.isfinite(float(ladj))
    assert float(lx) > 0 and float(ladj) > 0


def test_3d2d_scalar_noise_mode(batch):
    model, variables, node_3d = _init_3d2d(batch, 1, one_hot=False)
    lx, ladj = model.apply(variables, node_3d, batch, jax.random.PRNGKey(1),
                           0.0, False, method=SDEModel3Dto2D.loss)
    assert np.isfinite(float(lx)) and np.isfinite(float(ladj))


def test_3d2d_adj_score_symmetric_hollow(batch):
    model, variables, node_3d = _init_3d2d(batch, 1)
    b, n = batch.num_graphs, batch.n_max
    node_3d_dense = batch.dense_nodes(node_3d)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, 119))
    adj = jax.random.normal(jax.random.PRNGKey(3), (b, n, n))
    adj = (adj + jnp.swapaxes(adj, -1, -2)) / 2
    edge_attr = jnp.where(batch.edge_mask, 1.0, 0.0)
    from moleculesde_tpu.core.masks import node_flags
    flags = node_flags(batch.dense_adjacency(edge_attr))
    t = jnp.full((b,), 0.5)
    s = model.apply(variables, node_3d_dense, x, adj, flags, t,
                    method=SDEModel3Dto2D.score_adj)
    np.testing.assert_allclose(np.asarray(s), np.asarray(jnp.swapaxes(s, -1, -2)),
                               atol=1e-5)
    assert float(jnp.abs(jnp.diagonal(s, axis1=-2, axis2=-1)).max()) == 0.0
    # padded rows masked
    np.testing.assert_allclose(
        np.asarray(s * (1 - flags)[:, :, None]), 0.0, atol=1e-6)


def test_3d2d_grads_finite(batch):
    model, variables, node_3d = _init_3d2d(batch, 2)

    def loss(params):
        lx, ladj = model.apply({"params": params}, node_3d, batch,
                               jax.random.PRNGKey(4), method=SDEModel3Dto2D.loss)
        return lx + ladj

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_score_dtype_bf16_close_to_f32():
    """The bf16 sampling path (score_dtype="bfloat16", same params) stays
    within ~2% relative error of the f32 score — the documented contract of
    --sampler_precision=bfloat16."""
    import numpy as np

    from moleculesde_tpu.data.synthetic import synthetic_batch

    batch = synthetic_batch(num_graphs=4, n_max=8, seed=0)
    key = jax.random.PRNGKey(0)
    emb = 16
    node_2d = jax.random.normal(key, (batch.num_nodes, emb))
    m32 = SDEModel2Dto3D(emb_dim=emb, hidden_dim=8, variant=2)
    v = m32.init({"params": key, "dropout": key}, node_2d, batch, key,
                 method=SDEModel2Dto3D.loss)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    m16 = m32.clone(score_dtype="bfloat16")
    pos = batch.positions + 0.1
    t = jnp.full((batch.num_nodes,), 0.5)
    s32 = np.asarray(m32.apply(v, node_2d, batch, pos, t,
                               method=SDEModel2Dto3D.get_score))
    s16 = np.asarray(m16.apply(v, node_2d, batch, pos, t,
                               method=SDEModel2Dto3D.get_score))
    assert s16.dtype == np.float32
    rel = np.abs(s16 - s32).max() / (np.abs(s32).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("variant", [1, 2, 3, 4])
def test_2d3d_channel_major_matches_feature_layout(batch, variant):
    """score_from_cond_cm (pair tensors [B, C, N*N], the TPU
    lane-padding-free sampling layout) is numerically identical to
    score_from_cond on the same parameters."""
    model, variables, node_2d = _init_2d3d(batch, variant)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    pos = jax.random.normal(jax.random.PRNGKey(7), batch.positions.shape)
    cond_f = model.apply(variables, node_2d, batch, True,
                         method=SDEModel2Dto3D.precompute_conditioning)
    cond_c = model.apply(variables, node_2d, batch, True, layout="channel",
                         method=SDEModel2Dto3D.precompute_conditioning)
    s_f = np.asarray(model.apply(variables, cond_f, batch, pos,
                                 method=SDEModel2Dto3D.score_from_cond))
    s_c = np.asarray(model.apply(variables, cond_c, batch, pos,
                                 method=SDEModel2Dto3D.score_from_cond_cm))
    rel = np.abs(s_f - s_c).max() / (np.abs(s_f).max() + 1e-12)
    assert rel < 1e-4, rel


def test_sampler_layouts_agree(batch):
    """sample_positions_pc(layout="channel") and layout="feature" walk the
    same chain (same RNG stream) to numerically close final positions."""
    from moleculesde_tpu.sampling import sample_positions_pc

    model, variables, node_2d = _init_2d3d(batch, 2)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    key = jax.random.PRNGKey(11)
    p_c = np.asarray(sample_positions_pc(
        model, variables, node_2d, batch, key, n_steps=5, layout="channel"))
    p_f = np.asarray(sample_positions_pc(
        model, variables, node_2d, batch, key, n_steps=5, layout="feature"))
    assert np.all(np.isfinite(p_c))
    rel = np.abs(p_c - p_f).max() / (np.abs(p_f).max() + 1e-12)
    assert rel < 1e-3, rel


def test_coff_pair_swap_symmetry():
    """The s<->d transpose identity both score paths exploit to halve the
    GFP transcendentals: coff_d = pair-transpose(coff_s) with component 0
    negated (diff and cross flip sign under the swap, vert is even), and
    the pseudo angle is pair-symmetric.  Pins the identity directly against
    dense_frames so a symmetric sign error cannot cancel between the
    feature and channel-major implementations."""
    from moleculesde_tpu.models.score_2d3d import dense_frames

    pos = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 3))
    _, coff_s, coff_d, (psin, pcos) = dense_frames(pos)
    T = lambda a: np.swapaxes(np.asarray(a), 1, 2)  # noqa: E731
    np.testing.assert_allclose(np.asarray(coff_d[0]), -T(coff_s[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(coff_d[1]), T(coff_s[1]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(coff_d[2]), T(coff_s[2]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pcos), T(pcos), rtol=1e-5, atol=1e-6)


def test_2d3d_loss_layout_agrees(batch):
    """The training loss through the channel-major pipeline
    (loss_layout="channel", the default) matches the feature-layout loss on
    identical params and RNG."""
    model, variables, node_2d = _init_2d3d(batch, 2)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    key = jax.random.PRNGKey(5)

    def run(layout):
        m = model.clone(loss_layout=layout)
        (out, _) = m.apply(variables, node_2d, batch, key,
                           deterministic=True, mutable=["batch_stats"],
                           rngs={"dropout": key}, method=SDEModel2Dto3D.loss)
        return float(out["position"])

    l_c = run("channel")
    l_f = run("feature")
    assert np.isfinite(l_c)
    assert abs(l_c - l_f) / (abs(l_f) + 1e-12) < 1e-4, (l_c, l_f)
