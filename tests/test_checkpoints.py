import jax
import jax.numpy as jnp
import numpy as np

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.pretrain import PretrainConfig, create_pretrain_state, make_pretrain_step
from moleculesde_tpu.utils.checkpoints import (
    load_pretrain_checkpoint,
    load_train_state,
    save_pretrain_checkpoint,
    save_train_state,
)


def _setup():
    cfg = PretrainConfig(
        emb_dim=16, num_layer=2, dropout_ratio=0.0,
        schnet_num_filters=8, schnet_num_interactions=2,
        schnet_num_gaussians=10, hidden_dim_2dto3d=8)
    batch = synthetic_batch(num_graphs=4, n_max=8, seed=0)
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, batch, key)
    return cfg, models, state, batch, key


def test_component_checkpoint_roundtrip(tmp_path):
    cfg, models, state, batch, key = _setup()
    path = save_pretrain_checkpoint(str(tmp_path), state.params, state.batch_stats,
                                    best=True)
    assert path.endswith("model_complete.msgpack")

    params, batch_stats = load_pretrain_checkpoint(path)
    assert set(params.keys()) == {
        "model_2D", "model_3D", "SDE_2Dto3D_model", "SDE_3Dto2D_model"}

    gnn_params, gnn_bs = load_pretrain_checkpoint(path, component="model_2D")
    orig = jax.tree_util.tree_leaves(state.params["model_2D"])
    loaded = jax.tree_util.tree_leaves(gnn_params)
    assert len(orig) == len(loaded)
    for a, b in zip(orig, loaded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_full_state_resume(tmp_path):
    cfg, models, state, batch, key = _setup()
    step = make_pretrain_step(models, cfg)
    state, _ = step(state, batch, key, jnp.asarray(1.0))

    path = save_train_state(str(tmp_path / "resume.msgpack"), state,
                            extra={"epoch": 3})
    # fresh template state
    _, template = _setup()[1:3][0], _setup()[2]
    restored, extra = load_train_state(path, template)
    assert int(restored.step) == 1
    assert int(extra["epoch"]) == 3

    # resumed training continues bit-exact: one more step from restored equals
    # one more step from the original
    s_a, m_a = step(jax.tree_util.tree_map(jnp.copy, state), batch, key, jnp.asarray(1.0))
    s_b, m_b = step(restored, batch, key, jnp.asarray(1.0))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
