"""Data-parallel samplers and finetune steps match single-device outputs.

Round-4 coverage for SURVEY.md section 2: the pretrain step was the only
sharded path through round 3; these tests pin the `sharded_jit` wiring used
by all three finetune CLIs (`--num_devices`) and both sample CLIs on the
8-virtual-device CPU mesh.  The sharded programs share ALL RNG draws and
formulas with the single-device ones (same trace, different sharding), so
parity holds to reduction-reorder tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import GNNGraphPred, SDEModel2Dto3D, SDEModel3Dto2D, SchNet
from moleculesde_tpu.parallel import make_mesh, replicate, shard_batch, sharded_jit
from moleculesde_tpu.sampling import sample_graph_pc, sample_positions_pc


@pytest.fixture(scope="module")
def batch():
    # 8 graphs: divisible by the 4-device mesh used below
    return synthetic_batch(num_graphs=8, n_max=8, seed=11)


def _mesh():
    return make_mesh(4)


# ---------------------------------------------------------------- samplers

def test_sharded_position_sampler_matches_single(batch):
    model = SDEModel2Dto3D(emb_dim=8, hidden_dim=8, variant=1, sde_type="VE",
                           beta_min=0.2, beta_max=1.0,
                           num_diffusion_timesteps=6)
    node_2d = jax.random.normal(jax.random.PRNGKey(0), (batch.num_nodes, 8))
    key = jax.random.PRNGKey(1)
    variables = model.init({"params": key, "dropout": key}, node_2d, batch,
                           key, method=SDEModel2Dto3D.loss)

    def generate(b, k):
        return sample_positions_pc(model, variables, node_2d, b, k,
                                   n_steps=6, corrector_steps=1)

    pos_single = jax.jit(generate)(batch, key)

    mesh = _mesh()
    sharded = sharded_jit(generate, mesh, ("data", "repl"), "data")
    # node_2d is a closed-over constant: replicate-compatible as is
    pos_sharded = sharded(shard_batch(batch, mesh), key)
    np.testing.assert_allclose(np.asarray(pos_sharded),
                               np.asarray(pos_single), atol=2e-4, rtol=2e-4)


def test_sharded_graph_sampler_matches_single(batch):
    model = SDEModel3Dto2D(dim3d=8, nhid=8, num_layers=2, num_linears=2,
                           c_init=2, c_hid=4, c_final=3, adim=8, variant=1,
                           sde_type="VE", beta_min=0.1, beta_max=1.0,
                           num_diffusion_timesteps=6, bf16_attn=False)
    node_3d = jax.random.normal(jax.random.PRNGKey(2), (batch.num_nodes, 8))
    key = jax.random.PRNGKey(3)
    variables = model.init(key, node_3d, batch, key,
                           method=SDEModel3Dto2D.loss)

    def generate(b, k):
        return sample_graph_pc(model, variables, node_3d, b, k, n_steps=6,
                               corrector_steps=1)

    single = jax.jit(generate)(batch, key)
    mesh = _mesh()
    sharded = sharded_jit(generate, mesh, ("data", "repl"), "data")
    shard = sharded(shard_batch(batch, mesh), key)
    for s, d in zip(single, shard):
        np.testing.assert_allclose(np.asarray(d), np.asarray(s),
                                   atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------- finetune steps

def test_sharded_classification_step_matches_single(batch):
    from moleculesde_tpu.finetune import (
        create_classification_state, make_classification_steps)

    num_tasks = 3
    rng = np.random.default_rng(0)
    y = rng.choice([-1.0, 1.0], size=(batch.num_graphs, num_tasks))
    b = batch.replace(y=jnp.asarray(y))
    model = GNNGraphPred(num_tasks=num_tasks, num_layers=2, emb_dim=16,
                         drop_ratio=0.0)
    key = jax.random.PRNGKey(0)
    state, tx = create_classification_state(model, b, key, lr=1e-3)
    train_s, eval_s = make_classification_steps(model, tx)
    gm = np.ones(batch.num_graphs, bool)
    lr = jnp.asarray(1e-3)
    s1, loss1 = train_s(jax.tree_util.tree_map(jnp.copy, state), b, key, gm, lr)
    pred1 = eval_s(state, b)

    mesh = _mesh()
    train_m, eval_m = make_classification_steps(model, tx, mesh=mesh)
    rstate = replicate(jax.tree_util.tree_map(jnp.copy, state), mesh)
    sb = shard_batch(b, mesh)
    # forward parity on identical params (post-step params differ at ~1e-3:
    # Adam's first-step rescaling amplifies BN-stat reduction-reorder noise)
    pred2 = eval_m(rstate, sb)
    _, loss2 = train_m(rstate, sb, replicate(key, mesh), gm, lr)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred2), np.asarray(pred1),
                               atol=1e-4, rtol=1e-4)


def test_sharded_regression_step_matches_single(batch):
    from moleculesde_tpu.finetune import (
        create_regression_state, make_regression_steps)
    from moleculesde_tpu.finetune.regression import RegressionModel

    enc = SchNet(hidden_channels=16, num_filters=8, num_interactions=2,
                 num_gaussians=10)
    model = RegressionModel(encoder=enc, head="linear")
    key = jax.random.PRNGKey(4)
    state, tx = create_regression_state(model, batch, key, lr=1e-3)
    train_s, _ = make_regression_steps(model, tx)
    y = jnp.asarray(np.random.default_rng(1).normal(size=batch.num_graphs),
                    jnp.float32)
    gm = np.ones(batch.num_graphs, np.float32)
    lr = jnp.asarray(1e-3)
    _, loss1 = train_s(jax.tree_util.tree_map(jnp.copy, state), batch, y, gm, lr)

    mesh = _mesh()
    train_m, _ = make_regression_steps(model, tx, mesh=mesh)
    rstate = replicate(jax.tree_util.tree_map(jnp.copy, state), mesh)
    _, loss2 = train_m(rstate, shard_batch(batch, mesh), y, gm, lr)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)


def test_sharded_md17_step_matches_single(batch):
    from moleculesde_tpu.finetune import create_md17_state, make_md17_steps
    from moleculesde_tpu.finetune.regression import RegressionModel

    enc = SchNet(hidden_channels=16, num_filters=8, num_interactions=2,
                 num_gaussians=10)
    model = RegressionModel(encoder=enc, head="linear")
    key = jax.random.PRNGKey(5)
    state, tx = create_md17_state(model, batch, key, lr=1e-3)
    train_s, eval_s = make_md17_steps(model, tx)
    rng = np.random.default_rng(2)
    y_e = jnp.asarray(rng.normal(size=batch.num_graphs), jnp.float32)
    y_f = jnp.asarray(rng.normal(size=(batch.num_nodes, 3)), jnp.float32)
    gm = np.ones(batch.num_graphs, np.float32)
    lr = jnp.asarray(1e-3)
    _, m1 = train_s(jax.tree_util.tree_map(jnp.copy, state), batch, y_e, y_f,
                    gm, lr)
    e1, f1 = eval_s(state, batch)

    mesh = _mesh()
    train_m, eval_m = make_md17_steps(model, tx, mesh=mesh)
    rstate = replicate(jax.tree_util.tree_map(jnp.copy, state), mesh)
    sb = shard_batch(batch, mesh)
    _, m2 = train_m(jax.tree_util.tree_map(jnp.copy, rstate), sb, y_e, y_f,
                    gm, lr)
    e2, f2 = eval_m(rstate, sb)
    for k in ("loss", "energy_mae", "force_mae"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-4,
                               rtol=1e-4)
