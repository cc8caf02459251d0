import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import GNN2D, GNNGraphPred, PaiNN, SchNet


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(num_graphs=4, n_max=8, seed=0, num_tasks=3)


def test_gin_forward_shapes_and_padding(batch):
    model = GNN2D(num_layers=3, emb_dim=32)
    variables = model.init(jax.random.PRNGKey(0), batch)
    rep = model.apply(variables, batch, mutable=["batch_stats"])[0]
    assert rep.shape == (batch.num_nodes, 32)
    # padded rows exactly zero
    pad = np.asarray(rep)[~np.asarray(batch.node_mask)]
    np.testing.assert_allclose(pad, 0.0)
    assert np.all(np.isfinite(np.asarray(rep)))


def test_gin_padding_invariance():
    """The same molecules padded into different bucket sizes give the same
    node representations (the core correctness property of the masked
    re-design vs the reference's ragged batches)."""
    from moleculesde_tpu.core.batch import pad_graphs
    from moleculesde_tpu.data.synthetic import random_molecule

    rng = np.random.default_rng(3)
    graphs = [random_molecule(rng, 5), random_molecule(rng, 6)]
    b_small = pad_graphs(graphs, n_max=6, e_max=24)
    b_big = pad_graphs(graphs, n_max=12, e_max=48)

    model = GNN2D(num_layers=2, emb_dim=16)
    variables = model.init(jax.random.PRNGKey(0), b_small)
    r_small = model.apply(variables, b_small, mutable=["batch_stats"])[0]
    r_big = model.apply(variables, b_big, mutable=["batch_stats"])[0]

    for g, n in [(0, 5), (1, 6)]:
        np.testing.assert_allclose(
            np.asarray(r_small[g * 6 : g * 6 + n]),
            np.asarray(r_big[g * 12 : g * 12 + n]),
            atol=1e-4,
        )


@pytest.mark.parametrize("gnn_type", ["GIN", "GCN", "GAT", "GraphSAGE"])
def test_all_conv_types_run(batch, gnn_type):
    model = GNN2D(num_layers=2, emb_dim=16, gnn_type=gnn_type)
    variables = model.init(jax.random.PRNGKey(0), batch)
    rep = model.apply(variables, batch, mutable=["batch_stats"])[0]
    assert rep.shape == (batch.num_nodes, 16)
    assert np.all(np.isfinite(np.asarray(rep)))


def test_graphpred_head(batch):
    model = GNNGraphPred(num_tasks=3, num_layers=2, emb_dim=16)
    variables = model.init(jax.random.PRNGKey(0), batch)
    pred = model.apply(variables, batch, mutable=["batch_stats"])[0]
    assert pred.shape == (4, 3)


def test_schnet_shapes_and_latent(batch):
    model = SchNet(hidden_channels=16, num_filters=16, num_interactions=2,
                   num_gaussians=10, cutoff=10.0)
    variables = model.init(
        jax.random.PRNGKey(0), batch.atomic_numbers, batch.positions,
        batch.node_mask, batch.num_graphs, batch.n_max)
    pooled, latent = model.apply(
        variables, batch.atomic_numbers, batch.positions, batch.node_mask,
        batch.num_graphs, batch.n_max)
    assert pooled.shape == (4, 16)
    assert latent.shape == (batch.num_nodes, 16)
    pad = np.asarray(latent)[~np.asarray(batch.node_mask)]
    np.testing.assert_allclose(pad, 0.0)


def test_schnet_rotation_invariance(batch):
    model = SchNet(hidden_channels=16, num_filters=16, num_interactions=2,
                   num_gaussians=10)
    variables = model.init(
        jax.random.PRNGKey(0), batch.atomic_numbers, batch.positions,
        batch.node_mask, batch.num_graphs, batch.n_max)

    theta = 0.7
    rot = jnp.array([
        [np.cos(theta), -np.sin(theta), 0.0],
        [np.sin(theta), np.cos(theta), 0.0],
        [0.0, 0.0, 1.0],
    ], dtype=jnp.float32)

    p1, _ = model.apply(variables, batch.atomic_numbers, batch.positions,
                        batch.node_mask, batch.num_graphs, batch.n_max)
    p2, _ = model.apply(variables, batch.atomic_numbers, batch.positions @ rot.T,
                        batch.node_mask, batch.num_graphs, batch.n_max)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_schnet_energy_grad_forces(batch):
    """MD17 force path: -grad_pos(sum E) is finite and zero on padded atoms."""
    model = SchNet(hidden_channels=16, num_filters=16, num_interactions=2,
                   num_gaussians=10)
    variables = model.init(
        jax.random.PRNGKey(0), batch.atomic_numbers, batch.positions,
        batch.node_mask, batch.num_graphs, batch.n_max)

    def energy(pos):
        pooled, _ = model.apply(variables, batch.atomic_numbers, pos,
                                batch.node_mask, batch.num_graphs, batch.n_max)
        return pooled.sum()

    f = -jax.grad(energy)(batch.positions)
    assert np.all(np.isfinite(np.asarray(f)))
    pad = np.asarray(f)[~np.asarray(batch.node_mask)]
    np.testing.assert_allclose(pad, 0.0, atol=1e-6)


def test_painn_shapes_invariance(batch):
    model = PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=5.0)
    variables = model.init(
        jax.random.PRNGKey(0), batch.atomic_numbers, batch.positions,
        batch.node_mask, batch.num_graphs, batch.n_max)
    pooled, latent = model.apply(
        variables, batch.atomic_numbers, batch.positions, batch.node_mask,
        batch.num_graphs, batch.n_max)
    assert pooled.shape == (4, 16)
    assert latent.shape == (batch.num_nodes, 16)

    theta = -0.4
    rot = jnp.array([
        [1.0, 0.0, 0.0],
        [0.0, np.cos(theta), -np.sin(theta)],
        [0.0, np.sin(theta), np.cos(theta)],
    ], dtype=jnp.float32)
    p2, _ = model.apply(variables, batch.atomic_numbers, batch.positions @ rot.T,
                        batch.node_mask, batch.num_graphs, batch.n_max)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(p2), atol=1e-4)
