import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import GNN2D, SchNet
from moleculesde_tpu.utils.torch_import import import_gin, import_schnet


def _fake_gin_state_dict(num_layers=2, emb=8):
    sd = {}
    atom_dims = [119, 4, 12, 12, 10, 6, 6, 2, 2]
    for i, d in enumerate(atom_dims):
        sd[f"atom_encoder.atom_embedding_list.{i}.weight"] = torch.randn(d, emb)
    for l in range(num_layers):
        for i, d in enumerate([5, 6, 2]):
            sd[f"gnns.{l}.bond_encoder.bond_embedding_list.{i}.weight"] = torch.randn(d, emb)
        sd[f"gnns.{l}.mlp.0.weight"] = torch.randn(2 * emb, emb)
        sd[f"gnns.{l}.mlp.0.bias"] = torch.randn(2 * emb)
        sd[f"gnns.{l}.mlp.1.weight"] = torch.randn(2 * emb)
        sd[f"gnns.{l}.mlp.1.bias"] = torch.randn(2 * emb)
        sd[f"gnns.{l}.mlp.1.running_mean"] = torch.randn(2 * emb)
        sd[f"gnns.{l}.mlp.1.running_var"] = torch.rand(2 * emb) + 0.5
        sd[f"gnns.{l}.mlp.3.weight"] = torch.randn(emb, 2 * emb)
        sd[f"gnns.{l}.mlp.3.bias"] = torch.randn(emb)
        sd[f"gnns.{l}.eps"] = torch.zeros(1)
        sd[f"batch_norms.{l}.weight"] = torch.randn(emb)
        sd[f"batch_norms.{l}.bias"] = torch.randn(emb)
        sd[f"batch_norms.{l}.running_mean"] = torch.randn(emb)
        sd[f"batch_norms.{l}.running_var"] = torch.rand(emb) + 0.5
    return sd


def test_import_gin_into_model():
    sd = _fake_gin_state_dict()
    params, stats = import_gin(sd, num_layers=2)

    batch = synthetic_batch(num_graphs=2, n_max=6, seed=0)
    model = GNN2D(num_layers=2, emb_dim=8, drop_ratio=0.0)
    ref_vars = model.init(jax.random.PRNGKey(0), batch)
    # imported tree must be structurally compatible
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"])
    imp_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == imp_shapes
    # transpose convention: torch [out,in] -> flax [in,out]
    np.testing.assert_allclose(
        params["GINConv_0"]["Dense_0"]["kernel"],
        sd["gnns.0.mlp.0.weight"].numpy().T)
    # forward runs in eval mode with imported running stats
    out = model.apply({"params": params, "batch_stats": stats}, batch,
                      deterministic=True, use_running_average=True)
    assert np.all(np.isfinite(np.asarray(out)))


def _fake_schnet_state_dict(num_interactions=2, hidden=8, gaussians=5):
    sd = {"embedding.weight": torch.randn(119, hidden),
          "lin1.weight": torch.randn(hidden, hidden),
          "lin1.bias": torch.randn(hidden),
          "lin2.weight": torch.randn(hidden, hidden),
          "lin2.bias": torch.randn(hidden)}
    for k in range(num_interactions):
        sd[f"interactions.{k}.mlp.0.weight"] = torch.randn(hidden, gaussians)
        sd[f"interactions.{k}.mlp.0.bias"] = torch.randn(hidden)
        sd[f"interactions.{k}.mlp.2.weight"] = torch.randn(hidden, hidden)
        sd[f"interactions.{k}.mlp.2.bias"] = torch.randn(hidden)
        sd[f"interactions.{k}.conv.lin1.weight"] = torch.randn(hidden, hidden)
        sd[f"interactions.{k}.conv.lin2.weight"] = torch.randn(hidden, hidden)
        sd[f"interactions.{k}.conv.lin2.bias"] = torch.randn(hidden)
        sd[f"interactions.{k}.lin.weight"] = torch.randn(hidden, hidden)
        sd[f"interactions.{k}.lin.bias"] = torch.randn(hidden)
    return sd


def test_import_schnet_into_model():
    sd = _fake_schnet_state_dict()
    params = import_schnet(sd, num_interactions=2)

    batch = synthetic_batch(num_graphs=2, n_max=6, seed=1)
    model = SchNet(hidden_channels=8, num_filters=8, num_interactions=2,
                   num_gaussians=5)
    ref_vars = model.init(jax.random.PRNGKey(0), batch.atomic_numbers,
                          batch.positions, batch.node_mask, 2, 6)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"])
    imp_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == imp_shapes
    pooled, latent = model.apply({"params": params}, batch.atomic_numbers,
                                 batch.positions, batch.node_mask, 2, 6)
    assert np.all(np.isfinite(np.asarray(pooled)))
