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


def _fake_painn_state_dict(n_interactions=2, f=8, rbf=5):
    sd = {"embedding.weight": torch.randn(119, f),
          "filter_net.weight": torch.randn(n_interactions * 3 * f, rbf),
          "filter_net.bias": torch.randn(n_interactions * 3 * f)}
    for i in range(n_interactions):
        sd[f"interactions.{i}.interatomic_context_net.0.weight"] = torch.randn(f, f)
        sd[f"interactions.{i}.interatomic_context_net.0.bias"] = torch.randn(f)
        sd[f"interactions.{i}.interatomic_context_net.1.weight"] = torch.randn(3 * f, f)
        sd[f"interactions.{i}.interatomic_context_net.1.bias"] = torch.randn(3 * f)
        sd[f"mixing.{i}.mu_channel_mix.weight"] = torch.randn(2 * f, f)
        sd[f"mixing.{i}.intraatomic_context_net.0.weight"] = torch.randn(f, 2 * f)
        sd[f"mixing.{i}.intraatomic_context_net.0.bias"] = torch.randn(f)
        sd[f"mixing.{i}.intraatomic_context_net.1.weight"] = torch.randn(3 * f, f)
        sd[f"mixing.{i}.intraatomic_context_net.1.bias"] = torch.randn(3 * f)
    return sd


def test_import_painn_into_model():
    from moleculesde_tpu.models import PaiNN
    from moleculesde_tpu.utils.torch_import import import_painn

    sd = _fake_painn_state_dict()
    params = import_painn(sd, n_interactions=2)

    batch = synthetic_batch(num_graphs=2, n_max=6, seed=2)
    model = PaiNN(n_atom_basis=8, n_interactions=2, n_rbf=5, cutoff=5.0)
    ref_vars = model.init(jax.random.PRNGKey(0), batch.atomic_numbers,
                          batch.positions, batch.node_mask, 2, 6)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"])
    imp_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == imp_shapes
    # bias-free mu_channel_mix maps to the bias-free flax Dense_0
    assert "bias" not in params["PaiNNMixing_0"]["Dense_0"]
    pooled, latent = model.apply({"params": params}, batch.atomic_numbers,
                                 batch.positions, batch.node_mask, 2, 6)
    assert np.all(np.isfinite(np.asarray(pooled)))


def _fake_sde_2dto3d_state_dict(emb=16, h=8, variant=1, coff=128):
    sd = {}
    if variant in (1, 2):
        sd["edge_2D_emb.0.weight"] = torch.randn(emb, 2 * emb)
        sd["edge_2D_emb.0.bias"] = torch.randn(emb)
        sd["edge_2D_emb.1.weight"] = torch.randn(emb)
        sd["edge_2D_emb.1.bias"] = torch.randn(emb)
        sd["edge_2D_emb.1.running_mean"] = torch.randn(emb)
        sd["edge_2D_emb.1.running_var"] = torch.rand(emb) + 0.5
        sd["edge_2D_emb.1.num_batches_tracked"] = torch.tensor(7)
        sd["edge_2D_emb.3.weight"] = torch.randn(h, emb)
        sd["edge_2D_emb.3.bias"] = torch.randn(h)
    else:
        sd["edge_2D_emb.weight"] = torch.randn(h, 2 * emb)
        sd["edge_2D_emb.bias"] = torch.randn(h)
        sd["edge_emb.weight"] = torch.randn(100, h)
    if variant == 2:
        sd["dist_gaussian_fourier.W"] = torch.randn(h)
        sd["input_mlp.layers.0.weight"] = torch.randn(h, 2 * h)
        sd["input_mlp.layers.0.bias"] = torch.randn(h)
    sd["coff_gaussian_fourier.W"] = torch.randn(h)
    sd["coff_mlp.weight"] = torch.randn(h, 4 * h)
    sd["coff_mlp.bias"] = torch.randn(h)
    sd["project.layers.0.weight"] = torch.randn(h, 2 * h + 2)
    sd["project.layers.0.bias"] = torch.randn(h)
    sd["project.layers.1.weight"] = torch.randn(h, h)
    sd["project.layers.1.bias"] = torch.randn(h)
    sd["node_emb.layers.0.weight"] = torch.randn(h, emb)
    sd["node_emb.layers.0.bias"] = torch.randn(h)
    for m in range(2):
        for c in range(2):
            pre = f"score_network.gnn_layers.{m}.{c}"
            for lin in ("lin_query", "lin_key", "lin_value", "lin_skip"):
                sd[f"{pre}.MHA.{lin}.weight"] = torch.randn(h, h)
                sd[f"{pre}.MHA.{lin}.bias"] = torch.randn(h)
            sd[f"{pre}.MHA.lin_edge.weight"] = torch.randn(h, h)  # bias-free
            sd[f"{pre}.FFN.0.weight"] = torch.randn(h, h)
            sd[f"{pre}.FFN.0.bias"] = torch.randn(h)
            sd[f"{pre}.FFN.3.weight"] = torch.randn(h, h)
            sd[f"{pre}.FFN.3.bias"] = torch.randn(h)
            for nm in ("norm1", "norm2"):
                sd[f"{pre}.{nm}.weight"] = torch.randn(h)
                sd[f"{pre}.{nm}.bias"] = torch.randn(h)
        sd[f"score_network.basis_mlp_modules.{m}.0.weight"] = torch.randn(coff, 2 * h)
        sd[f"score_network.basis_mlp_modules.{m}.0.bias"] = torch.randn(coff)
        sd[f"score_network.basis_mlp_modules.{m}.2.weight"] = torch.randn(3, coff)
        sd[f"score_network.basis_mlp_modules.{m}.2.bias"] = torch.randn(3)
    return sd


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_import_sde_2dto3d_into_model(variant):
    from moleculesde_tpu.models import SDEModel2Dto3D
    from moleculesde_tpu.utils.torch_import import import_sde_2dto3d

    emb, h = 16, 8
    sd = _fake_sde_2dto3d_state_dict(emb=emb, h=h, variant=variant)
    params, stats = import_sde_2dto3d(sd, variant=variant)

    batch = synthetic_batch(num_graphs=2, n_max=6, seed=3)
    model = SDEModel2Dto3D(emb_dim=emb, hidden_dim=h, variant=variant)
    key = jax.random.PRNGKey(0)
    node_2d = jax.numpy.zeros((batch.num_nodes, emb))
    ref_vars = model.init({"params": key, "dropout": key}, node_2d, batch, key,
                          method=SDEModel2Dto3D.loss)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"])
    imp_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == imp_shapes
    variables = {"params": params,
                 "batch_stats": stats or ref_vars.get("batch_stats", {})}
    out, _ = model.apply(variables, node_2d, batch, key, 0.0, True, True,
                         mutable=["batch_stats"],
                         method=SDEModel2Dto3D.loss)
    assert np.isfinite(float(out["position"]))


def _fake_sde_3dto2d_state_dict(dim3d=8, nhid=4, num_layers=2, num_linears=2,
                                c_init=2, c_hid=3, c_final=2, adim=4,
                                nout=119):
    sd = {"embedding_3D.weight": torch.randn(dim3d, dim3d),
          "embedding_3D.bias": torch.randn(dim3d),
          "embedding_X.weight": torch.randn(dim3d, nout),
          "embedding_X.bias": torch.randn(dim3d)}
    for i in range(num_layers):
        attn_dim = nhid if i == 0 else adim
        f_in = dim3d if i == 0 else nhid
        c_in = c_init if i == 0 else c_hid
        c_out = c_final if i == num_layers - 1 else c_hid
        for c in range(c_in):
            pre = f"edge_score_network.layers.{i}.attn.{c}"
            for fn in ("func_q", "func_k"):
                sd[f"{pre}.{fn}.layers.0.weight"] = torch.randn(2 * attn_dim, f_in)
                sd[f"{pre}.{fn}.layers.0.bias"] = torch.randn(2 * attn_dim)
                sd[f"{pre}.{fn}.layers.1.weight"] = torch.randn(2 * attn_dim, 2 * attn_dim)
                sd[f"{pre}.{fn}.layers.1.bias"] = torch.randn(2 * attn_dim)
            sd[f"{pre}.func_v.weight"] = torch.randn(f_in, nhid)  # [in, out]!
            sd[f"{pre}.func_v.bias"] = torch.randn(nhid)
        hidden = 2 * max(c_in, c_out)
        mc_dims = [c_in * nhid, hidden, nhid]
        for li in range(2):
            sd[f"edge_score_network.layers.{i}.multi_channel.layers.{li}.weight"] = \
                torch.randn(mc_dims[li + 1], mc_dims[li])
            sd[f"edge_score_network.layers.{i}.multi_channel.layers.{li}.bias"] = \
                torch.randn(mc_dims[li + 1])
        mlp_dims = [2 * c_in] + [hidden] * (num_linears - 1) + [c_out]
        for li in range(num_linears):
            sd[f"edge_score_network.layers.{i}.mlp.layers.{li}.weight"] = \
                torch.randn(mlp_dims[li + 1], mlp_dims[li])
            sd[f"edge_score_network.layers.{i}.mlp.layers.{li}.bias"] = \
                torch.randn(mlp_dims[li + 1])
    fdim = c_hid * (num_layers - 1) + c_final + c_init
    fe_dims = [fdim, 2 * fdim, 2 * fdim, 1]
    for li in range(3):
        sd[f"edge_score_network.final.layers.{li}.weight"] = \
            torch.randn(fe_dims[li + 1], fe_dims[li])
        sd[f"edge_score_network.final.layers.{li}.bias"] = torch.randn(fe_dims[li + 1])
    for i in range(num_layers):
        f_in = dim3d if i == 0 else nhid
        sd[f"node_score_network.layers.{i}.weight"] = torch.randn(f_in, nhid)
        sd[f"node_score_network.layers.{i}.bias"] = torch.randn(nhid)
    nfdim = dim3d + num_layers * nhid
    fn_dims = [nfdim, 2 * nfdim, 2 * nfdim, nout]
    for li in range(3):
        sd[f"node_score_network.final.layers.{li}.weight"] = \
            torch.randn(fn_dims[li + 1], fn_dims[li])
        sd[f"node_score_network.final.layers.{li}.bias"] = torch.randn(fn_dims[li + 1])
    return sd


def test_import_sde_3dto2d_into_model():
    from moleculesde_tpu.models import SDEModel3Dto2D
    from moleculesde_tpu.utils.torch_import import import_sde_3dto2d

    kw = dict(dim3d=8, nhid=4, num_layers=2, num_linears=2, c_init=2,
              c_hid=3, c_final=2, adim=4)
    sd = _fake_sde_3dto2d_state_dict(**kw)
    params = import_sde_3dto2d(sd, num_layers=2, num_linears=2,
                               c_init=2, c_hid=3)

    batch = synthetic_batch(num_graphs=2, n_max=6, seed=4)
    model = SDEModel3Dto2D(dim3d=8, nhid=4, num_layers=2, num_linears=2,
                           c_init=2, c_hid=3, c_final=2, adim=4, num_heads=2)
    key = jax.random.PRNGKey(0)
    node_3d = jax.numpy.zeros((batch.num_nodes, 8))
    ref_vars = model.init(key, node_3d, batch, key)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"])
    imp_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == imp_shapes
    lx, ladj = model.apply({"params": params}, node_3d, batch, key)
    assert np.isfinite(float(lx)) and np.isfinite(float(ladj))


def test_import_schnet_atomref_roundtrip():
    """atomref is Embedding(100, 1): a per-node scalar offset added to the
    head output (ref schnet.py:66-70, 112-113).  Import must map it and the
    flax model must apply it with identical semantics."""
    sd = _fake_schnet_state_dict()
    table = torch.randn(100, 1)
    sd["atomref.weight"] = table
    params = import_schnet(sd, num_interactions=2)
    assert params["atomref"]["embedding"].shape == (100, 1)

    batch = synthetic_batch(num_graphs=2, n_max=6, seed=1)
    base = SchNet(hidden_channels=8, num_filters=8, num_interactions=2,
                  num_gaussians=5)
    with_ref = SchNet(hidden_channels=8, num_filters=8, num_interactions=2,
                      num_gaussians=5, use_atomref=True, readout="add")
    base_add = SchNet(hidden_channels=8, num_filters=8, num_interactions=2,
                      num_gaussians=5, readout="add")
    params_noref = {k: v for k, v in params.items() if k != "atomref"}
    p0, l0 = base_add.apply({"params": params_noref}, batch.atomic_numbers,
                            batch.positions, batch.node_mask, 2, 6)
    p1, l1 = with_ref.apply({"params": params}, batch.atomic_numbers,
                            batch.positions, batch.node_mask, 2, 6)
    # per-node offset = table[z], broadcast over the feature dim
    z = np.asarray(batch.atomic_numbers)
    offs = table.numpy()[np.clip(z, 0, 99), 0]
    expected = np.asarray(l0) + offs[:, None] * np.asarray(
        batch.node_mask)[:, None]
    np.testing.assert_allclose(np.asarray(l1), expected, atol=1e-5)
