"""Import reference PyTorch checkpoints into this framework's parameter trees.

The reference releases pretrain checkpoints as ``model_complete.pth`` — a dict
of four component state_dicts (reference examples/pretrain_MoleculeSDE.py:
72-103).  This module maps the two encoder components the finetune CLIs
consume onto our Flax trees:

- ``model_2D`` (GIN, reference Geom3D/models/molecule_gnn_model.py:132-197)
  -> :class:`moleculesde_tpu.models.GNN2D` params + batch_stats
- ``model_3D`` (SchNet, reference Geom3D/models/schnet.py:16-135)
  -> :class:`moleculesde_tpu.models.SchNet` params

torch Linear weights are [out, in] and become transposed Flax kernels;
BatchNorm running statistics land in the ``batch_stats`` collection.  Only
plain-tensor state_dicts are needed, so ``torch.load(weights_only=True)``
works without any PyG installation.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    return payload


def _lin(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def import_gin(sd: Dict[str, Any], num_layers: int = 5):
    """Reference GNN (GIN) state_dict -> (params, batch_stats)."""
    params: Dict[str, Any] = {"AtomEncoder_0": {}}
    stats: Dict[str, Any] = {}
    for i in range(9):
        params["AtomEncoder_0"][f"atom_embedding_{i}"] = {
            "embedding": _np(sd[f"atom_encoder.atom_embedding_list.{i}.weight"])}
    for l in range(num_layers):
        conv: Dict[str, Any] = {"BondEncoder_0": {}}
        for i in range(3):
            conv["BondEncoder_0"][f"bond_embedding_{i}"] = {
                "embedding": _np(sd[f"gnns.{l}.bond_encoder.bond_embedding_list.{i}.weight"])}
        conv["Dense_0"] = _lin(sd, f"gnns.{l}.mlp.0")
        bn_p, bn_s = _bn(sd, f"gnns.{l}.mlp.1")
        conv["MaskedBatchNorm_0"] = bn_p
        conv["Dense_1"] = _lin(sd, f"gnns.{l}.mlp.3")
        conv["eps"] = _np(sd[f"gnns.{l}.eps"])
        params[f"GINConv_{l}"] = conv
        stats[f"GINConv_{l}"] = {"MaskedBatchNorm_0": bn_s}

        bn_p, bn_s = _bn(sd, f"batch_norms.{l}")
        params[f"MaskedBatchNorm_{l}"] = bn_p
        stats[f"MaskedBatchNorm_{l}"] = bn_s
    return params, stats


def import_schnet(sd: Dict[str, Any], num_interactions: int = 6):
    """Reference SchNet state_dict -> params (no batch stats)."""
    params: Dict[str, Any] = {
        "Embed_0": {"embedding": _np(sd["embedding.weight"])},
        "Dense_0": _lin(sd, "lin1"),
        "Dense_1": _lin(sd, "lin2"),
    }
    for k in range(num_interactions):
        params[f"SchNetInteraction_{k}"] = {
            "Dense_0": _lin(sd, f"interactions.{k}.mlp.0"),
            "Dense_1": _lin(sd, f"interactions.{k}.mlp.2"),
            "Dense_2": _lin(sd, f"interactions.{k}.conv.lin1"),
            "Dense_3": _lin(sd, f"interactions.{k}.conv.lin2"),
            "Dense_4": _lin(sd, f"interactions.{k}.lin"),
        }
    if "atomref.weight" in sd:
        # per-node scalar offset table (ref schnet.py:66-70); requires the
        # flax model to be built with use_atomref=True
        params["atomref"] = {"embedding": _np(sd["atomref.weight"])}
    return params


def import_painn(sd: Dict[str, Any], n_interactions: int = 3):
    """Reference PaiNN state_dict (reference Geom3D/models/painn.py:117-269)
    -> :class:`moleculesde_tpu.models.PaiNN` params.

    Module mapping (reference attr -> flax name):
      embedding -> Embed_0; filter_net -> filter_net;
      interactions.{i}.interatomic_context_net.{0,1} ->
        PaiNNInteraction_{i}.Dense_{0,1};
      mixing.{i}.mu_channel_mix (bias-free) -> PaiNNMixing_{i}.Dense_0;
      mixing.{i}.intraatomic_context_net.{0,1} -> PaiNNMixing_{i}.Dense_{1,2}.
    """
    params: Dict[str, Any] = {
        "Embed_0": {"embedding": _np(sd["embedding.weight"])},
        "filter_net": _lin(sd, "filter_net"),
    }
    for i in range(n_interactions):
        params[f"PaiNNInteraction_{i}"] = {
            "Dense_0": _lin(sd, f"interactions.{i}.interatomic_context_net.0"),
            "Dense_1": _lin(sd, f"interactions.{i}.interatomic_context_net.1"),
        }
        params[f"PaiNNMixing_{i}"] = {
            "Dense_0": _lin(sd, f"mixing.{i}.mu_channel_mix"),
            "Dense_1": _lin(sd, f"mixing.{i}.intraatomic_context_net.0"),
            "Dense_2": _lin(sd, f"mixing.{i}.intraatomic_context_net.1"),
        }
    return params


def _mlp(sd, prefix, n_layers) -> Dict[str, Any]:
    """Reference MultiLayerPerceptron (layers/common.py:5-40, keys
    ``<prefix>.layers.{i}``) -> flax MLP {Dense_i} tree."""
    return {f"Dense_{i}": _lin(sd, f"{prefix}.layers.{i}")
            for i in range(n_layers)}


def _gat_layer(sd, prefix) -> Dict[str, Any]:
    """Reference GATLayer (equivariant_scorenetwork.py:13-40: PyG
    TransformerConv + FFN + 2 LayerNorms) -> DenseGATLayer tree."""
    out: Dict[str, Any] = {}
    for lin in ("lin_query", "lin_key", "lin_value", "lin_edge", "lin_skip"):
        p = _lin(sd, f"{prefix}.MHA.{lin}")
        if "bias" not in p:  # PyG lin_edge has bias=False; ours has a zero bias
            p["bias"] = np.zeros((p["kernel"].shape[1],), np.float32)
        out[lin] = p
    out["Dense_0"] = _lin(sd, f"{prefix}.FFN.0")
    out["Dense_1"] = _lin(sd, f"{prefix}.FFN.3")
    out["LayerNorm_0"] = {"scale": _np(sd[f"{prefix}.norm1.weight"]),
                          "bias": _np(sd[f"{prefix}.norm1.bias"])}
    out["LayerNorm_1"] = {"scale": _np(sd[f"{prefix}.norm2.weight"]),
                          "bias": _np(sd[f"{prefix}.norm2.bias"])}
    return out


def import_sde_2dto3d(sd: Dict[str, Any], variant: int = 1,
                      num_layers: int = 2, num_convs: int = 2):
    """Reference SDEModel2Dto3D_0{variant} state_dict
    (SDE_model_2D_to_3D.py) -> (params, batch_stats) for
    :class:`moleculesde_tpu.models.SDEModel2Dto3D`.

    The reference's pair Linear over ``concat(h_row, h_col)`` becomes our
    PairDense (same ``[2*emb, out]`` kernel after transposition); its
    BatchNorm1d becomes PairMaskedBatchNorm (identical variable names); the
    basis MLP's first Linear splits into basis_node (rows :hidden) and
    basis_edge (rows hidden:) halves, matching the h/e decomposition in
    score_2d3d.py.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if variant in (1, 2):
        params["edge_2D_emb_0"] = _lin(sd, "edge_2D_emb.0")
        bn_p, bn_s = _bn(sd, "edge_2D_emb.1")
        params["edge_2D_emb_bn"] = bn_p
        stats["edge_2D_emb_bn"] = bn_s
        params["edge_2D_emb_1"] = _lin(sd, "edge_2D_emb.3")
    elif variant == 3:
        params["edge_2D_emb"] = _lin(sd, "edge_2D_emb")
    else:  # variant 4 keeps the raw [2*emb, hidden] kernel
        lin = _lin(sd, "edge_2D_emb")
        params["edge_2D_emb_kernel"] = lin["kernel"]
        params["edge_2D_emb_bias"] = lin["bias"]
    if variant in (3, 4):
        params["edge_emb"] = {"embedding": _np(sd["edge_emb.weight"])}

    params["coff_fourier_W"] = _np(sd["coff_gaussian_fourier.W"])
    params["coff_mlp"] = _lin(sd, "coff_mlp")
    params["project"] = _mlp(sd, "project", 2)
    if variant == 2:
        params["dist_fourier_W"] = _np(sd["dist_gaussian_fourier.W"])
        params["input_mlp"] = _mlp(sd, "input_mlp", 1)
    params["node_emb"] = _mlp(sd, "node_emb", 1)

    net: Dict[str, Any] = {}
    for m in range(num_layers):
        for c in range(num_convs):
            net[f"DenseGATLayer_{m * num_convs + c}"] = _gat_layer(
                sd, f"score_network.gnn_layers.{m}.{c}")
        # first Linear of the basis MLP [coff, 2H] splits into the node half
        # (rows :H, applied per node) and the edge half (rows H:)
        w0 = _np(sd[f"score_network.basis_mlp_modules.{m}.0.weight"]).T
        b0 = _np(sd[f"score_network.basis_mlp_modules.{m}.0.bias"])
        h = w0.shape[0] // 2
        net[f"basis_node_{m}"] = {"kernel": w0[:h]}
        net[f"basis_edge_{m}"] = {"kernel": w0[h:], "bias": b0}
        net[f"basis_out_{m}"] = _lin(sd, f"score_network.basis_mlp_modules.{m}.2")
    params["score_network"] = net
    return params, stats


def import_sde_3dto2d(sd: Dict[str, Any], num_layers: int = 4,
                      num_linears: int = 3, c_init: int = 2, c_hid: int = 8):
    """Reference SDEModel3Dto2D_node_adj_dense state_dict
    (SDE_model_3D_to_2D_node_adj_dense.py + invariant_scorenetwork_dense.py +
    layers/edge_network_dense.py) -> params for
    :class:`moleculesde_tpu.models.SDEModel3Dto2D`.

    The reference's per-channel EdgeLayer banks (one module per adjacency
    channel) are stacked along a leading channel axis to feed our fused
    StackedEdgeLayers einsums; NodeNetwork_dense's ``weight`` is already
    [in, out] (node_network_dense.py:33 ``matmul(x, self.weight)``), so it
    maps without transposition.
    """
    def _node_net(prefix):
        out = {"kernel": _np(sd[f"{prefix}.weight"])}  # [in, out], no T
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    params: Dict[str, Any] = {
        "embedding_3D": _lin(sd, "embedding_3D"),
        "embedding_X": _lin(sd, "embedding_X"),
    }

    edge: Dict[str, Any] = {}
    for i in range(num_layers):
        n_ch = c_init if i == 0 else c_hid
        attn: Dict[str, Any] = {}
        for fn, ours in (("func_q", "q"), ("func_k", "k")):
            for li in range(2):
                ws, bs = [], []
                for c in range(n_ch):
                    pre = f"edge_score_network.layers.{i}.attn.{c}.{fn}.layers.{li}"
                    ws.append(_np(sd[f"{pre}.weight"]).T)
                    bs.append(_np(sd[f"{pre}.bias"]))
                attn[f"{ours}_kernel_{li}"] = np.stack(ws)
                attn[f"{ours}_bias_{li}"] = np.stack(bs)
        vs, vb = [], []
        for c in range(n_ch):
            nn_ = _node_net(f"edge_score_network.layers.{i}.attn.{c}.func_v")
            vs.append(nn_["kernel"])
            vb.append(nn_.get("bias", np.zeros(nn_["kernel"].shape[1], np.float32)))
        attn["v_kernel"] = np.stack(vs)
        attn["v_bias"] = np.stack(vb)

        layer = {"attn": attn,
                 "multi_channel": _mlp(
                     sd, f"edge_score_network.layers.{i}.multi_channel", 2),
                 "mlp": _mlp(sd, f"edge_score_network.layers.{i}.mlp",
                             num_linears)}
        edge[f"layer_{i}"] = layer
    edge["final"] = _mlp(sd, "edge_score_network.final", 3)
    params["edge_score_network"] = edge

    node: Dict[str, Any] = {}
    for i in range(num_layers):
        node[f"layer_{i}"] = {
            "Dense_0": _node_net(f"node_score_network.layers.{i}")}
    node["final"] = _mlp(sd, "node_score_network.final", 3)
    params["node_score_network"] = node
    return params


def import_pretrain_checkpoint(path: str, num_gin_layers: int = 5,
                               num_schnet_interactions: int = 6,
                               num_painn_interactions: int = 3,
                               sde_2dto3d_variant: int = 1):
    """Load a reference ``model_complete.pth`` (reference
    pretrain_MoleculeSDE.py:72-103) and convert ALL four components.

    Returns {"model_2D": (params, stats), "model_3D": params,
             "SDE_2Dto3D_model": (params, stats), "SDE_3Dto2D_model": params}
    with keys present for whichever components the file carries — enough to
    drive both finetuning and the 2D->3D / 3D->2D samplers end-to-end."""
    payload = load_torch_state_dict(path)
    out: Dict[str, Any] = {}
    if "model_2D" in payload:
        out["model_2D"] = import_gin(payload["model_2D"], num_gin_layers)
    if "model_3D" in payload:
        sd3 = payload["model_3D"]
        if any(k.startswith("interactions.") for k in sd3):
            out["model_3D"] = import_schnet(sd3, num_schnet_interactions)
        else:
            out["model_3D"] = import_painn(sd3, num_painn_interactions)
    if "SDE_2Dto3D_model" in payload:
        out["SDE_2Dto3D_model"] = import_sde_2dto3d(
            payload["SDE_2Dto3D_model"], variant=sde_2dto3d_variant)
    if "SDE_3Dto2D_model" in payload:
        out["SDE_3Dto2D_model"] = import_sde_3dto2d(payload["SDE_3Dto2D_model"])
    return out
