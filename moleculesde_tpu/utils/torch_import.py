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
    return params


def import_pretrain_checkpoint(path: str, num_gin_layers: int = 5,
                               num_schnet_interactions: int = 6):
    """Load a reference ``model_complete.pth`` and convert the encoder
    components.  Returns {"model_2D": (params, stats), "model_3D": params}."""
    payload = load_torch_state_dict(path)
    out: Dict[str, Any] = {}
    if "model_2D" in payload:
        out["model_2D"] = import_gin(payload["model_2D"], num_gin_layers)
    if "model_3D" in payload:
        sd3 = payload["model_3D"]
        if any(k.startswith("interactions.") for k in sd3):
            out["model_3D"] = import_schnet(sd3, num_schnet_interactions)
        else:
            raise NotImplementedError(
                "only SchNet model_3D import is supported (PaiNN pending)")
    return out
