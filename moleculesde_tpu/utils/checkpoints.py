"""Checkpointing with reference-compatible component-keyed layout + full resume.

The reference saves ``model_complete.pth`` = a dict of the four component
state_dicts on best epoch loss and ``model_complete_final.pth`` at the end
(reference examples/pretrain_MoleculeSDE.py:72-103); finetune scripts load
the ``model_2D`` / ``model_3D`` keys (finetune_MoleculeNet.py:70-80,
finetune_QM9.py:95-108).  We keep the same component-key contract in
msgpack files (``model_complete.msgpack`` / ``model_complete_final.msgpack``)
and additionally support full train-state save/restore (params + optimizer +
step + PRNG key) — mid-run resume, which the reference lacks entirely
(SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_state_dict(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_pretrain_checkpoint(
    output_dir: str,
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    best: bool = True,
) -> str:
    """Save the 4-component pretrain checkpoint (best or final naming)."""
    os.makedirs(output_dir, exist_ok=True)
    name = "model_complete.msgpack" if best else "model_complete_final.msgpack"
    path = os.path.join(output_dir, name)
    payload = {"params": _to_state_dict(params)}
    if batch_stats is not None:
        payload["batch_stats"] = _to_state_dict(batch_stats)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return path


def load_pretrain_checkpoint(path: str, component: Optional[str] = None):
    """Load the component-keyed checkpoint; optionally select one component
    (e.g. ``model_2D`` for MoleculeNet finetuning, ``model_3D`` for QM9/MD17),
    returning (params, batch_stats)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = payload["params"]
    batch_stats = payload.get("batch_stats", {})
    if component is not None:
        return params.get(component), batch_stats.get(component, {})
    return params, batch_stats


def save_train_state(path: str, state: Any, extra: Optional[Dict] = None) -> str:
    """Full-state checkpoint (params + opt state + step + ...) for resume."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"state": serialization.to_state_dict(_to_state_dict(state))}
    if extra:
        payload["extra"] = _to_state_dict(extra)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return path


def load_train_state(path: str, target: Any) -> Tuple[Any, Dict]:
    """Restore into a template state pytree; returns (state, extra)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(target, payload["state"])
    return state, payload.get("extra", {})
