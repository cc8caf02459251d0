"""Evaluation metrics and structured logging.

Replaces the reference's print-only observability (SURVEY.md section 5) with
a CSV metrics logger while keeping the same console line formats for parity.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional

import numpy as np


def roc_auc_per_task(y_true: np.ndarray, y_scores: np.ndarray) -> List[float]:
    """Per-task ROC-AUC on {-1, 0, +1} masked labels: 0 marks missing; tasks
    without both classes are skipped (reference
    examples/finetune_MoleculeNet.py:193-210)."""
    from sklearn.metrics import roc_auc_score

    aucs = []
    for t in range(y_true.shape[1]):
        yt = y_true[:, t]
        valid = yt != 0
        if valid.sum() == 0:
            continue
        labels = (yt[valid] + 1) / 2
        if len(np.unique(labels)) < 2:
            continue
        aucs.append(roc_auc_score(labels, y_scores[valid, t]))
    return aucs


def roc_auc_mean_device(y_true, y_scores):
    """On-device mean per-task ROC-AUC over {-1, 0, +1} masked labels.

    jnp twin of :func:`roc_auc_per_task` (reference
    examples/finetune_MoleculeNet.py:193-210) so finetune eval loops can stay
    free of device->host transfers (the first D2H permanently degrades
    dispatch latency on tunneled TPUs; see CLAUDE.md).  Uses the rank-sum
    (Mann-Whitney U) formulation with midranks for ties — identical to
    sklearn.metrics.roc_auc_score.

    ``y_true``/``y_scores``: [M, T].  Returns (mean_auc, n_valid_tasks) as
    device scalars; tasks lacking a positive or a negative example are
    skipped, matching the reference.
    """
    import jax
    import jax.numpy as jnp

    def one_task(y, s):
        valid = y != 0
        pos = (y == 1)
        neg = (y == -1)
        # invalid rows get +inf scores: they sort to the top and never affect
        # searchsorted counts for finite valid scores
        s_v = jnp.where(valid, s, jnp.inf)
        s_sorted = jnp.sort(s_v)
        lt = jnp.searchsorted(s_sorted, s_v, side="left")
        le = jnp.searchsorted(s_sorted, s_v, side="right")
        midrank = (lt + le + 1).astype(jnp.float32) / 2.0
        p = pos.sum().astype(jnp.float32)
        n = neg.sum().astype(jnp.float32)
        rank_sum = jnp.where(pos, midrank, 0.0).sum()
        auc = (rank_sum - p * (p + 1) / 2) / jnp.maximum(p * n, 1.0)
        ok = (p > 0) & (n > 0)
        return jnp.where(ok, auc, 0.0), ok

    aucs, oks = jax.vmap(one_task, in_axes=(1, 1))(y_true, y_scores)
    n_ok = oks.sum()
    return aucs.sum() / jnp.maximum(n_ok, 1), n_ok


def device_get_compact(tree):
    """``jax.device_get`` with ONE device->host transfer for scalar pytrees.

    On this image's tunneled TPU each D2H transfer costs seconds once
    dispatch is in the degraded regime; pulling an epoch's pending metrics
    leaf-by-leaf multiplies that.  When every array leaf is a scalar they are
    stacked into a single device vector first (one small program + one
    transfer); otherwise falls back to plain device_get."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arr_idx = [i for i, l in enumerate(leaves)
               if hasattr(l, "shape") and hasattr(l, "dtype")]
    if arr_idx and all(leaves[i].shape == () for i in arr_idx):
        stacked = jnp.stack(
            [leaves[i].astype(jnp.float64
                              if leaves[i].dtype == jnp.float64
                              else jnp.float32) for i in arr_idx])
        vals = np.asarray(jax.device_get(stacked))
        out = list(leaves)
        for j, i in enumerate(arr_idx):
            out[i] = vals[j]
        return jax.tree_util.tree_unflatten(treedef, out)
    return jax.device_get(tree)


class MetricsLogger:
    """Append-only CSV logger + console passthrough."""

    def __init__(self, output_dir: Optional[str] = None, filename: str = "metrics.csv"):
        self.path = None
        self._fields: Optional[List[str]] = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self.path = os.path.join(output_dir, filename)
        self.t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], echo: Optional[str] = None):
        if echo:
            print(echo)
        if self.path is None:
            return
        row = {"step": step, "wall_time": time.time() - self.t0}
        row.update({k: float(v) for k, v in metrics.items()})
        write_header = self._fields is None
        if self._fields is None:
            self._fields = list(row.keys())
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)
