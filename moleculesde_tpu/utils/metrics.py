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
