"""CSV metrics logger.

Writes ``<log_dir>/version_<N>/metrics.csv`` in the same shape as
PyTorch-Lightning's CSVLogger output that the reference's terminal plotter
consumes (`medical_image_segmentation/analyze_data/plot_metrics_in_terminal.py:16-41`
reads columns by metric name plus ``epoch``/``step``): one row per log call,
union-of-keys header, blanks for absent metrics.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional


class CSVMetricsLogger:
    def __init__(self, log_dir: str = "logs", name: str = "lightning_logs", version: Optional[int] = None):
        base = os.path.join(log_dir, name)
        os.makedirs(base, exist_ok=True)
        if version is None:
            existing = [
                int(d.split("_", 1)[1])
                for d in os.listdir(base)
                if d.startswith("version_") and d.split("_", 1)[1].isdigit()
            ]
            version = max(existing, default=-1) + 1
        self.dir = os.path.join(base, f"version_{version}")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.csv")
        self._rows = []
        self._keys = []
        self._appended = 0  # rows already on disk under the current header

    def log(self, metrics: Dict[str, float], step: int, epoch: Optional[int] = None):
        row = {k: float(v) for k, v in metrics.items()}
        row["step"] = step
        if epoch is not None:
            row["epoch"] = epoch
        new_keys = [k for k in row if k not in self._keys]
        self._keys.extend(new_keys)
        self._rows.append(row)
        self._flush(rewrite=bool(new_keys))

    def _flush(self, rewrite: bool):
        """Append rows under a stable header; rewrite the file only when a
        new metric key appears (keeps per-step logging O(1), not O(steps))."""
        if rewrite or self._appended == 0:
            tmp = self.path + ".tmp"
            with open(tmp, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._keys)
                writer.writeheader()
                writer.writerows(self._rows)
            os.replace(tmp, self.path)
        else:
            with open(self.path, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._keys)
                writer.writerows(self._rows[self._appended:])
        self._appended = len(self._rows)
