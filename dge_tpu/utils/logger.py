"""Metrics logging: JSONL scalars + console.

Reference analog: the TensorBoard/CSV/wandb loggers of launch.py:113-178 and
the self.log() scalar stream (DGE.py:678-697). A JSONL file per trial is the
dependency-free equivalent; TensorBoard export can be layered on by reading
the JSONL.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, trial_dir: str, name: str = "metrics"):
        os.makedirs(trial_dir, exist_ok=True)
        self.path = os.path.join(trial_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {
            "step": int(step),
            "wall": round(time.time() - self._t0, 3),
            **{k: float(v) for k, v in scalars.items()},
        }
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
