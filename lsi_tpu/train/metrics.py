"""Metric logging: scalars to jsonl + stdout.

Capability parity with the reference's ``tf.summary`` scalar logging
(losses, periodic progress) in ``lsi/nnutils/train_utils.py`` — re-expressed
without a TF dependency: newline-delimited JSON that any dashboard can tail,
plus human-readable stdout lines. Image summaries are exported by the eval
tooling as PNGs instead.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: Optional[str] = None, name: str = "train"):
        self._file = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{name}.jsonl"), "a",
                              buffering=1)
        self._t0 = time.time()

    def write(self, step: int, scalars: Dict[str, float],
              echo: bool = True) -> None:
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
        if echo:
            parts = " ".join(f"{k}={float(v):.5g}"
                             for k, v in scalars.items())
            print(f"[step {step}] {parts}", flush=True)

    def close(self) -> None:
        if self._file:
            self._file.close()
