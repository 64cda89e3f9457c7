"""Metrics / logging (reference: tensorboardX writers per process
train.py:17,86-104, test scalars test.py:94-98; text logger utils.py:11-21).

Scalar names match the reference so dashboards translate 1:1. Backends:
JSONL (always) + TensorBoard via tensorboardX when importable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def setup_logger(name: str, log_file: str,
                 level: int = logging.INFO) -> logging.Logger:
    """utils.py:11-21."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s : %(message)s")
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file, mode="w")
        fh.setFormatter(fmt)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(fh)
        logger.addHandler(sh)
    return logger


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "wall": time.time() - self._t0}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
