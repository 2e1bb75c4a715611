"""Structured metrics logging.

The reference logs via tensorboardX SummaryWriter + tqdm + results text files
(realworld_benchmark/main_molecules.py:16,91,138-142,187-193 — SURVEY §5).
Here: JSONL per-step/epoch metrics (machine-readable for the bench harness)
with optional TensorBoard mirroring when tensorboardX is importable."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None,
                 stdout: bool = False):
        self.path = path
        self.stdout = stdout
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, 'a')
        self._tb = None
        if tensorboard_dir:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(tensorboard_dir)
            except ImportError:
                # dependency-free event writer (same add_scalar interface,
                # files readable by stock TensorBoard) — closes the last
                # observability delta vs the reference's tensorboardX logging
                from pna_tpu.utils.tb_writer import TBEventWriter
                self._tb = TBEventWriter(tensorboard_dir)

    def log(self, step: int, **metrics: Any) -> None:
        rec = dict(step=step, time=time.time(), **metrics)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self.stdout:
            print(json.dumps(rec))
        if self._tb:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        if self._f:
            self._f.close()
        if self._tb:
            self._tb.close()


def param_count(params) -> int:
    """view_model_param equivalent (main_molecules.py:380-390)."""
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
