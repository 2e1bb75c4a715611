"""Checkpoint / resume.

The reference only saves best-model state_dicts and never resumes
(multitask_benchmark/util/train.py:207-218; realworld mains create a
checkpoints/ dir but never write — SURVEY §5).  This module provides real
checkpoint-restart: params + optimizer state + PRNG key + epoch counter saved
as a pytree, best-k rotation, and exact resume (data order is derived from
seeded PRNG keys, so a restored run continues deterministically)."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state: Dict[str, Any],
                    metadata: Optional[dict] = None) -> None:
    """Atomically write a checkpoint (pytree of arrays + metadata)."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    payload = dict(state=_to_host(state), metadata=metadata or {})
    tmp = path + ".tmp"
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with open(path, 'rb') as f:
        payload = pickle.load(f)
    return payload['state'], payload.get('metadata', {})


class CheckpointManager:
    """Best-k rotation (the reference keeps exactly the best epoch and deletes
    the previous one, train.py:207-218; default keep=1 mirrors that) plus a
    'latest' checkpoint for resume."""

    def __init__(self, directory: str, keep_best: int = 1, mode: str = 'min'):
        self.dir = directory
        self.keep_best = keep_best
        self.mode = mode
        self.best: list = []  # [(metric, path)]
        os.makedirs(directory, exist_ok=True)
        # Seed from checkpoints written before a resume, so rotation deletes
        # them and restore_best never prefers a stale pre-resume file.
        for fname in os.listdir(directory):
            if not (fname.startswith('best_') and fname.endswith('.ckpt')):
                continue
            path = os.path.join(directory, fname)
            try:
                _, meta = load_checkpoint(path)
                metric = float(meta['metric'])
            except Exception:
                continue
            self.best.append((metric, path))
        self.best.sort(key=lambda t: t[0], reverse=(self.mode == 'max'))

    def _better(self, a, b):
        return a < b if self.mode == 'min' else a > b

    def save_latest(self, state, epoch: int, **meta):
        save_checkpoint(os.path.join(self.dir, 'latest.ckpt'), state,
                        dict(epoch=epoch, **meta))

    def save_best(self, state, metric: float, epoch: int, **meta) -> bool:
        """Save if among the best-k; rotates old checkpoints out. Returns
        whether this checkpoint was kept."""
        if len(self.best) < self.keep_best or self._better(
                metric, self.best[-1][0]):
            path = os.path.join(self.dir, f'best_{epoch}.ckpt')
            save_checkpoint(path, state, dict(epoch=epoch, metric=metric,
                                              **meta))
            self.best.append((metric, path))
            self.best.sort(key=lambda t: t[0],
                           reverse=(self.mode == 'max'))
            while len(self.best) > self.keep_best:
                _, old = self.best.pop()
                if os.path.exists(old):
                    os.remove(old)
            return True
        return False

    def restore_latest(self):
        path = os.path.join(self.dir, 'latest.ckpt')
        if not os.path.exists(path):
            return None, None
        return load_checkpoint(path)

    def restore_best(self):
        if not self.best:
            # scan directory, selecting by the recorded metric (not by
            # filename order — best_5 vs best_12 sorts wrong lexically)
            cands = []
            for fname in os.listdir(self.dir):
                if not (fname.startswith('best_')
                        and fname.endswith('.ckpt')):
                    continue
                path = os.path.join(self.dir, fname)
                try:
                    _, meta = load_checkpoint(path)
                    cands.append((float(meta['metric']), path))
                except Exception:
                    continue
            if not cands:
                return None, None
            cands.sort(key=lambda t: t[0], reverse=(self.mode == 'max'))
            return load_checkpoint(cands[0][1])
        return load_checkpoint(self.best[0][1])
