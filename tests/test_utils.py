"""Checkpoint/resume and logging utilities."""

import json
import os

import numpy as np

from pna_tpu.utils.checkpoint import (CheckpointManager, load_checkpoint,
                                      save_checkpoint)
from pna_tpu.utils.logging import MetricsLogger


def test_checkpoint_roundtrip(tmp_path):
    state = dict(params={'w': np.arange(6.0).reshape(2, 3)},
                 epoch=np.int64(3))
    p = str(tmp_path / 'c.ckpt')
    save_checkpoint(p, state, dict(note='x'))
    s2, meta = load_checkpoint(p)
    np.testing.assert_array_equal(s2['params']['w'], state['params']['w'])
    assert meta['note'] == 'x'


def test_checkpoint_manager_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep_best=1, mode='min')
    st = {'w': np.zeros(2)}
    assert mgr.save_best(st, 1.0, epoch=0)
    assert mgr.save_best(st, 0.5, epoch=1)      # better -> kept, old removed
    assert not mgr.save_best(st, 0.9, epoch=2)  # worse -> skipped
    files = [f for f in os.listdir(tmp_path) if f.startswith('best_')]
    assert files == ['best_1.ckpt']
    state, meta = mgr.restore_best()
    assert meta['epoch'] == 1

    mgr.save_latest(st, epoch=5)
    _, meta = mgr.restore_latest()
    assert meta['epoch'] == 5


def test_checkpoint_manager_resume_rotation(tmp_path):
    """After a resume (fresh manager over an existing dir), pre-resume
    best_* files must participate in rotation and best-selection by metric,
    not by filename (ADVICE r2: best_5 beat best_12 lexicographically)."""
    st = {'w': np.zeros(2)}
    mgr1 = CheckpointManager(str(tmp_path), keep_best=1, mode='min')
    mgr1.save_best(st, 1.0, epoch=5)

    # simulate process restart: new manager over the same directory
    mgr2 = CheckpointManager(str(tmp_path), keep_best=1, mode='min')
    assert mgr2.best and mgr2.best[0][0] == 1.0  # seeded from disk
    assert mgr2.save_best(st, 0.4, epoch=12)     # better -> rotates best_5 out
    files = sorted(f for f in os.listdir(tmp_path) if f.startswith('best_'))
    assert files == ['best_12.ckpt']

    # even with an un-seeded manager, restore_best picks by metric
    mgr1.save_best({'w': np.ones(2)}, 0.9, epoch=5)  # re-create worse best_5
    mgr3 = CheckpointManager.__new__(CheckpointManager)
    mgr3.dir, mgr3.keep_best, mgr3.mode, mgr3.best = str(tmp_path), 1, 'min', []
    state, meta = mgr3.restore_best()
    assert meta['epoch'] == 12 and meta['metric'] == 0.4


def test_metrics_logger(tmp_path):
    p = str(tmp_path / 'm.jsonl')
    lg = MetricsLogger(p)
    lg.log(0, loss=1.5, mae=0.2)
    lg.log(1, loss=1.2)
    lg.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]['loss'] == 1.5 and lines[1]['step'] == 1
