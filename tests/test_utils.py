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


def test_metrics_logger(tmp_path):
    p = str(tmp_path / 'm.jsonl')
    lg = MetricsLogger(p)
    lg.log(0, loss=1.5, mae=0.2)
    lg.log(1, loss=1.2)
    lg.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]['loss'] == 1.5 and lines[1]['step'] == 1
