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


def test_tb_event_writer_format(tmp_path):
    """The dependency-free TB writer must emit valid TFRecord framing
    (masked-CRC32C verified) and decodable Event protos (independent
    minimal decoder here, not the writer's own encoder)."""
    import glob
    import struct
    from pna_tpu.utils.tb_writer import TBEventWriter, _masked_crc

    w = TBEventWriter(str(tmp_path))
    w.add_scalar('loss/train', 0.5, 1)
    w.add_scalars(2, mae=0.25, lr=1e-3)
    w.close()

    fn = glob.glob(str(tmp_path / 'events.out.tfevents.*'))[0]
    data = open(fn, 'rb').read()

    def read_records(buf):
        off = 0
        while off < len(buf):
            (ln,) = struct.unpack_from('<Q', buf, off)
            (crc_len,) = struct.unpack_from('<I', buf, off + 8)
            assert crc_len == _masked_crc(buf[off:off + 8])
            payload = buf[off + 12:off + 12 + ln]
            (crc_data,) = struct.unpack_from('<I', buf, off + 12 + ln)
            assert crc_data == _masked_crc(payload)
            yield payload
            off += 12 + ln + 4

    def parse_fields(buf):
        """Minimal proto wire parser: {field: [raw values]}."""
        out, off = {}, 0
        while off < len(buf):
            key = 0
            shift = 0
            while True:
                b = buf[off]; off += 1
                key |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            field, wire = key >> 3, key & 7
            if wire == 0:
                v = 0
                shift = 0
                while True:
                    b = buf[off]; off += 1
                    v |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
            elif wire == 1:
                v = struct.unpack_from('<d', buf, off)[0]; off += 8
            elif wire == 5:
                v = struct.unpack_from('<f', buf, off)[0]; off += 4
            elif wire == 2:
                ln = 0
                shift = 0
                while True:
                    b = buf[off]; off += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                v = buf[off:off + ln]; off += ln
            else:
                raise AssertionError(f'wire {wire}')
            out.setdefault(field, []).append(v)
        return out

    records = list(read_records(data))
    assert len(records) == 3
    header = parse_fields(records[0])
    assert header[3][0] == b'brain.Event:2'
    ev1 = parse_fields(records[1])
    assert ev1[2][0] == 1                       # step
    val = parse_fields(parse_fields(ev1[5][0])[1][0])
    assert val[1][0] == b'loss/train'
    assert abs(val[2][0] - 0.5) < 1e-7
    ev2 = parse_fields(records[2])
    assert ev2[2][0] == 2
    tags = {parse_fields(v)[1][0] for v in parse_fields(ev2[5][0])[1]}
    assert tags == {b'mae', b'lr'}
