"""Distributed large-graph trainer (pna_tpu/train/largegraph.py): multi-epoch
edge-partitioned training with a node-level objective converges on the
virtual mesh, resumes exactly from checkpoints, and the partition-layout
helpers (edge_origin / sort_partition_edges) are self-consistent.

This is the distributed counterpart of what tests/test_engine.py checks for
the single-device training engine (reference anchor:
/root/reference/multitask_benchmark/util/train.py:122-232)."""

import json
import os

import numpy as np
import pytest

import jax

from pna_tpu.parallel.partition import (partition_edges, powerlaw_graph,
                                        sort_partition_edges)
from pna_tpu.train.largegraph import (LargeGraphConfig, build_problem,
                                      neighbor_stats_labels, train_largegraph)


def _cfg(**kw):
    base = dict(num_nodes=2000, num_edges=10000, d_graph=8, hidden_dim=16,
                out_dim=16, towers=2, n_layers=2, steps=60, eval_every=10,
                lr=3e-3, seed=0)
    base.update(kw)
    return LargeGraphConfig(**base)


def test_trainer_converges_50_steps():
    """>=50 full-batch steps on a 2k/10k power-law graph: train loss must
    drop substantially and val loss must improve (the objective is
    aggregation ground truth, so convergence certifies the distributed
    message passing end to end)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    _, _, hist = train_largegraph(_cfg())
    assert len(hist) == 60
    first, last = hist[0]['train_loss'], hist[-1]['train_loss']
    assert last < 0.6 * first, (first, last)
    vals = [h['val_loss'] for h in hist if 'val_loss' in h]
    assert vals[-1] < vals[0]


def test_trainer_resume_exact(tmp_path):
    """Kill-and-resume under the mesh: 3 steps + checkpoint + 3 resumed
    steps == 6 continuous steps (params bitwise-identical: the data is a
    fixed full batch, so the resumed trajectory must coincide)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    kw = dict(steps=6, eval_every=100, ckpt_every=3)
    p_cont, _, _ = train_largegraph(_cfg(**kw))

    d = str(tmp_path / 'ck')
    p1, _, h1 = train_largegraph(_cfg(steps=3, eval_every=100, ckpt_every=3,
                                      ckpt_dir=d))
    assert os.path.exists(os.path.join(d, 'latest.ckpt'))
    p2, _, h2 = train_largegraph(_cfg(steps=6, eval_every=100, ckpt_every=3,
                                      ckpt_dir=d, resume=True))
    assert h2[0]['step'] == 4 and len(h2) == 3
    for path, a in jax.tree_util.tree_leaves_with_path(p2):
        b = p_cont
        for k in path:
            b = b[k.key]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_trainer_jsonl_curve(tmp_path):
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    log = str(tmp_path / 'curve.jsonl')
    _, _, hist = train_largegraph(_cfg(num_nodes=400, num_edges=2000,
                                       d_graph=4, steps=5, eval_every=5,
                                       log_path=log))
    recs = [json.loads(l) for l in open(log)]
    assert [r['step'] for r in recs] == [1, 2, 3, 4, 5]
    assert 'val_loss' in recs[-1]


def test_cli_smoke(capsys):
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from pna_tpu.cli.train_largegraph import main
    main(['--nodes', '400', '--edges', '2000', '--d_graph', '4',
          '--hidden_dim', '8', '--towers', '2', '--n_layers', '2',
          '--steps', '4', '--eval_every', '2', '--kernel', 'bucketed'])
    out = capsys.readouterr().out.strip().split('\n')[-1]
    rec = json.loads(out)
    assert rec['steps_run'] == 4
    assert np.isfinite(rec['final']['train_loss'])


def test_edge_origin_roundtrip():
    """scatter_edge_features places each original edge's features at its
    local slot in every layout (plain / sorted / bucketized)."""
    from pna_tpu.parallel.partition import bucketize_partition
    send, recv = powerlaw_graph(60, 300, seed=5)
    pairs = np.unique(send * 60 + recv)
    send, recv = pairs // 60, pairs % 60
    E = len(send)
    ef = np.arange(E, dtype=np.float32)[:, None]
    for make in (lambda p: p, sort_partition_edges,
                 lambda p: __import__('pna_tpu.parallel.partition',
                                      fromlist=['bucketize_partition']
                                      ).bucketize_partition(p)):
        part = make(partition_edges(send, recv, 60, 4))
        ep = part.scatter_edge_features(ef)
        # every real edge id appears exactly once, padding slots are zero
        vals = ep[..., 0][part.edge_mask]
        assert sorted(vals.tolist()) == list(range(E))
        assert (ep[..., 0][~part.edge_mask] == 0).all()
        # the receiver at each slot still matches the original edge's
        # receiver (identity preserved through relabeling): check via
        # node_order positions
        pos = part._positions()
        for p in range(part.num_parts):
            for j in np.nonzero(part.edge_mask[p])[0][:20]:
                orig = int(part.edge_origin[p, j])
                r_local = int(part.receivers_local[p, j])
                assert pos[recv[orig]] == p * part.nodes_per_part + r_local


def test_sort_partition_edges_csr():
    """edge_ptr is a valid CSR over the receiver-sorted real edges."""
    send, recv = powerlaw_graph(60, 300, seed=7)
    part = sort_partition_edges(partition_edges(send, recv, 60, 4))
    for p in range(part.num_parts):
        k = int(part.edge_mask[p].sum())
        r = part.receivers_local[p][:k]
        assert (np.diff(r) >= 0).all()
        assert (~part.edge_mask[p][k:]).all()
        ptr = part.edge_ptr[p]
        assert ptr[0] == 0 and ptr[-1] == k
        for n in range(part.nodes_per_part):
            seg = r[ptr[n]:ptr[n + 1]]
            assert (seg == n).all()


def test_neighbor_stats_labels_oracle():
    """Label oracle against a scalar reference implementation."""
    rng = np.random.RandomState(0)
    N, E = 20, 60
    send = rng.randint(0, N, E)
    recv = rng.randint(0, N, E)
    x = rng.randn(N, 4).astype(np.float32)
    y = neighbor_stats_labels(send, recv, x, N)
    for i in range(N):
        js = send[recv == i]
        if len(js):
            ref = (x[js, 0].mean() + 0.5 * x[js, 1].max()
                   + 0.25 * np.log1p(len(js)))
        else:
            ref = 0.0
        np.testing.assert_allclose(y[i], ref, rtol=1e-5, atol=1e-6)


def test_trainer_data_and_graph_parallel():
    """2x4 (data x graph) mesh: the node-level trainer runs with a real data
    axis (broadcast full-batch features) and converges."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    _, _, hist = train_largegraph(_cfg(num_nodes=800, num_edges=4000,
                                       d_data=2, d_graph=4, steps=12,
                                       eval_every=6))
    assert hist[-1]['train_loss'] < hist[0]['train_loss']


def test_trainer_pallas_with_edge_features():
    """kernel='pallas' (sorted layout, per-part edge_ptr) combined with
    per-edge features — the full skew-capable flagship configuration —
    trains under shard_map."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    _, _, hist = train_largegraph(_cfg(num_nodes=400, num_edges=2000,
                                       d_graph=4, steps=4, eval_every=4,
                                       kernel='pallas', edge_feat_dim=3,
                                       pallas_interpret=True))
    assert np.isfinite(hist[-1]['train_loss'])
