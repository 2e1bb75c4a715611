"""choose_layout (pna_tpu/ops/layout.py): the OOM-predicting size model and
the backend decision boundary the large-graph measurements define
(VERDICT r3 item 7)."""

import numpy as np

from pna_tpu.ops.layout import (LayoutChoice, choose_layout,
                                predict_layout_bytes)
from pna_tpu.parallel.partition import powerlaw_graph


def _hub_graph(n, e, frac=0.3, seed=0):
    rng = np.random.RandomState(seed)
    send = rng.randint(0, n, e).astype(np.int64)
    recv = rng.randint(0, n, e).astype(np.int64)
    recv[:int(e * frac)] = 0          # hub holds frac of all in-edges
    return send, recv


def test_bucket_size_model_matches_built_table():
    """The predicted padded edge count equals what batch_graphs actually
    builds (same class-selection code path)."""
    from pna_tpu.graph import batch_graphs
    from pna_tpu.ops.layout import _simulate_bucket_caps
    rng = np.random.RandomState(1)
    n, e = 500, 2500
    send = rng.randint(0, n, e).astype(np.int64)
    recv = rng.randint(0, n, e).astype(np.int64)
    deg = np.bincount(recv, minlength=n)
    e_pred, _ = _simulate_bucket_caps(deg, max_buckets=4)
    g = batch_graphs([dict(node_feats=np.zeros((n, 4), np.float32),
                           senders=send, receivers=recv)],
                     bucket_by_degree=True, bucket_max_buckets=4)
    # the batcher adds one padding node to a degree-0 class; allow its slack
    built = sum(c * d for d, c in g.bucket_spec)
    assert e_pred <= built <= e_pred + 8 * max(d for d, _ in g.bucket_spec)


def test_uniform_graph_prefers_bucketed():
    n, e = 20_000, 200_000
    rng = np.random.RandomState(0)
    send = rng.randint(0, n, e).astype(np.int64)
    recv = rng.randint(0, n, e).astype(np.int64)
    c = choose_layout(send, recv, n, feat_dim=64)
    assert c.kernel == 'bucketed'
    assert c.batch_kwargs['bucket_by_degree']


def test_hub_graph_prefers_pallas():
    """A hub in-degree makes the bucket table explode (cap*max_deg padded
    edges) — the decision must fall to the sorted-edge Pallas layout, the
    only backend that survived this regime on hardware
    (RESULTS_largegraph_250k.json)."""
    n, e = 50_000, 500_000
    send, recv = _hub_graph(n, e)
    est = predict_layout_bytes(np.bincount(recv, minlength=n), e, 64)
    assert est['bucketed'] > est['pallas'] * 3     # the model sees the blowup
    c = choose_layout(send, recv, n, feat_dim=64)
    assert c.kernel == 'pallas'
    assert c.batch_kwargs['sort_edges']


def test_hub_graph_without_tpu_falls_to_generic():
    n, e = 50_000, 500_000
    send, recv = _hub_graph(n, e)
    c = choose_layout(send, recv, n, feat_dim=64, on_tpu=False)
    assert c.kernel == 'generic'


def test_oversize_graph_recommends_partitioning():
    """When nothing fits the budget the choice degrades to generic with a
    reason pointing at the distributed path."""
    n, e = 100_000, 1_000_000
    send, recv = powerlaw_graph(n, e, seed=3)
    c = choose_layout(send, recv, n, feat_dim=512,
                      hbm_budget_bytes=2 ** 28)    # 256 MiB budget
    assert c.kernel == 'generic'
    assert 'partition' in c.reason


def test_ell_estimate_dominated_on_hubs():
    n, e = 10_000, 100_000
    send, recv = _hub_graph(n, e)
    est = predict_layout_bytes(np.bincount(recv, minlength=n), e, 64)
    assert est['ell'] > est['pallas'] * 10


def test_large_uniform_graph_prefers_pallas_on_tpu():
    """Above PALLAS_EDGE_THRESHOLD edges the sorted-edge kernel is the
    measured-fastest backend even on uniform in-degrees (250k/2.5M: 135.5 ms
    vs bucketed 154.9 ms with the streaming backward,
    RESULTS_largegraph_250k.json) — choose_layout must rank it first on TPU
    and still fall back to bucketed off-TPU."""
    n, e = 250_000, 2_500_000
    rng = np.random.RandomState(0)
    send = rng.randint(0, n, e).astype(np.int64)
    recv = rng.randint(0, n, e).astype(np.int64)
    c = choose_layout(send, recv, n, feat_dim=64, on_tpu=True)
    assert c.kernel == 'pallas'
    c_cpu = choose_layout(send, recv, n, feat_dim=64, on_tpu=False)
    assert c_cpu.kernel == 'bucketed'
    # molecular scale stays bucketed on TPU
    n2, e2 = 20_000, 50_000
    send2 = rng.randint(0, n2, e2).astype(np.int64)
    recv2 = rng.randint(0, n2, e2).astype(np.int64)
    assert choose_layout(send2, recv2, n2, feat_dim=64,
                         on_tpu=True).kernel == 'bucketed'
