"""Aggregation-layout selection — codifies the measured backend decision
boundary (VERDICT r3 item 7).

The fatal large-graph choice happens at data-preparation time, before
``PNALayerFused(kernel='auto')`` ever runs: build a degree-bucket table
(pads edges to per-class capacities — explodes on hub in-degrees), an ELL
neighbour table ([N, D_max] — TB-scale on hubs), or the receiver-sorted CSR
layout the Pallas sketch kernel streams (E-bounded, degree-agnostic).
``choose_layout`` predicts each layout's working-set bytes from the degree
histogram ALONE (no table is built) and returns the backend + batcher
arguments, encoding the measured ranking and the measured failures:

* molecular scale, everything fits: bucketed 9.6 ms > ell 20 ms >
  generic 35.9 ms per ZINC-1024 step (BENCH_kernels.json);
* 500k/5M uniform on v5e-16GB: bucketed trains at 19.5M edges/s, the ELL
  gather OOMs (RESULTS_largegraph.json);
* 250k/2.5M hub-skewed: bucketed and ELL are infeasible (a dense hub bucket
  view is [8, max_deg, F]); the Pallas sorted-edge kernel is the only
  backend that runs at all, 7.5M edges/s (RESULTS_largegraph_250k.json).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

# bytes the train step keeps live per padded-edge-row byte of the msg tensor
# (fwd residuals + bwd cotangents + working copies).  Calibrated against the
# measured feasibility boundary on v5e (16 GB): 500k/5M bucketed (E_pad
# 5.3M x F64 bf16 -> fits, trains) vs 1M/10M (every backend OOMs).
EDGE_WORK_FACTOR = 8.0
# extra factor for the ELL path: the [N, D_max, F] gather materializes in
# fwd AND bwd on top of the edge tensors (measured: OOMs at 500k/5M where
# bucketed fits)
ELL_WORK_FACTOR = 12.0


@dataclass
class LayoutChoice:
    kernel: str                      # 'bucketed' | 'pallas' | 'ell' | 'generic'
    batch_kwargs: Dict               # forwarded to batch_graphs
    est_bytes: Dict[str, float]      # per-layout working-set estimate
    reason: str


def _simulate_bucket_caps(deg: np.ndarray, max_buckets: int = 4
                          ) -> Tuple[int, int]:
    """(padded_edge_count, max_class_degree) the bucket layout would build,
    computed from the degree histogram without building the table (same
    class selection as pna_tpu.graph._choose_classes)."""
    from pna_tpu.graph import _choose_classes, _round_up
    counts: Dict[int, int] = {}
    u, c = np.unique(deg, return_counts=True)
    for d, k in zip(u.tolist(), c.tolist()):
        counts[int(d)] = counts.get(int(d), 0) + int(k)
    cls_of = _choose_classes(counts, max_buckets)
    cls_of[0] = 0        # degree-0 nodes form their own zero-width class
    caps: Dict[int, int] = {}
    for d, k in counts.items():
        D = cls_of[d]
        caps[D] = caps.get(D, 0) + k
    e_pad = sum(_round_up(cap, 8) * d for d, cap in caps.items())
    return int(e_pad), int(max(caps) if caps else 0)


def predict_layout_bytes(deg: np.ndarray, num_edges: int, feat_dim: int,
                         dtype_bytes: int = 2,
                         max_buckets: int = 4) -> Dict[str, float]:
    """Predicted working-set bytes per layout for one layer's train step."""
    n = len(deg)
    d_max = int(deg.max()) if n else 0
    e_bucket, _ = _simulate_bucket_caps(deg, max_buckets)
    row = feat_dim * dtype_bytes
    return {
        'bucketed': e_bucket * row * EDGE_WORK_FACTOR,
        'ell': (num_edges * row * EDGE_WORK_FACTOR
                + n * max(d_max, 1) * row * ELL_WORK_FACTOR),
        'pallas': num_edges * row * EDGE_WORK_FACTOR,
        'generic': num_edges * row * EDGE_WORK_FACTOR,
        'bucketed_edge_pad_ratio': e_bucket / max(num_edges, 1),
    }


# measured bucketed <-> pallas crossover on v5e (benchmarks/largegraph.py,
# 2026-08-21, streaming-backward kernel): at 500k edges the two tie
# (51.9 vs 52.9 ms); at 2.5M edges pallas wins (135.5 vs 154.9 ms); at
# molecular scale (42k edges) bucketed wins (9.1 vs 14.3 ms per step)
PALLAS_EDGE_THRESHOLD = 1_000_000


def choose_layout(senders: np.ndarray, receivers: np.ndarray,
                  num_nodes: int, feat_dim: int,
                  hbm_budget_bytes: float = 12 * 2 ** 30,
                  dtype_bytes: int = 2,
                  max_buckets: int = 4,
                  on_tpu: bool = True) -> LayoutChoice:
    """Pick the aggregation backend + batcher layout for one big graph.

    ``hbm_budget_bytes`` defaults to ~12 GiB of the v5e's 16 GiB (params,
    XLA scratch and fragmentation take the rest).  Preference order when
    feasible: below PALLAS_EDGE_THRESHOLD edges, bucketed (measured fastest
    at molecular scale) > pallas sorted-edge > generic; above it, pallas
    first (measured fastest at 2.5M-5M edges with the streaming backward
    kernel, and the only backend that survives hub-degree skew).  The ELL
    layout is never chosen for large graphs (strictly dominated: slower than
    bucketed, OOMs earlier) but its estimate is reported.
    """
    deg = np.bincount(np.asarray(receivers), minlength=num_nodes)
    est = predict_layout_bytes(deg, len(senders), feat_dim, dtype_bytes,
                               max_buckets)
    pad_ratio = est['bucketed_edge_pad_ratio']
    if (on_tpu and len(senders) >= PALLAS_EDGE_THRESHOLD
            and est['pallas'] <= hbm_budget_bytes):
        return LayoutChoice(
            'pallas', dict(sort_edges=True), est,
            f"large-graph regime ({len(senders)} edges >= "
            f"{PALLAS_EDGE_THRESHOLD}): sorted-edge Pallas kernel is the "
            f"measured-fastest backend ({est['pallas']/2**30:.2f} GiB, "
            "E-bounded, skew-immune)")
    if est['bucketed'] <= hbm_budget_bytes and pad_ratio <= 2.0:
        return LayoutChoice(
            'bucketed', dict(bucket_by_degree=True,
                             bucket_max_buckets=max_buckets), est,
            f"bucket table fits ({est['bucketed']/2**30:.2f} GiB, edge pad "
            f"{pad_ratio:.2f}x) — measured-fastest backend")
    if on_tpu and est['pallas'] <= hbm_budget_bytes:
        return LayoutChoice(
            'pallas', dict(sort_edges=True), est,
            f"bucket table infeasible ({est['bucketed']/2**30:.2f} GiB or "
            f"edge pad {pad_ratio:.2f}x); sorted-edge Pallas kernel is "
            f"E-bounded ({est['pallas']/2**30:.2f} GiB)")
    if est['generic'] <= hbm_budget_bytes:
        return LayoutChoice(
            'generic', dict(sort_edges=True), est,
            "bucket table infeasible and Pallas unavailable; generic "
            "segment ops on the sorted layout")
    return LayoutChoice(
        'generic', dict(sort_edges=True), est,
        f"no layout fits the {hbm_budget_bytes/2**30:.1f} GiB budget "
        f"(best estimate {min(est['pallas'], est['bucketed'])/2**30:.2f} "
        "GiB): single-chip infeasible — partition over a mesh "
        "(pna_tpu.parallel.partition / cli.train_largegraph)")
