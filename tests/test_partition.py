"""Distributed edge-partitioned aggregation == single-device segment
aggregation (SURVEY §4: distributed ring; runs on the 8-device virtual CPU
mesh from conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pna_tpu.graph import build_graph
from pna_tpu.nn.sparse import aggregate_bank
from pna_tpu.parallel.partition import (EdgePartition,
                                        make_distributed_aggregate,
                                        partition_edges, powerlaw_graph)

AGGS = ('mean', 'max', 'min', 'std')
SCAL = ('identity', 'amplification', 'attenuation')
AVG_D = {'lin': 3.0, 'log': 1.2}


@pytest.mark.parametrize("num_parts", [2, 4, 8])
def test_partition_matches_single_device(num_parts):
    num_nodes, num_edges, F = 64, 400, 5
    send, recv = powerlaw_graph(num_nodes, num_edges, seed=1)
    part = partition_edges(send, recv, num_nodes, num_parts)

    rng = np.random.RandomState(0)
    feats = rng.randn(num_nodes, F).astype(np.float32)

    # single-device oracle
    g = build_graph(feats, send.astype(np.int32), recv.astype(np.int32),
                    n_node_pad=num_nodes + 1,
                    n_edge_pad=-(-num_edges // 128) * 128)
    msg = jnp.asarray(np.asarray(g.node_feats))[g.senders]
    ref = np.asarray(aggregate_bank(g, msg, list(AGGS), list(SCAL), AVG_D))

    # distributed (features go through the locality reordering)
    devices = np.array(jax.devices()[:num_parts])
    mesh = Mesh(devices, ('graph',))
    feats_sharded = jax.device_put(
        jnp.asarray(part.scatter_features(feats)),
        NamedSharding(mesh, P('graph')))

    agg = make_distributed_aggregate(part, mesh, 'graph', AGGS, SCAL, AVG_D)
    out = part.gather_outputs(np.asarray(agg(feats_sharded)))

    np.testing.assert_allclose(out, ref[:num_nodes], rtol=2e-4, atol=2e-4)


def test_locality_reorder_reduces_halo():
    """The receiver-grouping locality ordering must cut the total halo
    volume vs the raw node order on a power-law graph (VERDICT r2 item 5,
    >=2x target; measured ~3-5x)."""
    from pna_tpu import native
    num_nodes, num_edges, parts = 20000, 200000, 8
    send, recv = powerlaw_graph(num_nodes, num_edges, seed=4)
    nl = -(-num_nodes // parts)

    def halo_sum(s, r):
        stats = native.partition_stats(
            np.ascontiguousarray(s, np.int64),
            np.ascontiguousarray(r, np.int64), nl, parts, num_nodes)
        assert stats is not None or native.get_lib() is None
        if stats is None:
            pytest.skip("native lib unavailable")
        _, halo = stats
        halo = halo.copy()
        np.fill_diagonal(halo, 0)
        return int(halo.sum())

    raw = halo_sum(send, recv)
    order = native.locality_order(send, recv, num_nodes)
    assert sorted(order) == list(range(num_nodes))  # a permutation
    inv = np.empty(num_nodes, np.int64)
    inv[order] = np.arange(num_nodes)
    reord = halo_sum(inv[send], inv[recv])
    assert reord < 0.5 * raw, (raw, reord)


def test_native_and_numpy_builders_agree():
    """The C++ build_partition_indices and its vectorized numpy twin must
    produce identical layouts (same ghost slot assignment, same edge order)."""
    from pna_tpu import native
    from pna_tpu.parallel.partition import _partition_indices_numpy
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    send, recv = powerlaw_graph(200, 2000, seed=3)
    num_parts, num_nodes = 4, 200
    nl = -(-num_nodes // num_parts)
    ec, hc = native.partition_stats(send, recv, nl, num_parts, num_nodes)
    assert int(ec.sum()) == 2000
    el = -(-int(ec.max()) // 8) * 8
    h = -(-max(int(hc.max()), 1) // 8) * 8
    nat = native.build_partition_indices(send, recv, nl, num_parts,
                                         num_nodes, el, h)
    ref = _partition_indices_numpy(send.astype(np.int64),
                                   recv.astype(np.int64),
                                   nl, num_parts, num_nodes, el, h)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("num_parts", [2, 4])
def test_bucketize_partition_structure(num_parts):
    """bucketize_partition preserves the edge set (relabeled), keeps a
    uniform static spec across parts, and scatter/gather stay inverses."""
    from pna_tpu.parallel.partition import bucketize_partition
    num_nodes, num_edges, F = 64, 400, 5
    send, recv = powerlaw_graph(num_nodes, num_edges, seed=5)
    pairs = np.unique(send * num_nodes + recv)
    send, recv = pairs // num_nodes, pairs % num_nodes
    part = partition_edges(send, recv, num_nodes, num_parts)
    bp = bucketize_partition(part)

    assert bp.bucket_spec is not None
    assert bp.nodes_per_part == sum(c for _, c in bp.bucket_spec)
    assert bp.edges_per_part >= sum(d * c for d, c in bp.bucket_spec)
    assert int(bp.edge_mask.sum()) == len(send)
    assert int(bp.node_mask.sum()) == num_nodes

    # scatter -> gather round-trips original features exactly
    feats = np.random.RandomState(0).randn(num_nodes, F).astype(np.float32)
    lay = bp.scatter_features(feats)
    np.testing.assert_array_equal(bp.gather_outputs(lay), feats)

    # every real edge (orig sender -> orig receiver) survives with the same
    # multiplicity; in_deg matches the true degree; real edges occupy the
    # first deg slots of their receiver's bucket row
    pos = bp._positions()                       # orig id -> position
    nl = bp.nodes_per_part
    got = []
    for p in range(bp.num_parts):
        em = bp.edge_mask[p]
        r_new = bp.receivers_local[p][em]
        s_new = bp.senders_local[p][em]
        assert (s_new < nl).sum() + (s_new >= nl).sum() == em.sum()
        # local senders resolve through position map; ghosts through send_idx
        for s, r in zip(s_new, r_new):
            r_orig = int(np.nonzero(pos == p * nl + r)[0][0])
            if s < nl:
                s_orig = int(np.nonzero(pos == p * nl + s)[0][0])
            else:
                q, k = divmod(int(s) - nl, bp.halo_size)
                assert bp.send_mask[q, p, k]
                s_loc = int(bp.send_idx[q, p, k])
                s_orig = int(np.nonzero(pos == q * nl + s_loc)[0][0])
            got.append((s_orig, r_orig))
    assert sorted(got) == sorted(zip(send.tolist(), recv.tolist()))

    deg = np.zeros(num_nodes, np.int64)
    np.add.at(deg, recv, 1)
    flat_in_deg = bp.in_deg.reshape(-1)[pos]
    np.testing.assert_array_equal(flat_in_deg.astype(np.int64), deg)


def test_partition_structure():
    send, recv = powerlaw_graph(40, 120, seed=0)
    part = partition_edges(send, recv, 40, 4)
    assert part.edge_mask.sum() == 120
    assert part.node_mask.sum() == 40
    # every real edge's receiver is owned locally
    for p in range(4):
        rl = part.receivers_local[p][part.edge_mask[p]]
        assert rl.max() < part.nodes_per_part
