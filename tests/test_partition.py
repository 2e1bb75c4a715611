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

    # distributed
    devices = np.array(jax.devices()[:num_parts])
    mesh = Mesh(devices, ('graph',))
    nl = part.nodes_per_part
    feats_pad = np.zeros((num_parts, nl, F), np.float32)
    flat = feats_pad.reshape(-1, F)
    flat[:num_nodes] = feats
    feats_sharded = jax.device_put(
        jnp.asarray(feats_pad), NamedSharding(mesh, P('graph')))

    agg = make_distributed_aggregate(part, mesh, 'graph', AGGS, SCAL, AVG_D)
    out = np.asarray(agg(feats_sharded)).reshape(num_parts * nl, -1)

    np.testing.assert_allclose(out[:num_nodes], ref[:num_nodes],
                               rtol=2e-4, atol=2e-4)


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


def test_partition_structure():
    send, recv = powerlaw_graph(40, 120, seed=0)
    part = partition_edges(send, recv, 40, 4)
    assert part.edge_mask.sum() == 120
    assert part.node_mask.sum() == 40
    # every real edge's receiver is owned locally
    for p in range(4):
        rl = part.receivers_local[p][part.edge_mask[p]]
        assert rl.max() < part.nodes_per_part
