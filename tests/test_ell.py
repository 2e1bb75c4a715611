"""ELL fast-path aggregation == segment-op oracle for every aggregator."""

import numpy as np
import pytest

import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from pna_tpu.ops.aggregators import SEGMENT_AGGREGATORS, SegmentCtx
from pna_tpu.ops.ell import ELL_AGGREGATORS, EllCtx


def random_graph(seed=0, n=12):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < 0.4).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    recv, send = np.nonzero(adj)
    return send.astype(np.int32), recv.astype(np.int32), n


@pytest.mark.parametrize("name", sorted(ELL_AGGREGATORS))
def test_ell_matches_segment(name):
    send, recv, n = random_graph(3)
    g = batch_graphs([dict(node_feats=np.zeros((n, 2), np.float32),
                           senders=send, receivers=recv)])
    assert g.nbr_edge_ids is not None
    E = g.n_edge_pad
    rng = np.random.RandomState(7)
    msg = rng.randn(E, 5).astype(np.float32)
    msg[~np.asarray(g.edge_mask)] = 0.0
    self_msg = rng.randn(g.n_node_pad, 5).astype(np.float32)
    out_deg = g.out_degrees()

    ell_ctx = EllCtx.create(jnp.asarray(msg), g.nbr_edge_ids, g.nbr_mask,
                            self_msg=jnp.asarray(self_msg), senders=g.senders,
                            out_deg=out_deg)
    seg_ctx = SegmentCtx.create(jnp.asarray(msg), g.receivers, g.n_node_pad,
                                mask=g.edge_mask, senders=g.senders,
                                self_msg=jnp.asarray(self_msg))
    a = np.asarray(ELL_AGGREGATORS[name](ell_ctx))
    b = np.asarray(SEGMENT_AGGREGATORS[name](seg_ctx))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_ell_layout():
    send, recv, n = random_graph(1)
    g = batch_graphs([dict(node_feats=np.zeros((n, 2), np.float32),
                           senders=send, receivers=recv)])
    nbr = np.asarray(g.nbr_edge_ids)
    mask = np.asarray(g.nbr_mask)
    recv_np = np.asarray(g.receivers)
    for node in range(n):
        edges = set(e for e in range(len(recv)) if recv_np[e] == node)
        got = set(nbr[node][mask[node]].tolist())
        assert got == edges
