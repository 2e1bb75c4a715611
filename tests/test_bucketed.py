"""Degree-bucketed static layout: batcher invariants, aggregation parity with
the segment oracle, and fused-layer equivalence under the bucketed graph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.nn.sparse import PNALayerSparse, aggregate_bank
from pna_tpu.ops import bucketed

AVG_D = {"lin": 3.0, "log": 1.1}


def random_graph(seed=0, n=14):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < 0.4).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    for i in range(n):
        if adj[i].sum() == 0:
            j = (i + 1) % n
            adj[i, j] = adj[j, i] = 1
    recv, send = np.nonzero(adj)
    return send.astype(np.int32), recv.astype(np.int32), n


def graphs_batch(seed, n_graphs=3, feat=6):
    rng = np.random.RandomState(seed)
    gs = []
    for k in range(n_graphs):
        send, recv, n = random_graph(seed * 10 + k, n=int(rng.randint(6, 16)))
        gs.append(dict(node_feats=rng.randn(n, feat).astype(np.float32),
                       senders=send, receivers=recv))
    return gs


def test_bucketed_layout_invariants():
    gs = graphs_batch(1)
    g = batch_graphs(gs, with_snorm=True, bucket_by_degree=True)
    assert g.bucket_spec is not None
    spec = g.bucket_spec
    recv = np.asarray(g.receivers)
    em = np.asarray(g.edge_mask)
    nm = np.asarray(g.node_mask)
    deg = np.zeros(g.n_node_pad, int)
    np.add.at(deg, recv[em], 1)
    ind = np.asarray(g.in_deg)
    noff = eoff = 0
    for d, c in spec:
        # every real node in class-d bucket has deg <= d in-edges, its real
        # edges contiguous at the block start, dummy slots masked after
        for k in range(c):
            node = noff + k
            blk = slice(eoff + k * d, eoff + (k + 1) * d)
            if nm[node]:
                dd = deg[node]
                assert dd <= d and ind[node] == dd
                assert (recv[blk][:dd] == node).all()
                assert em[blk][:dd].all()
                assert not em[blk][dd:].any()
            else:
                assert not em[blk].any()
        noff += c
        eoff += c * d
    assert noff == g.n_node_pad and eoff == g.n_edge_pad
    # total real nodes/edges preserved
    assert nm.sum() == sum(len(x["node_feats"]) for x in gs)
    assert em.sum() == sum(len(x["senders"]) for x in gs)


@pytest.mark.parametrize("agg", ['mean', 'sum', 'max', 'min', 'var', 'std',
                                 'moment3', 'moment5', 'softmax', 'softmin'])
def test_bucketed_bank_matches_segment_oracle(agg):
    g = batch_graphs(graphs_batch(2), bucket_by_degree=True)
    rng = np.random.RandomState(0)
    msg = jnp.asarray(rng.randn(g.n_edge_pad, 5).astype(np.float32))
    Z = bucketed.raw_bank(msg, g.bucket_spec, (agg,),
                          in_deg=g.in_deg)[:, 0, :]
    ref = aggregate_bank(g, msg, [agg], ['identity'], AVG_D)
    m = np.asarray(g.node_mask)[:, None]
    np.testing.assert_allclose(np.asarray(Z) * m, np.asarray(ref) * m,
                               rtol=2e-5, atol=2e-5)


def test_bucketed_expand_matches_gather():
    g = batch_graphs(graphs_batch(3), bucket_by_degree=True)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(g.n_node_pad, 4).astype(np.float32))
    ex = bucketed.expand_to_edges(h, g.bucket_spec)
    ref = h[g.receivers]
    em = np.asarray(g.edge_mask)[:, None]
    np.testing.assert_allclose(np.asarray(ex) * em, np.asarray(ref) * em)


def test_fused_layer_bucketed_matches_ell():
    """Same weights, same graph in bucketed vs plain layout -> same loss and
    parameter gradients (node order differs, sums over real nodes agree)."""
    gs = graphs_batch(4, feat=12)
    gb = batch_graphs(gs, with_snorm=True, bucket_by_degree=True)
    ge = batch_graphs(gs, with_snorm=True)
    common = dict(out_dim=12, aggregators=('mean', 'max', 'min', 'std'),
                  scalers=('identity', 'amplification', 'attenuation'),
                  avg_d=AVG_D, towers=3, pretrans_layers=2,
                  posttrans_layers=2, divide_input=True, residual=True,
                  graph_norm=True, batch_norm=True)
    fused = PNALayerFused(**common)
    vs = fused.init({'params': jax.random.PRNGKey(0)}, ge, ge.node_feats,
                    None, train=False)

    def loss(p, g):
        o = fused.apply({'params': p,
                         'batch_stats': vs.get('batch_stats', {})},
                        g, g.node_feats, None, train=False)
        return jnp.sum((o * g.node_mask[:, None]) ** 2)

    lb, gradb = jax.value_and_grad(loss)(vs['params'], gb)
    le, grade = jax.value_and_grad(loss)(vs['params'], ge)
    assert np.allclose(float(lb), float(le), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gradb),
            jax.tree_util.tree_leaves_with_path(grade)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(pa))


def test_ell_softmax_grad_finite():
    """Regression: empty neighbourhoods used to give NaN softmax gradients
    (tiny denominator squared underflows in the division VJP)."""
    from pna_tpu.ops.ell import EllCtx, ell_softmax
    ids = jnp.asarray([[0, 1], [2, 0], [0, 0]], jnp.int32)
    mask = jnp.asarray([[True, True], [True, False], [False, False]])
    msg = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))

    def loss(m):
        return jnp.sum(ell_softmax(EllCtx.create(m, ids, mask)) ** 2)

    assert bool(jnp.isfinite(jax.grad(loss)(msg)).all())
