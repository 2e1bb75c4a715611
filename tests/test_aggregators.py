"""Aggregator/scaler bank parity tests.

Three rings of checks, mirroring the reference's implicit oracle structure
(SURVEY.md §4): dense bank vs the reference torch implementation, segment bank
vs dense bank (same math, edge-list form), and scaler banks vs reference.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pna_tpu.graph import from_dense
from pna_tpu.ops.aggregators import (DENSE_AGGREGATORS, SEGMENT_AGGREGATORS,
                                     SegmentCtx)
from pna_tpu.ops.scalers import DENSE_SCALERS, SCALERS, avg_d_from_dense_adj

from tests._reference import add_reference_to_path, reference_available

B, N, D = 3, 11, 5
AVG_D = {"lin": 3.1, "log": 1.2, "exp": 0.8}


def random_graph(seed=0):
    """Random dense batch with no isolated nodes (generator rejects singletons,
    multitask_benchmark/datasets_generation/multitask_dataset.py:46-49)."""
    rng = np.random.RandomState(seed)
    adj = (rng.rand(B, N, N) < 0.4).astype(np.float32)
    adj = np.maximum(adj, adj.transpose(0, 2, 1))  # symmetric
    np.einsum('bii->bi', adj)[:] = 0               # no self loops
    # ensure no isolated nodes
    for b in range(B):
        for i in range(N):
            if adj[b, i].sum() == 0:
                j = (i + 1) % N
                adj[b, i, j] = adj[b, j, i] = 1.0
    X = rng.randn(B, N, N, D).astype(np.float32)
    return adj, X


@pytest.mark.skipif(not reference_available(), reason="reference/torch unavailable")
@pytest.mark.parametrize("name", sorted(DENSE_AGGREGATORS))
def test_dense_aggregator_matches_reference(name):
    add_reference_to_path()
    import torch
    from models.pytorch.pna import aggregators as ref_agg

    adj, X = random_graph()
    ours = np.asarray(DENSE_AGGREGATORS[name](jnp.asarray(X), jnp.asarray(adj)))
    theirs = ref_agg.AGGREGATORS[name](torch.tensor(X), torch.tensor(adj)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference/torch unavailable")
@pytest.mark.parametrize("name", sorted(DENSE_SCALERS))
def test_dense_scaler_matches_reference(name):
    add_reference_to_path()
    import torch
    from models.pytorch.pna import scalers as ref_sc

    adj, X = random_graph(1)
    Xn = X[:, :, 0, :]  # [B, N, D]
    ours = np.asarray(DENSE_SCALERS[name](jnp.asarray(Xn), jnp.asarray(adj), AVG_D))
    theirs = ref_sc.SCALERS[name](torch.tensor(Xn), torch.tensor(adj), AVG_D).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", sorted(SEGMENT_AGGREGATORS))
def test_segment_matches_dense(name):
    """Segment bank on the edge-list conversion == dense bank on B x N x N.

    Edge messages must equal the dense X values at the corresponding (i, j):
    for edge j->i the message is X[b, i, j].
    """
    adj, X = random_graph(2)
    g = from_dense(adj, X[:, :, 0, :])  # features irrelevant here

    # build per-edge messages from dense X: edge k maps (b, i, j)
    msgs = []
    self_msgs = []
    recv_list, send_list = [], []
    offset = 0
    for b in range(adj.shape[0]):
        recv, send = np.nonzero(adj[b])
        msgs.append(X[b, recv, send])
        self_msgs.append(X[b, np.arange(N), np.arange(N)])
        offset += N
    msg = np.concatenate(msgs, 0)
    self_msg_real = np.concatenate(self_msgs, 0)

    E_pad = g.n_edge_pad
    msg_pad = np.zeros((E_pad, D), np.float32)
    msg_pad[:msg.shape[0]] = msg
    self_msg = np.zeros((g.n_node_pad, D), np.float32)
    self_msg[:B * N] = self_msg_real

    ctx = SegmentCtx.create(jnp.asarray(msg_pad), g.receivers, g.n_node_pad,
                            mask=g.edge_mask, senders=g.senders,
                            self_msg=jnp.asarray(self_msg))
    ours = np.asarray(SEGMENT_AGGREGATORS[name](ctx))[:B * N].reshape(B, N, D)
    if name in ("max", "min"):
        # Reference dense max/min reduce over dim -3, i.e. the transposed
        # message direction (models/pytorch/pna/aggregators.py:37,49 vs the
        # dim=2 sums elsewhere).  The segment bank uses the consistent
        # direction, which equals the dense op applied to X^T.
        X_cmp = np.swapaxes(X, 1, 2)
    else:
        X_cmp = X
    dense = np.asarray(DENSE_AGGREGATORS[name](jnp.asarray(X_cmp), jnp.asarray(adj)))
    np.testing.assert_allclose(ours, dense, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", sorted(SCALERS))
def test_vector_scaler_matches_dense(name):
    adj, X = random_graph(3)
    Xn = X[:, :, 0, :]
    deg = adj.sum(-1)  # [B, N]
    ours = np.asarray(SCALERS[name](jnp.asarray(Xn), jnp.asarray(deg), AVG_D))
    dense = np.asarray(DENSE_SCALERS[name](jnp.asarray(Xn), jnp.asarray(adj), AVG_D))
    np.testing.assert_allclose(ours, dense, rtol=2e-4, atol=2e-4)


def test_avg_d_formula():
    adj, _ = random_graph(4)
    out = avg_d_from_dense_adj([adj])
    D = adj.sum(-1)
    np.testing.assert_allclose(out["lin"], D.mean(), rtol=1e-6)
    np.testing.assert_allclose(out["log"], np.log(D + 1).mean(), rtol=1e-6)
    np.testing.assert_allclose(out["exp"], (np.exp(1.0 / D) - 1).mean(), rtol=1e-6)


def test_degree_helpers():
    adj, X = random_graph(5)
    g = from_dense(adj, X[:, :, 0, :])
    deg = np.asarray(g.in_degrees())[:B * N].reshape(B, N)
    np.testing.assert_allclose(deg, adj.sum(-1))


def test_segment_softmax_matches_dense_and_survives_overflow():
    """The segment softmax/softmin aggregators use max-subtraction where the
    dense reference uses raw exp (models/pytorch/pna/aggregators.py:101-114).
    Softmax weights are shift-invariant, so the two agree to float precision
    in the reference's operating range — pinned here against the dense bank —
    and the stabilized form additionally survives logits beyond exp's f32
    overflow (~88), where the raw-exp form returns NaN (the one documented
    behavioural difference, VERDICT r4 weak #6)."""
    import jax.numpy as jnp
    from pna_tpu.ops.aggregators import (SEGMENT_AGGREGATORS, SegmentCtx,
                                         aggregate_softmax, aggregate_softmin)

    rng = np.random.RandomState(11)
    n, f = 7, 5
    adj_np = ((rng.rand(n, n) < 0.6) & ~np.eye(n, dtype=bool))
    # every node needs >= 1 neighbour (dense form divides by the exp sum)
    for i in range(n):
        if not adj_np[i].any():
            adj_np[i, (i + 1) % n] = True
    X = rng.randn(n, f).astype(np.float32) * 3.0

    send, recv = [], []
    for i in range(n):
        for j in range(n):
            if adj_np[i, j]:
                send.append(j)   # dense sums over axis 2 = neighbours j of i
                recv.append(i)
    send = np.asarray(send, np.int32)
    recv = np.asarray(recv, np.int32)

    dense = {
        'softmax': np.asarray(aggregate_softmax(
            jnp.asarray(np.broadcast_to(X, (1, n, n, f))),
            jnp.asarray(adj_np[None].astype(np.float32))))[0],
        'softmin': np.asarray(aggregate_softmin(
            jnp.asarray(np.broadcast_to(X, (1, n, n, f))),
            jnp.asarray(adj_np[None].astype(np.float32))))[0],
    }

    order = np.argsort(recv, kind='stable')
    ctx = SegmentCtx(msg=jnp.asarray(X[send[order]]),
                     senders=jnp.asarray(send[order]),
                     receivers=jnp.asarray(recv[order]),
                     num_nodes=n, mask=None,
                     count=jnp.asarray(np.bincount(recv, minlength=n)
                                       .astype(np.float32)))
    for name in ('softmax', 'softmin'):
        got = np.asarray(SEGMENT_AGGREGATORS[name](ctx))
        np.testing.assert_allclose(got, dense[name], rtol=1e-5, atol=1e-5,
                                   err_msg=name)

    # overflow regime: logits > 88 kill raw exp; the stabilized segment
    # form still returns the (sharp-max) finite answer
    X_big = X + 200.0
    ctx_big = ctx.replace(msg=jnp.asarray(X_big[send[order]]))
    got_big = np.asarray(SEGMENT_AGGREGATORS['softmax'](ctx_big))
    assert np.all(np.isfinite(got_big))
    dense_big = np.asarray(aggregate_softmax(
        jnp.asarray(np.broadcast_to(X_big, (1, n, n, f))),
        jnp.asarray(adj_np[None].astype(np.float32))))[0]
    assert np.isnan(dense_big).any()     # the raw-exp reference form blows up
