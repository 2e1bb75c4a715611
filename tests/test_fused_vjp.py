"""Custom-VJP fused aggregation: forward and gradients must match the
autodiff of the generic ELL bank."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from pna_tpu.nn.sparse import aggregate_bank
from pna_tpu.ops import fused_vjp

AVG_D = {"lin": 3.0, "log": 1.1}


def make_graph(seed=0, n=13):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < 0.4).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    recv, send = np.nonzero(adj)
    g = batch_graphs([dict(node_feats=np.zeros((n, 2), np.float32),
                           senders=send.astype(np.int32),
                           receivers=recv.astype(np.int32))])
    return g, n


@pytest.mark.parametrize("aggs,scal", [
    (('mean', 'max', 'min', 'std'), ('identity', 'amplification',
                                     'attenuation')),
    (('sum', 'var'), ('linear', 'inverse_linear')),
    (('mean', 'sum', 'max', 'min', 'var', 'std'), ('identity',)),
])
def test_fused_vjp_matches_autodiff(aggs, scal):
    g, n = make_graph(2)
    rng = np.random.RandomState(1)
    F = 6
    msg = rng.randn(g.n_edge_pad, F).astype(np.float32)
    msg[~np.asarray(g.edge_mask)] = 0.0
    msg = jnp.asarray(msg)

    bank = fused_vjp.make_fused_bank(g.receivers, g.edge_mask)
    deg = jnp.sum(g.nbr_mask, axis=1).astype(jnp.float32)

    def f_fused(m):
        out = bank(m, g.nbr_edge_ids, g.nbr_mask, deg, aggs, scal, AVG_D)
        return out.reshape(out.shape[0], -1)

    def f_ref(m):
        return aggregate_bank(g, m, list(aggs), list(scal), AVG_D)

    # forward: same values, different concat order (fused: [S, A, F];
    # generic: scalers concat of aggregator concat -> same (s, a, f) order)
    a = np.asarray(f_fused(msg))
    b = np.asarray(f_ref(msg))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    # gradients via random cotangent
    ct = jnp.asarray(rng.randn(*a.shape).astype(np.float32))
    ga = jax.grad(lambda m: jnp.sum(f_fused(m) * ct))(msg)
    gb = jax.grad(lambda m: jnp.sum(f_ref(m) * ct))(msg)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=2e-3, atol=2e-3)


def test_fused_vjp_padded_edges_zero_grad():
    g, n = make_graph(3)
    rng = np.random.RandomState(2)
    msg = jnp.asarray(rng.randn(g.n_edge_pad, 4).astype(np.float32))
    bank = fused_vjp.make_fused_bank(g.receivers, g.edge_mask)
    deg = jnp.sum(g.nbr_mask, axis=1).astype(jnp.float32)
    grad = jax.grad(lambda m: jnp.sum(
        bank(m, g.nbr_edge_ids, g.nbr_mask, deg,
             ('mean', 'max', 'std'), ('identity', 'amplification'),
             AVG_D) ** 2))(msg)
    pad = ~np.asarray(g.edge_mask)
    assert np.all(np.asarray(grad)[pad] == 0.0)
