"""Pallas aggregation bank (custom VJP) vs the ELL bank oracle, and
PNALayerFused kernel='pallas' vs kernel='ell' — interpret mode on CPU;
the compiled-on-TPU check lives in benchmarks/pallas_tpu_check.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.ops import fused_vjp
from pna_tpu.ops.pallas_bank import make_pallas_raw_bank

AGGS = ('mean', 'max', 'min', 'std')
AVG_D = {'lin': 3.1, 'log': 1.2, 'exp': 0.4}


def _random_graphs(rng, n_graphs=6, lo=5, hi=12):
    graphs = []
    for _ in range(n_graphs):
        n = rng.randint(lo, hi)
        p = 0.4
        adj = (rng.rand(n, n) < p) & ~np.eye(n, dtype=bool)
        s, r = np.nonzero(adj)
        graphs.append(dict(node_feats=rng.randn(n, 8).astype(np.float32),
                           senders=s.astype(np.int32),
                           receivers=r.astype(np.int32)))
    return graphs


@pytest.mark.parametrize("aggs", [AGGS, ('sum', 'var', 'mean')])
def test_pallas_bank_matches_ell_fwd_bwd(aggs):
    rng = np.random.RandomState(0)
    g = batch_graphs(_random_graphs(rng), with_ell=True, sort_edges=True)
    E = g.senders.shape[0]
    F = 16
    msg = jnp.asarray(rng.randn(E, F).astype(np.float32))
    # duplicate some rows for tie material in max/min
    msg = msg.at[1].set(msg[0])

    bank_p = make_pallas_raw_bank(g.receivers, g.edge_mask, g.edge_ptr,
                                  interpret=True)
    bank_e = fused_vjp.make_raw_bank(g.receivers, g.edge_mask)

    def f_p(m):
        return jnp.sum(jnp.sin(bank_p(m, aggs) * 0.7))

    def f_e(m):
        return jnp.sum(jnp.sin(bank_e(m, g.nbr_edge_ids, g.nbr_mask, aggs)
                               * 0.7))

    zp = bank_p(msg, aggs)
    ze = bank_e(msg, g.nbr_edge_ids, g.nbr_mask, aggs)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(ze),
                               rtol=1e-5, atol=1e-5)

    gp = jax.grad(f_p)(msg)
    ge = jax.grad(f_e)(msg)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ge),
                               rtol=1e-4, atol=1e-5)
    # padded edges must have exactly zero grad
    pad = ~np.asarray(g.edge_mask)
    assert np.all(np.asarray(gp)[pad] == 0.0)


@pytest.mark.parametrize("divide_input", [True, False])
def test_fused_layer_pallas_vs_ell(divide_input):
    rng = np.random.RandomState(1)
    g = batch_graphs(_random_graphs(rng), with_snorm=True, with_ell=True,
                     sort_edges=True)
    h = jnp.asarray(rng.randn(g.n_node_pad, 12).astype(np.float32))

    def make(kernel):
        return PNALayerFused(out_dim=12, aggregators=AGGS,
                             scalers=('identity', 'amplification',
                                      'attenuation'),
                             avg_d=AVG_D, towers=3, divide_input=divide_input,
                             graph_norm=True, batch_norm=True, residual=True,
                             kernel=kernel, pallas_interpret=True)

    var = make('ell').init({'params': jax.random.PRNGKey(0)}, g, h,
                           train=False)

    def run(kernel):
        m = make(kernel)

        def loss(v):
            out, mut = m.apply(v, g, h, train=True,
                               rngs={'dropout': jax.random.PRNGKey(1)},
                               mutable=['batch_stats'])
            return jnp.sum(out * out), out

        (l, out), grads = jax.value_and_grad(loss, has_aux=True)(var)
        return l, out, grads

    l_e, out_e, g_e = run('ell')
    l_p, out_p, g_p = run('pallas')
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(l_p), float(l_e), rtol=1e-4)
    flat_e = jax.tree_util.tree_leaves(g_e)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(flat_p, flat_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_bank_pad_edges_excluded():
    """Pad edges carry nonzero messages (pretrans bias); the bank must clamp
    the CSR ranges so they never pollute any node's statistics."""
    rng = np.random.RandomState(2)
    g = batch_graphs(_random_graphs(rng, n_graphs=2), with_ell=True,
                     sort_edges=True, n_edge_pad=256)
    E = g.senders.shape[0]
    msg = jnp.asarray(rng.randn(E, 8).astype(np.float32))
    msg = jnp.where(jnp.asarray(g.edge_mask)[:, None], msg, 1e6)

    bank_p = make_pallas_raw_bank(g.receivers, g.edge_mask, g.edge_ptr,
                                  interpret=True)
    bank_e = fused_vjp.make_raw_bank(g.receivers, g.edge_mask)
    zp = bank_p(msg, AGGS)
    ze = bank_e(msg, g.nbr_edge_ids, g.nbr_mask, AGGS)
    real = np.asarray(g.node_mask)
    np.testing.assert_allclose(np.asarray(zp)[real], np.asarray(ze)[real],
                               rtol=1e-5, atol=1e-5)


def test_pallas_bank_rejects_bad_max_degree_hint():
    """A max_degree hint below the true in-degree must raise at bind time
    instead of silently under-reducing max/min (ADVICE r2)."""
    rng = np.random.RandomState(3)
    g = batch_graphs(_random_graphs(rng), with_ell=True, sort_edges=True)
    ptr = np.asarray(g.edge_ptr)
    n_real = int(np.sum(np.asarray(g.edge_mask)))
    true_max = int(np.max(np.diff(np.minimum(ptr, n_real))))
    assert true_max > 1
    with pytest.raises(ValueError, match="under-reduce"):
        make_pallas_raw_bank(g.receivers, g.edge_mask, g.edge_ptr,
                             max_degree=1, interpret=True)
    # a correct (or generous) hint binds fine
    make_pallas_raw_bank(g.receivers, g.edge_mask, g.edge_ptr,
                         max_degree=true_max, interpret=True)


def test_narrow_gather_backward_matches_wide():
    """The large-graph backward (per-field gathers) must produce the same
    d_msg as the wide-gather path."""
    import jax
    import jax.numpy as jnp
    from pna_tpu.ops import pallas_bank
    rng = np.random.RandomState(3)
    N, F, E = 40, 9, 300
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    ptr = np.zeros(N + 1, np.int32)
    ptr[1:] = np.searchsorted(recv, np.arange(1, N + 1))
    msg = rng.randn(E, F).astype(np.float32)
    aggs = ('mean', 'max', 'min', 'std')

    def grad_with(limit):
        old = pallas_bank.WIDE_GATHER_BYTES_LIMIT
        pallas_bank.WIDE_GATHER_BYTES_LIMIT = limit
        try:
            bank = pallas_bank.make_pallas_raw_bank(
                jnp.asarray(recv), None, jnp.asarray(ptr), interpret=True)
            f = lambda m: jnp.sum(bank(m, aggs) ** 2)
            return np.asarray(jax.grad(f)(jnp.asarray(msg)))
        finally:
            pallas_bank.WIDE_GATHER_BYTES_LIMIT = old

    wide = grad_with(1 << 40)
    narrow = grad_with(0)
    np.testing.assert_allclose(narrow, wide, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("skew", [False, True])
def test_bwd_kernel_matches_gather_backward(skew):
    """The streaming d_msg kernel (sorted_dmsg) must reproduce the gather
    backward exactly — across node-tile boundaries (N > TILE_N forces
    boundary-chunk read-modify-write merges) and under hub-degree skew."""
    from pna_tpu.ops import pallas_bank
    rng = np.random.RandomState(7)
    N, F, E = 300, 24, 2600
    if skew:
        # one hub node owns ~half the edges (chunk-spanning segments)
        recv = np.where(rng.rand(E) < 0.5, 17,
                        rng.randint(0, N, E)).astype(np.int32)
    else:
        recv = rng.randint(0, N, E).astype(np.int32)
    recv = np.sort(recv)
    ptr = np.zeros(N + 1, np.int32)
    ptr[1:] = np.searchsorted(recv, np.arange(1, N + 1))
    msg = rng.randn(E, F).astype(np.float32)
    msg[5] = msg[4]          # tie material
    aggs = ('mean', 'max', 'min', 'std')

    def grad_with(bwd_kernel):
        bank = pallas_bank.make_pallas_raw_bank(
            jnp.asarray(recv), None, jnp.asarray(ptr), interpret=True,
            bwd_kernel=bwd_kernel)
        f = lambda m: jnp.sum(jnp.cos(bank(m, aggs)))
        return np.asarray(jax.grad(f)(jnp.asarray(msg)))

    g_kernel = grad_with(True)
    g_gather = grad_with(False)
    np.testing.assert_allclose(g_kernel, g_gather, rtol=1e-5, atol=1e-6)
