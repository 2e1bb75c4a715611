"""Fully-fused pretrans+sketch bank (ops/pallas_fused.py) and
PNALayerFused kernel='pallas_fused' vs the unfused kernel='pallas' path —
interpret mode on CPU; compiled-on-TPU measurement lives in bench.py
--kernel pallas_fused."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.ops.pallas_bank import make_pallas_raw_bank
from pna_tpu.ops.pallas_fused import make_fused_pretrans_bank

AGGS = ('mean', 'max', 'min', 'std')
AVG_D = {'lin': 3.1, 'log': 1.2, 'exp': 0.4}


def _random_graphs(rng, n_graphs=6, lo=5, hi=12):
    graphs = []
    for _ in range(n_graphs):
        n = rng.randint(lo, hi)
        adj = (rng.rand(n, n) < 0.4) & ~np.eye(n, dtype=bool)
        s, r = np.nonzero(adj)
        graphs.append(dict(node_feats=rng.randn(n, 8).astype(np.float32),
                           senders=s.astype(np.int32),
                           receivers=r.astype(np.int32)))
    return graphs


@pytest.mark.parametrize("with_e", [False, True])
def test_fused_bank_matches_unfused(with_e):
    """fused(u, v, ef, ke) must equal sketch(msg) with msg formed in XLA —
    forward AND gradients through u, v, ef, ke."""
    rng = np.random.RandomState(0)
    g = batch_graphs(_random_graphs(rng), sort_edges=True)
    E = g.senders.shape[0]
    N = g.n_node_pad
    F, Fe = 16, 8
    u = jnp.asarray(rng.randn(N, F).astype(np.float32))
    v = jnp.asarray(rng.randn(N, F).astype(np.float32))
    ef = jnp.asarray(rng.randn(E, Fe).astype(np.float32)) if with_e else None
    ke = jnp.asarray(rng.randn(Fe, F).astype(np.float32)) if with_e else None

    fused = make_fused_pretrans_bank(g.senders, g.receivers, g.edge_mask,
                                     g.edge_ptr, interpret=True)
    unfused = make_pallas_raw_bank(g.receivers, g.edge_mask, g.edge_ptr,
                                   interpret=True)

    def z_fused(u, v, ef, ke):
        return fused(u, v, ef, ke, AGGS)

    def z_unfused(u, v, ef, ke):
        msg = u[g.senders] + v[g.receivers]
        if ef is not None:
            msg = msg + ef @ ke
        return unfused(msg, AGGS)

    zf = z_fused(u, v, ef, ke)
    zu = z_unfused(u, v, ef, ke)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zu),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        if with_e:
            return lambda u, v, ef, ke: jnp.sum(
                jnp.sin(fn(u, v, ef, ke) * 0.7))
        return lambda u, v: jnp.sum(jnp.sin(fn(u, v, None, None) * 0.7))

    if with_e:
        gf = jax.grad(loss(z_fused), argnums=(0, 1, 2, 3))(u, v, ef, ke)
        gu = jax.grad(loss(z_unfused), argnums=(0, 1, 2, 3))(u, v, ef, ke)
    else:
        gf = jax.grad(loss(z_fused), argnums=(0, 1))(u, v)
        gu = jax.grad(loss(z_unfused), argnums=(0, 1))(u, v)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_bank_ghost_sender_table():
    """u may have more rows than v (distributed ghost table: local + halo)."""
    rng = np.random.RandomState(1)
    g = batch_graphs(_random_graphs(rng), sort_edges=True)
    N = g.n_node_pad
    extra = 13
    F = 16
    u = jnp.asarray(rng.randn(N + extra, F).astype(np.float32))
    v = jnp.asarray(rng.randn(N, F).astype(np.float32))
    # remap some senders into the ghost range
    snd = np.asarray(g.senders).copy()
    snd[::3] = N + rng.randint(0, extra, len(snd[::3]))
    snd = jnp.asarray(snd)

    fused = make_fused_pretrans_bank(snd, g.receivers, g.edge_mask,
                                     g.edge_ptr, interpret=True)
    unfused = make_pallas_raw_bank(g.receivers, g.edge_mask, g.edge_ptr,
                                   interpret=True)

    def f_fused(u, v):
        return jnp.sum(fused(u, v, None, None, AGGS) ** 2)

    def f_unfused(u, v):
        return jnp.sum(unfused(u[snd] + v[g.receivers], AGGS) ** 2)

    np.testing.assert_allclose(float(f_fused(u, v)), float(f_unfused(u, v)),
                               rtol=1e-5)
    gf = jax.grad(f_fused, argnums=(0, 1))(u, v)
    gu = jax.grad(f_unfused, argnums=(0, 1))(u, v)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("divide_input,edge_feat", [(True, False),
                                                    (False, False),
                                                    (True, True)])
def test_fused_layer_pallas_fused_vs_pallas(divide_input, edge_feat):
    rng = np.random.RandomState(2)
    g = batch_graphs(_random_graphs(rng), with_snorm=True, sort_edges=True)
    h = jnp.asarray(rng.randn(g.n_node_pad, 12).astype(np.float32))
    e = (jnp.asarray(rng.randn(g.senders.shape[0], 6).astype(np.float32))
         if edge_feat else None)

    def make(kernel):
        return PNALayerFused(out_dim=12, aggregators=AGGS,
                             scalers=('identity', 'amplification',
                                      'attenuation'),
                             avg_d=AVG_D, towers=3, divide_input=divide_input,
                             graph_norm=True, batch_norm=True, residual=True,
                             edge_features=edge_feat,
                             kernel=kernel, pallas_interpret=True)

    var = make('pallas').init({'params': jax.random.PRNGKey(0)}, g, h, e,
                              train=False)

    def run(kernel):
        m = make(kernel)

        def loss(v):
            out, mut = m.apply(v, g, h, e, train=True,
                               rngs={'dropout': jax.random.PRNGKey(1)},
                               mutable=['batch_stats'])
            return jnp.sum(out * out), out

        (l, out), grads = jax.value_and_grad(loss, has_aux=True)(var)
        return l, out, grads

    l_p, out_p, g_p = run('pallas')
    l_f, out_f, g_f = run('pallas_fused')
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(l_f), float(l_p), rtol=1e-4)
    flat_p = jax.tree_util.tree_leaves(g_p)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, b in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_layer_bf16_compute_dtype():
    """bf16 compute dtype through the fused kernels (interpret mode): both
    round-5 TPU-only failures (bf16 e-chunk DMA dtype mismatch, bf16 row
    gather alignment) were invisible to the f32-only tests — keep a bf16
    fwd+bwd path exercised."""
    import jax.numpy as jnp
    rng = np.random.RandomState(5)
    g = batch_graphs(_random_graphs(rng), with_snorm=True, sort_edges=True)
    h = jnp.asarray(rng.randn(g.n_node_pad, 12).astype(np.float32))
    e = jnp.asarray(rng.randn(g.senders.shape[0], 6).astype(np.float32))

    def make(kernel, cdt):
        return PNALayerFused(out_dim=12, aggregators=AGGS,
                             scalers=('identity', 'amplification',
                                      'attenuation'),
                             avg_d=AVG_D, towers=3, divide_input=True,
                             graph_norm=True, batch_norm=True, residual=True,
                             edge_features=True, compute_dtype=cdt,
                             kernel=kernel, pallas_interpret=True)

    var = make('pallas_fused', None).init({'params': jax.random.PRNGKey(0)},
                                          g, h, e, train=False)

    def loss(v, kernel, cdt):
        out, _ = make(kernel, cdt).apply(
            v, g, h, e, train=True, rngs={'dropout': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])
        return jnp.sum(out * out)

    l_bf16, g_bf16 = jax.value_and_grad(loss)(var, 'pallas_fused',
                                              jnp.bfloat16)
    l_f32 = loss(var, 'pallas_fused', None)
    assert np.isfinite(float(l_bf16))
    # bf16 tolerance: relative agreement with the f32 path
    np.testing.assert_allclose(float(l_bf16), float(l_f32), rtol=0.05)
    for leaf in jax.tree_util.tree_leaves(g_bf16):
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))
