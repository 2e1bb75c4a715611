"""PNALayerFused (towers as batched matmuls) == PNALayerSparse (tower loop)
with the same weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.nn.sparse import PNALayerSparse

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


def port_sparse_to_fused(params, towers, batch_norm):
    """Stack tower_t/{pretrans,posttrans} FCLayer weights into StackedMLP."""
    out = {}
    for mlp in ('pretrans', 'posttrans'):
        layers = sorted(params['tower_0'][mlp].keys())
        d = {}
        for i, fc in enumerate(layers):
            ks = [params[f'tower_{t}'][mlp][fc]['Dense_0']['kernel']
                  for t in range(towers)]
            bs = [params[f'tower_{t}'][mlp][fc]['Dense_0']['bias']
                  for t in range(towers)]
            d[f'kernel_{i}'] = jnp.stack(ks)
            d[f'bias_{i}'] = jnp.stack(bs)
        out[mlp] = d
    if batch_norm:
        out['batchnorm_h'] = {
            'scale': jnp.concatenate(
                [params[f'tower_{t}']['batchnorm_h']['scale']
                 for t in range(towers)]),
            'bias': jnp.concatenate(
                [params[f'tower_{t}']['batchnorm_h']['bias']
                 for t in range(towers)]),
        }
    out['mixing'] = {'kernel': params['mixing']['Dense_0']['kernel'],
                     'bias': params['mixing']['Dense_0']['bias']}
    return out


def port_stats(stats, towers):
    return {'batchnorm_h': {
        'mean': jnp.concatenate([stats[f'tower_{t}']['batchnorm_h']['mean']
                                 for t in range(towers)]),
        'var': jnp.concatenate([stats[f'tower_{t}']['batchnorm_h']['var']
                                for t in range(towers)]),
    }}


@pytest.mark.parametrize("divide_input,edge_feat,aggs", [
    (True, False, ('mean', 'max', 'min', 'std')),
    (False, True, ('mean', 'max', 'min', 'std')),
    (False, False, ('mean', 'sum', 'var', 'identity', 'softmax', 'moment3')),
])
def test_fused_matches_sparse(divide_input, edge_feat, aggs):
    send, recv, n = random_graph(1)
    F, T = 12, 3
    out_dim = 12
    scal = ('identity', 'amplification', 'attenuation')
    g = batch_graphs([dict(node_feats=np.zeros((n, F), np.float32),
                           senders=send, receivers=recv)], with_snorm=True)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(g.n_node_pad, F).astype(np.float32))
    e = (jnp.asarray(rng.randn(g.n_edge_pad, 4).astype(np.float32))
         if edge_feat else None)

    common = dict(out_dim=out_dim, aggregators=aggs, scalers=scal,
                  avg_d=AVG_D, towers=T, pretrans_layers=2,
                  posttrans_layers=2, divide_input=divide_input,
                  residual=True, graph_norm=True, batch_norm=True,
                  edge_features=edge_feat)
    sparse = PNALayerSparse(**common)
    fused = PNALayerFused(**common)

    vs = sparse.init({'params': jax.random.PRNGKey(0)}, g, h, e, train=False)
    fused_params = port_sparse_to_fused(vs['params'], T, True)
    fused_stats = port_stats(vs.get('batch_stats', {}), T)

    a = sparse.apply(vs, g, h, e, train=False)
    b = fused.apply({'params': fused_params, 'batch_stats': fused_stats},
                    g, h, e, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


def test_fused_train_mode_runs():
    send, recv, n = random_graph(2)
    g = batch_graphs([dict(node_feats=np.zeros((n, 8), np.float32),
                           senders=send, receivers=recv)], with_snorm=True)
    h = jnp.asarray(np.random.RandomState(1).randn(g.n_node_pad, 8)
                    .astype(np.float32))
    fused = PNALayerFused(out_dim=8, aggregators=('mean', 'max'),
                          scalers=('identity',), avg_d=AVG_D, towers=2,
                          batch_norm=True, dropout=0.1)
    vs = fused.init({'params': jax.random.PRNGKey(0)}, g, h, train=False)
    out, mutated = fused.apply(vs, g, h, train=True,
                               rngs={'dropout': jax.random.PRNGKey(1)},
                               mutable=['batch_stats'])
    assert np.isfinite(np.asarray(out)).all()


def test_auto_selects_pallas_when_no_static_layout():
    """kernel='auto' must route to the sorted-edge Pallas sketch when the
    graph carries only edge_ptr (no ELL table, no bucket spec) — the
    large-graph regime — and match the generic segment path."""
    send, recv, n = random_graph(3)
    g = batch_graphs(
        [dict(node_feats=np.random.RandomState(0).randn(n, 8)
              .astype(np.float32), senders=send, receivers=recv)],
        with_ell=False, sort_edges=True)
    assert g.nbr_edge_ids is None and g.bucket_spec is None
    assert g.edge_ptr is not None
    h = jnp.asarray(np.random.RandomState(1).randn(g.node_feats.shape[0], 8)
                    .astype(np.float32))

    def make(kernel, interpret):
        return PNALayerFused(out_dim=8, aggregators=('mean', 'max', 'min',
                                                     'std'),
                             scalers=('identity', 'amplification',
                                      'attenuation'),
                             avg_d=AVG_D, towers=2, divide_input=True,
                             kernel=kernel, pallas_interpret=interpret)
    layer_auto = make('auto', True)     # interpret => auto may pick pallas
    layer_gen = make('generic', False)
    params = layer_auto.init({'params': jax.random.PRNGKey(0)}, g, h,
                             train=False)
    # prove the pallas bank is what 'auto' routed to
    from pna_tpu.ops import pallas_bank
    calls = []
    orig = pallas_bank.make_pallas_raw_bank

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)
    pallas_bank.make_pallas_raw_bank = spy
    try:
        out_auto = layer_auto.apply(params, g, h, train=False)
    finally:
        pallas_bank.make_pallas_raw_bank = orig
    assert calls, "auto did not select the pallas backend"
    out_gen = layer_gen.apply(params, g, h, train=False)
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_gen),
                               rtol=2e-4, atol=2e-4)
