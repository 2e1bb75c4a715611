"""Parity tests for the sparse (edge-list) PNA layers.

DGL itself is not installed; the oracle re-enacts the DGL message-passing
semantics (``models/dgl/pna_layer.py``) with explicit python mailbox loops on
top of the reference's torch-only modules (``models/layers.py`` MLP/FCLayer and
``models/dgl/{aggregators,scalers}.py``).  This checks the TPU segment path
against the degree-bucketed reference math including pretrans concat order
(src, dst, ef), scaler D = in-degree, batch-norm and residual wiring.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from tests._reference import add_reference_to_path, reference_available
from tests.port_torch import port_fclayer, port_mlp, port_batchnorm, to_variables

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")

AVG_D = {"lin": 3.0, "log": 1.1}
AGGS = ['mean', 'max', 'min', 'std']
SCAL = ['identity', 'amplification', 'attenuation']


def random_graph_np(n=10, seed=0, p=0.45):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < p).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    for i in range(n):
        if adj[i].sum() == 0:
            j = (i + 1) % n
            adj[i, j] = adj[j, i] = 1
    recv, send = np.nonzero(adj)  # edge send -> recv
    return adj, send.astype(np.int32), recv.astype(np.int32)


def dgl_tower_oracle(torch_mods, h, ef, send, recv, n, aggregators, scalers,
                     snorm_n=None, avg_d=AVG_D):
    """Re-enact models/dgl/pna_layer.py:55-76 with explicit mailboxes."""
    import torch
    from models.dgl import aggregators as dagg, scalers as dsc

    pretrans, posttrans, bn = torch_mods
    h_t = torch.tensor(h)
    parts = [h_t[send], h_t[recv]]
    if ef is not None:
        parts.append(torch.tensor(ef))
    msg = pretrans(torch.cat(parts, dim=1))  # [E, F]

    outs = []
    for i in range(n):
        # mailbox layout in DGL is [nodes, D, F]; emulate per-node with [1, D_i, F]
        mbox = msg[torch.tensor(recv) == i].unsqueeze(0)
        a = torch.cat([dagg.AGGREGATORS[ag](mbox) for ag in aggregators], dim=1)
        outs.append(a)
    agg = torch.cat(outs, dim=0)  # [n, A*F]

    # scalers use D per node
    deg = np.bincount(recv, minlength=n)
    scaled = []
    for sc in scalers:
        cols = []
        for i in range(n):
            cols.append(dsc.SCALERS[sc](agg[i:i + 1], D=int(deg[i]), avg_d=avg_d))
        scaled.append(torch.cat(cols, dim=0))
    aggsc = torch.cat(scaled, dim=1)

    h_cat = torch.cat([h_t, aggsc], dim=1)
    out = posttrans(h_cat)
    if snorm_n is not None:
        out = out * torch.tensor(snorm_n)
    if bn is not None:
        out = bn(out)
    return out


def test_pna_tower_sparse_matches_dgl_semantics():
    add_reference_to_path()
    import torch
    from models.layers import MLP as RefMLP
    from pna_tpu.nn.sparse import PNATowerSparse

    n, F, out = 10, 6, 6
    adj, send, recv = random_graph_np(n, 0)
    rng = np.random.RandomState(1)
    h = rng.randn(n, F).astype(np.float32)

    torch.manual_seed(0)
    pretrans = RefMLP(in_size=2 * F, hidden_size=F, out_size=F, layers=1,
                      mid_activation='relu', last_activation='none')
    posttrans = RefMLP(in_size=(len(AGGS) * len(SCAL) + 1) * F, hidden_size=out,
                       out_size=out, layers=1, mid_activation='relu',
                       last_activation='none')
    bn = torch.nn.BatchNorm1d(out)
    bn.eval()
    pretrans.eval(); posttrans.eval()

    snorm = np.full((n, 1), np.sqrt(1.0 / n), np.float32)
    with torch.no_grad():
        ref = dgl_tower_oracle((pretrans, posttrans, bn), h, None, send, recv,
                               n, AGGS, SCAL, snorm_n=snorm).numpy()

    g = batch_graphs([dict(node_feats=h, senders=send, receivers=recv)],
                     with_snorm=True)
    h_pad = np.asarray(g.node_feats)

    mod = PNATowerSparse(out_dim=out, aggregators=AGGS, scalers=SCAL,
                         avg_d=AVG_D, graph_norm=True, batch_norm=True)
    p_pre, s_pre = port_mlp(pretrans)
    p_post, s_post = port_mlp(posttrans)
    bn_p, bn_s = port_batchnorm(bn)
    params = {'pretrans': p_pre, 'posttrans': p_post, 'batchnorm_h': bn_p}
    stats = {'batchnorm_h': bn_s}
    if s_pre:
        stats['pretrans'] = s_pre
    if s_post:
        stats['posttrans'] = s_post
    out_j = mod.apply(to_variables(params, stats), g, jnp.asarray(h_pad),
                      train=False)
    np.testing.assert_allclose(np.asarray(out_j)[:n], ref, rtol=2e-3, atol=5e-4)


def test_pna_layer_sparse_residual_and_mixing():
    add_reference_to_path()
    import torch
    from models.layers import MLP as RefMLP, FCLayer as RefFC
    from pna_tpu.nn.sparse import PNALayerSparse

    n, F = 8, 6
    adj, send, recv = random_graph_np(n, 2)
    rng = np.random.RandomState(3)
    h = rng.randn(n, F).astype(np.float32)

    torch.manual_seed(1)
    # towers=2, divide_input, residual (in==out)
    Ft = F // 2
    towers = []
    for _ in range(2):
        pre = RefMLP(in_size=2 * Ft, hidden_size=Ft, out_size=Ft, layers=1,
                     mid_activation='relu', last_activation='none')
        post = RefMLP(in_size=(len(AGGS) * len(SCAL) + 1) * Ft, hidden_size=Ft,
                      out_size=Ft, layers=1, mid_activation='relu',
                      last_activation='none')
        pre.eval(); post.eval()
        towers.append((pre, post, None))
    mixing = RefFC(F, F, activation='LeakyReLU')
    mixing.eval()

    with torch.no_grad():
        outs = []
        for t, (pre, post, bn) in enumerate(towers):
            ht = h[:, t * Ft:(t + 1) * Ft]
            outs.append(dgl_tower_oracle((pre, post, bn), ht, None, send, recv,
                                         n, AGGS, SCAL))
        mixed = mixing(torch.cat(outs, dim=1))
        ref = (torch.tensor(h) + mixed).numpy()  # residual

    g = batch_graphs([dict(node_feats=h, senders=send, receivers=recv)])
    mod = PNALayerSparse(out_dim=F, aggregators=AGGS, scalers=SCAL,
                         avg_d=AVG_D, towers=2, divide_input=True,
                         residual=True)
    params, stats = {}, {}
    for t, (pre, post, bn) in enumerate(towers):
        p_pre, _ = port_mlp(pre)
        p_post, _ = port_mlp(post)
        params[f'tower_{t}'] = {'pretrans': p_pre, 'posttrans': p_post}
    p_mix, _ = port_fclayer(mixing)
    params['mixing'] = p_mix
    out_j = mod.apply(to_variables(params, stats), g,
                      jnp.asarray(np.asarray(g.node_feats)), train=False)
    np.testing.assert_allclose(np.asarray(out_j)[:n], ref, rtol=2e-3, atol=5e-4)


def test_pna_simple_layer_sparse():
    add_reference_to_path()
    import torch
    from models.layers import MLP as RefMLP
    from models.dgl import aggregators as dagg, scalers as dsc
    from pna_tpu.nn.sparse import PNASimpleLayerSparse

    n, F = 9, 5
    adj, send, recv = random_graph_np(n, 4)
    rng = np.random.RandomState(5)
    h = rng.randn(n, F).astype(np.float32)

    torch.manual_seed(2)
    post = RefMLP(in_size=len(AGGS) * len(SCAL) * F, hidden_size=F, out_size=F,
                  layers=1, mid_activation='relu', last_activation='none')
    bn = torch.nn.BatchNorm1d(F)
    post.eval(); bn.eval()

    with torch.no_grad():
        # copy_u message: neighbor features raw (models/dgl/pna_layer.py:202)
        h_t = torch.tensor(h)
        msg = h_t[send]
        deg = np.bincount(recv, minlength=n)
        rows = []
        for i in range(n):
            mbox = msg[torch.tensor(recv) == i]
            a = torch.cat([dagg.AGGREGATORS[ag](mbox.unsqueeze(0))
                           for ag in AGGS], dim=1)
            s = torch.cat([dsc.SCALERS[sc](a, D=int(deg[i]), avg_d=AVG_D)
                           for sc in SCAL], dim=1)
            rows.append(s)
        aggsc = torch.cat(rows, dim=0)
        out = post(aggsc)
        out = bn(out)
        out = torch.relu(out)
        ref = (h_t + out).numpy()  # residual

    g = batch_graphs([dict(node_feats=h, senders=send, receivers=recv)])
    mod = PNASimpleLayerSparse(out_dim=F, aggregators=AGGS, scalers=SCAL,
                               avg_d=AVG_D, batch_norm=True, residual=True)
    p_post, _ = port_mlp(post)
    bn_p, bn_s = port_batchnorm(bn)
    params = {'posttrans': p_post, 'batchnorm_h': bn_p}
    stats = {'batchnorm_h': bn_s}
    out_j = mod.apply(to_variables(params, stats), g,
                      jnp.asarray(np.asarray(g.node_feats)), train=False)
    np.testing.assert_allclose(np.asarray(out_j)[:n], ref, rtol=2e-3, atol=5e-4)


def test_readouts():
    from pna_tpu.ops.readout import sum_nodes, mean_nodes, max_nodes

    rng = np.random.RandomState(0)
    gs = []
    expect_sum, expect_mean, expect_max = [], [], []
    for n in (4, 7, 5):
        feats = rng.randn(n, 3).astype(np.float32)
        adj, send, recv = random_graph_np(n, n)
        gs.append(dict(node_feats=feats, senders=send, receivers=recv))
        expect_sum.append(feats.sum(0))
        expect_mean.append(feats.mean(0))
        expect_max.append(feats.max(0))
    g = batch_graphs(gs)
    h = jnp.asarray(np.asarray(g.node_feats))
    np.testing.assert_allclose(np.asarray(sum_nodes(g, h))[:3],
                               np.stack(expect_sum), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_nodes(g, h))[:3],
                               np.stack(expect_mean), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(max_nodes(g, h))[:3],
                               np.stack(expect_max), rtol=1e-5, atol=1e-5)


def test_pna_layer_fused_matches_dgl_oracle_with_edges():
    """Direct weight-port parity of PNALayerFused (the production layer)
    against the DGL tower math oracle — edge features, towers, divide_input,
    graph_norm, batch_norm, residual all on.  Locks the (src, dst, ef)
    concat order and mailbox-degree scaler semantics
    (models/dgl/pna_layer.py:37-47) end-to-end through the fused kernels."""
    add_reference_to_path()
    import torch
    from models.layers import MLP as RefMLP, FCLayer as RefFC
    from pna_tpu.nn.fused import PNALayerFused

    n, F, T, edge_dim = 10, 8, 2, 4
    Ft = F // T
    adj, send, recv = random_graph_np(n, 7)
    rng = np.random.RandomState(11)
    h = rng.randn(n, F).astype(np.float32)
    ef = rng.randn(len(send), edge_dim).astype(np.float32)
    snorm = np.full((n, 1), np.sqrt(1.0 / n), np.float32)

    torch.manual_seed(4)
    towers = []
    for _ in range(T):
        pre = RefMLP(in_size=2 * Ft + edge_dim, hidden_size=Ft, out_size=Ft,
                     layers=2, mid_activation='relu', last_activation='none')
        post = RefMLP(in_size=(len(AGGS) * len(SCAL) + 1) * Ft,
                      hidden_size=Ft, out_size=Ft, layers=2,
                      mid_activation='relu', last_activation='none')
        bn = torch.nn.BatchNorm1d(Ft)
        with torch.no_grad():
            bn.running_mean.normal_(0.0, 0.1)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.normal_(1.0, 0.1)
            bn.bias.normal_(0.0, 0.1)
        pre.eval(); post.eval(); bn.eval()
        towers.append((pre, post, bn))
    mixing = RefFC(F, F, activation='LeakyReLU')
    mixing.eval()

    with torch.no_grad():
        outs = []
        for t, (pre, post, bn) in enumerate(towers):
            ht = h[:, t * Ft:(t + 1) * Ft]
            outs.append(dgl_tower_oracle((pre, post, bn), ht, ef, send, recv,
                                         n, AGGS, SCAL, snorm_n=snorm))
        mixed = mixing(torch.cat(outs, dim=1))
        ref = (torch.tensor(h) + mixed).numpy()  # residual (in == out)

    # port reference weights -> sparse param layout -> fused stacked layout
    from tests.test_fused_layer import port_sparse_to_fused, port_stats
    sparse_params, sparse_stats = {}, {}
    for t, (pre, post, bn) in enumerate(towers):
        p_pre, _ = port_mlp(pre)
        p_post, _ = port_mlp(post)
        bn_p, bn_s = port_batchnorm(bn)
        sparse_params[f'tower_{t}'] = {'pretrans': p_pre, 'posttrans': p_post,
                                       'batchnorm_h': bn_p}
        sparse_stats[f'tower_{t}'] = {'batchnorm_h': bn_s}
    p_mix, _ = port_fclayer(mixing)
    sparse_params['mixing'] = p_mix
    fused_params = port_sparse_to_fused(sparse_params, T, True)
    fused_stats = port_stats(sparse_stats, T)

    g = batch_graphs([dict(node_feats=h, senders=send, receivers=recv,
                           edge_feats=ef)], with_snorm=True)
    mod = PNALayerFused(out_dim=F, aggregators=AGGS, scalers=SCAL,
                        avg_d=AVG_D, towers=T, pretrans_layers=2,
                        posttrans_layers=2, divide_input=True, residual=True,
                        graph_norm=True, batch_norm=True, edge_features=True)
    out_j = mod.apply({'params': fused_params, 'batch_stats': fused_stats},
                      g, jnp.asarray(np.asarray(g.node_feats)),
                      jnp.asarray(np.asarray(g.edge_feats)), train=False)
    np.testing.assert_allclose(np.asarray(out_j)[:n], ref,
                               rtol=2e-3, atol=5e-4)
