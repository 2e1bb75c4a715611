"""Weight-port parity of the PyG-variant layers (pna_tpu/nn/pyg.py) against
a plain-torch re-execution of ``models/pytorch_geometric/pna.py`` —
PNAConv :120-159 and PNAConvSimple :233-249 — locking the PyG-specific
semantics: (x_i, x_j, e) concat order (receiver first), scaler-major bank,
true-degree scalers with deg==0 guards, var without relu clamp, plain-Linear
tower mix with no activation."""

import numpy as np
import pytest

import jax.numpy as jnp

from pna_tpu.graph import batch_graphs
from pna_tpu.nn.pyg import PNAConvPyG, PNAConvSimplePyG
from pna_tpu.ops.scalers import avg_d_from_degree_hist
from tests.port_torch import port_linear, t2n

AGGS = ('mean', 'min', 'max', 'std', 'var', 'sum')
SCAL = ('identity', 'amplification', 'attenuation', 'linear',
        'inverse_linear')


def _graph(n=12, seed=3, p=0.35):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < p).astype(np.float32)
    np.fill_diagonal(adj, 0)
    # leave node 0 with NO in-edges to exercise the deg==0 scaler guards
    adj[:, 0] = 0
    send, recv = np.nonzero(adj)  # edge u -> v for adj[u, v] = 1
    return send.astype(np.int32), recv.astype(np.int32)


def _scatter(src, index, n, reduce):
    """torch_scatter.scatter re-implementation
    (models/pytorch_geometric/aggregators.py:9-22): empty segments -> 0."""
    import torch
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    idx = index[(...,) + (None,) * (src.ndim - 1)].expand_as(src)
    return out.scatter_reduce(0, idx, src, reduce=reduce, include_self=False)


def _pyg_bank_torch(msg, recv, n, aggregators, scalers, avg_deg):
    """aggregate() of PNAConv/PNAConvSimple (pna.py:152-159, :242-249)."""
    import torch
    outs = []
    for a in aggregators:
        if a == 'sum':
            outs.append(_scatter(msg, recv, n, 'sum'))
        elif a == 'mean':
            outs.append(_scatter(msg, recv, n, 'mean'))
        elif a == 'min':
            outs.append(_scatter(msg, recv, n, 'amin'))
        elif a == 'max':
            outs.append(_scatter(msg, recv, n, 'amax'))
        elif a in ('var', 'std'):
            mean = _scatter(msg, recv, n, 'mean')
            mean_sq = _scatter(msg * msg, recv, n, 'mean')
            var = mean_sq - mean * mean
            outs.append(torch.sqrt(torch.relu(var) + 1e-5) if a == 'std'
                        else var)
    out = torch.cat(outs, dim=-1)
    deg = torch.bincount(recv, minlength=n).to(out.dtype)
    deg = deg.view((n,) + (1,) * (out.ndim - 1))
    scaled = []
    for s in scalers:  # models/pytorch_geometric/scalers.py:8-38
        if s == 'identity':
            scaled.append(out)
        elif s == 'amplification':
            scaled.append(out * (torch.log(deg + 1) / avg_deg['log']))
        elif s == 'attenuation':
            sc = avg_deg['log'] / torch.log(deg + 1)
            sc[deg == 0] = 1
            scaled.append(out * sc)
        elif s == 'linear':
            scaled.append(out * (deg / avg_deg['lin']))
        elif s == 'inverse_linear':
            sc = avg_deg['lin'] / deg
            sc[deg == 0] = 1
            scaled.append(out * sc)
    return torch.cat(scaled, dim=-1)


def _avg_deg(recv, n):
    hist = np.bincount(np.bincount(recv, minlength=n))
    return avg_d_from_degree_hist(hist)


def test_pna_conv_simple_pyg_parity():
    import torch
    n, F, F_out = 12, 6, 5
    send, recv = _graph(n)
    rng = np.random.RandomState(0)
    x = rng.randn(n, F).astype(np.float32)
    avg_deg = _avg_deg(recv, n)

    torch.manual_seed(1)
    post = [torch.nn.Linear(len(AGGS) * len(SCAL) * F, F_out),
            torch.nn.Linear(F_out, F_out)]
    with torch.no_grad():
        msg = torch.tensor(x)[torch.tensor(send, dtype=torch.long)]
        bank = _pyg_bank_torch(msg, torch.tensor(recv, dtype=torch.long), n,
                               AGGS, SCAL, avg_deg)
        ref = post[1](torch.relu(post[0](bank))).numpy()

    params = {f'post_nn_lin_{i}': port_linear(m) for i, m in enumerate(post)}
    g = batch_graphs([dict(node_feats=x, senders=send, receivers=recv)])
    mod = PNAConvSimplePyG(out_channels=F_out, aggregators=AGGS, scalers=SCAL,
                           avg_deg=avg_deg, post_layers=2)
    out = mod.apply({'params': params}, g,
                    jnp.asarray(np.asarray(g.node_feats)))
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=2e-4,
                               atol=1e-5)


@pytest.mark.parametrize("divide_input,towers,edge_dim",
                         [(False, 1, None), (True, 2, None), (True, 2, 3),
                          (False, 3, 4)])
def test_pna_conv_pyg_parity(divide_input, towers, edge_dim):
    import torch
    n, F_out = 12, 6
    T = towers
    in_ch = 6
    F_in = in_ch // T if divide_input else in_ch
    send, recv = _graph(n, seed=5)
    E = len(send)
    rng = np.random.RandomState(2)
    x = rng.randn(n, in_ch).astype(np.float32)
    ef = (rng.randn(E, edge_dim).astype(np.float32)
          if edge_dim is not None else None)
    avg_deg = _avg_deg(recv, n)
    aggs, scal = AGGS[:4], SCAL[:3]

    torch.manual_seed(7)
    pre = [[torch.nn.Linear((3 if edge_dim else 2) * F_in, F_in),
            torch.nn.Linear(F_in, F_in)] for _ in range(T)]
    post = [[torch.nn.Linear((len(aggs) * len(scal) + 1) * F_in,
                             F_out // T),
             torch.nn.Linear(F_out // T, F_out // T)] for _ in range(T)]
    lin = torch.nn.Linear(F_out, F_out)
    enc = torch.nn.Linear(edge_dim, F_in) if edge_dim else None

    with torch.no_grad():
        xt = torch.tensor(x)
        if divide_input:
            xt = xt.view(n, T, F_in)           # pna.py:123-126
        else:
            xt = xt.view(n, 1, F_in).repeat(1, T, 1)
        x_i = xt[torch.tensor(recv, dtype=torch.long)]   # receiver first
        x_j = xt[torch.tensor(send, dtype=torch.long)]
        parts = [x_i, x_j]
        if enc is not None:
            e = enc(torch.tensor(ef)).view(E, 1, F_in).repeat(1, T, 1)
            parts.append(e)
        h = torch.cat(parts, dim=-1)            # pna.py:141-147
        msgs = [p[1](torch.relu(p[0](h[:, t]))) for t, p in enumerate(pre)]
        msg = torch.stack(msgs, dim=1)           # [E, T, F_in]
        bank = _pyg_bank_torch(msg, torch.tensor(recv, dtype=torch.long), n,
                               aggs, scal, avg_deg)
        cat = torch.cat([xt, bank], dim=-1)      # pna.py:131
        outs = [p[1](torch.relu(p[0](cat[:, t])))
                for t, p in enumerate(post)]
        ref = lin(torch.cat(outs, dim=1)).numpy()  # pna.py:133-135, no act

    params = {'lin': port_linear(lin)}
    if enc is not None:
        params['edge_encoder'] = port_linear(enc)
    for t in range(T):
        for i in range(2):
            params[f'pre_nns_{t}_lin_{i}'] = port_linear(pre[t][i])
            params[f'post_nns_{t}_lin_{i}'] = port_linear(post[t][i])

    g = batch_graphs([dict(node_feats=x, senders=send, receivers=recv,
                           **({'edge_feats': ef} if ef is not None else {}))])
    mod = PNAConvPyG(out_channels=F_out, aggregators=aggs, scalers=scal,
                     avg_deg=avg_deg, edge_dim=edge_dim, towers=T,
                     pre_layers=2, post_layers=2, divide_input=divide_input)
    out = mod.apply({'params': params}, g,
                    jnp.asarray(np.asarray(g.node_feats)),
                    None if ef is None
                    else jnp.asarray(np.asarray(g.edge_feats)))
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=2e-4,
                               atol=1e-5)


def test_pyg_example_net_smoke():
    """Forward + one grad step of the example net
    (models/pytorch_geometric/example.py:27-55) on a padded batch."""
    import jax
    from pna_tpu.nn.pyg import PNANetPyGExample
    rng = np.random.RandomState(0)
    recs = []
    for i in range(4):
        nn_ = rng.randint(6, 12)
        send, recv = _graph(nn_, seed=i)
        from pna_tpu.nn.nets import OGB_ATOM_FEATURE_DIMS
        feats = np.stack([rng.randint(0, d, size=nn_)
                          for d in OGB_ATOM_FEATURE_DIMS], 1).astype(np.int32)
        recs.append(dict(node_feats=feats, senders=send, receivers=recv))
    g = batch_graphs(recs)
    avg_deg = {'lin': 2.5, 'log': 1.1, 'exp': 20.0}
    net = PNANetPyGExample(avg_deg=avg_deg, hidden=16, n_layers=2)
    x_idx = jnp.asarray(np.asarray(g.node_feats))
    variables = net.init({'params': jax.random.PRNGKey(0)}, g, x_idx,
                         train=False)
    out = net.apply(variables, g, x_idx, train=False)
    assert out.shape == (g.n_graph_pad, 1)
    assert np.isfinite(np.asarray(out)).all()
