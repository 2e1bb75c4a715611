"""Utilities to port reference torch weights into pna_tpu flax params for
per-layer allclose parity tests (BASELINE.json requirement).

All functions return nested dicts merged into {'params': ..., 'batch_stats': ...}.
torch Linear weight [out, in] -> flax kernel [in, out] (transpose).
"""

import numpy as np


def t2n(t):
    return t.detach().cpu().numpy()


def port_linear(lin):
    d = {'kernel': t2n(lin.weight).T}
    if lin.bias is not None:
        d['bias'] = t2n(lin.bias)
    return d


def port_fclayer(fc):
    """FCLayer -> {'params': {...}, 'batch_stats': {...}}"""
    params = {'Dense_0': port_linear(fc.linear)}
    stats = {}
    if fc.b_norm is not None:
        params['BatchNorm_0'] = {'scale': t2n(fc.b_norm.weight),
                                 'bias': t2n(fc.b_norm.bias)}
        stats['BatchNorm_0'] = {'mean': t2n(fc.b_norm.running_mean),
                                'var': t2n(fc.b_norm.running_var)}
    return params, stats


def port_mlp(mlp):
    params, stats = {}, {}
    for i, fc in enumerate(mlp.fully_connected):
        p, s = port_fclayer(fc)
        params[f'FCLayer_{i}'] = p
        if s:
            stats[f'FCLayer_{i}'] = s
    return params, stats


def port_batchnorm(bn):
    return ({'scale': t2n(bn.weight), 'bias': t2n(bn.bias)},
            {'mean': t2n(bn.running_mean), 'var': t2n(bn.running_var)})


def port_pna_tower_dense(tower):
    params, stats = {}, {}
    for name in ('pretrans', 'posttrans'):
        p, s = port_mlp(getattr(tower, name))
        params[name] = p
        if s:
            stats[name] = s
    return params, stats


def port_pna_layer_dense(layer):
    params, stats = {}, {}
    for t, tower in enumerate(layer.towers):
        p, s = port_pna_tower_dense(tower)
        params[f'tower_{t}'] = p
        if s:
            stats[f'tower_{t}'] = s
    p, s = port_fclayer(layer.mixing_network)
    params['mixing'] = p
    if s:
        stats['mixing'] = s
    return params, stats


def port_gcn_layer_dense(layer):
    params = {'W': t2n(layer.W)}
    if layer.b is not None:
        params['b'] = t2n(layer.b)
    return params, {}


def port_gat_layer_dense(layer):
    params = {}
    for i, head in enumerate(layer.heads):
        params[f'head_{i}'] = {'W': t2n(head.W), 'a': t2n(head.a)}
    return params, {}


def port_gin_layer_dense(layer):
    params = {'epsilon': t2n(layer.epsilon)}
    p, s = port_mlp(layer.post_transformation)
    params['post_transformation'] = p
    return params, ({'post_transformation': s} if s else {})


def port_gru_cell(torch_gru, hidden_size):
    """torch nn.GRU (1 layer) -> flax nn.GRUCell params.

    torch gate order along dim 0 of weight_ih_l0 [3H, In]: (r, z, n).
    flax: ir/iz/in Dense (with bias), hr/hz (no bias), hn (bias).
    b_ir+b_hr fold into flax ir bias (same for z); b_in -> in bias, b_hn -> hn.
    """
    H = hidden_size
    wih, whh = t2n(torch_gru.weight_ih_l0), t2n(torch_gru.weight_hh_l0)
    bih, bhh = t2n(torch_gru.bias_ih_l0), t2n(torch_gru.bias_hh_l0)
    wr, wz, wn = wih[:H], wih[H:2 * H], wih[2 * H:]
    ur, uz, un = whh[:H], whh[H:2 * H], whh[2 * H:]
    return {
        'ir': {'kernel': wr.T, 'bias': bih[:H] + bhh[:H]},
        'iz': {'kernel': wz.T, 'bias': bih[H:2 * H] + bhh[H:2 * H]},
        'in': {'kernel': wn.T, 'bias': bih[2 * H:]},
        'hr': {'kernel': ur.T},
        'hz': {'kernel': uz.T},
        'hn': {'kernel': un.T, 'bias': bhh[2 * H:]},
    }


def port_lstm_cell(torch_lstm, hidden_size):
    """torch nn.LSTM (1 layer) -> flax nn.OptimizedLSTMCell params.

    torch gate order: (i, f, g, o).  flax: ii/if/ig/io (no bias), hi/hf/hg/ho
    (bias) — torch b_ih + b_hh fold into the h-side biases.
    """
    H = hidden_size
    wih, whh = t2n(torch_lstm.weight_ih_l0), t2n(torch_lstm.weight_hh_l0)
    bih, bhh = t2n(torch_lstm.bias_ih_l0), t2n(torch_lstm.bias_hh_l0)
    out = {}
    for idx, g in enumerate(('i', 'f', 'g', 'o')):
        sl = slice(idx * H, (idx + 1) * H)
        out[f'i{g}'] = {'kernel': wih[sl].T}
        out[f'h{g}'] = {'kernel': whh[sl].T, 'bias': bih[sl] + bhh[sl]}
    return out


def port_set2set(s2s):
    return {'step': {'lstm': port_lstm_cell(s2s.lstm, s2s.nin)}}, {}


def port_s2s_readout(r):
    p_s2s, _ = port_set2set(r.set2set)
    p_mlp, s_mlp = port_mlp(r.mlp)
    params = {'Set2Set_0': p_s2s, 'MLP_0': p_mlp}
    stats = {'MLP_0': s_mlp} if s_mlp else {}
    return params, stats


def port_gnn(gnn, port_conv_fn):
    """Port the full reference GNN (models/pytorch/gnn_framework.py) given a
    per-conv porting function (e.g. port_pna_layer_dense)."""
    params, stats = {}, {}
    convs = list(gnn.conv_layers)
    names = ['conv_0'] + ([f'conv_mid'] if gnn.fixed and len(convs) > 1 else
                          [f'conv_{i}' for i in range(1, len(convs))])
    for name, conv in zip(names, convs):
        p, s = port_conv_fn(conv)
        params[name] = p
        if s:
            stats[name] = s
    if gnn.gru is not None:
        params['gru'] = {'GRUCell_0': port_gru_cell(gnn.gru.gru, gnn.gru.hidden_size)}
    p, s = port_mlp(gnn.nodes_read_out)
    params['nodes_read_out'] = p
    if s:
        stats['nodes_read_out'] = s
    p, s = port_s2s_readout(gnn.graph_read_out)
    params['graph_read_out'] = p
    if s:
        stats['graph_read_out'] = s
    return params, stats


def to_variables(params, stats):
    out = {'params': params}
    if stats:
        out['batch_stats'] = stats
    return out
