"""PyG-variant PNA layers — exact semantics of
``models/pytorch_geometric/pna.py`` (PNAConv :17-164, PNAConvSimple
:167-254), on the framework's segment kernels.

The PyG variant differs from the DGL tower layer in ways that change the
numerics, so it gets its own modules (weight-port parity in
tests/test_pyg_layers.py):

* pretrans concat order is **(x_i, x_j, e)** — receiver first
  (pna.py:137-147) — vs DGL's (src, dst, e) (models/dgl/pna_layer.py:37-39).
* aggregator bank concats on the feature axis, THEN each scaler is applied
  to the whole bank and concatenated — scaler-major [S, A, F] ordering
  (pna.py:152-159).
* scalers use the true in-degree of each node with deg==0 guards
  (models/pytorch_geometric/scalers.py:18,28), and var has NO relu clamp
  (models/pytorch_geometric/aggregators.py:25-28).
* posttrans input is cat(x, bank) per tower; the tower outputs are mixed by
  a plain Linear with **no activation** (pna.py:131-135) — vs DGL's
  LeakyReLU.
* ``avg_deg`` {lin, log, exp} comes from a training-set degree histogram
  (pna.py:79-86) — ``pna_tpu.ops.scalers.avg_d_from_degree_hist``.
* no batch/graph-norm, residual, or dropout inside the conv — the PyG
  example net (models/pytorch_geometric/example.py:46-55) applies BN + relu
  + residual + dropout outside; ``PNANetPyGExample`` mirrors that.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pna_tpu.graph import Graph
from pna_tpu.nn.layers import torch_linear_bias_init, torch_linear_init
from pna_tpu.ops import segment as seg


def _torch_dense(feats: int, name: str, in_size: int):
    return nn.Dense(feats, kernel_init=torch_linear_init(),
                    bias_init=torch_linear_bias_init(in_size), name=name)


def _pyg_aggregate(msg, receivers, num_nodes, edge_mask, aggregators,
                   scalers, avg_deg):
    """The PyG ``aggregate``: cat over aggregators on the feature axis, then
    cat over scalers of the scaled bank (pna.py:152-159, :242-249).

    msg: [E, ..., F] -> [N, ..., S*A*F].
    """
    count = seg.segment_count(receivers, num_nodes, edge_mask,
                              dtype=msg.dtype)
    outs = []
    for a in aggregators:
        if a == 'sum':
            outs.append(seg.segment_sum(msg, receivers, num_nodes, edge_mask))
        elif a == 'mean':
            outs.append(seg.segment_mean(msg, receivers, num_nodes, edge_mask,
                                         count))
        elif a == 'min':
            outs.append(seg.segment_min(msg, receivers, num_nodes, edge_mask))
        elif a == 'max':
            outs.append(seg.segment_max(msg, receivers, num_nodes, edge_mask))
        elif a == 'var':  # PyG var: NO relu clamp (aggregators.py:25-28)
            outs.append(seg.segment_var(msg, receivers, num_nodes, edge_mask,
                                        count, relu_clamp=False))
        elif a == 'std':
            outs.append(seg.segment_std(msg, receivers, num_nodes, edge_mask,
                                        count))
        else:
            raise ValueError(f"unsupported PyG aggregator {a!r}")
    bank = jnp.concatenate(outs, axis=-1)            # [N, ..., A*F]

    from pna_tpu.ops.scalers import SCALERS
    deg = count.reshape(count.shape + (1,) * (bank.ndim - 1))
    scaled = [SCALERS[s](bank, deg, avg_deg) for s in scalers]
    return jnp.concatenate(scaled, axis=-1)          # [N, ..., S*A*F]


class PNAConvPyG(nn.Module):
    """``PNAConv`` (models/pytorch_geometric/pna.py:17-164): towers over
    (optionally divided) input, pretrans on cat(x_i, x_j [, enc(e)]),
    scaler-major aggregate bank, posttrans on cat(x, bank), plain Linear mix.
    """
    out_channels: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_deg: dict
    edge_dim: Optional[int] = None
    towers: int = 1
    pre_layers: int = 1
    post_layers: int = 1
    divide_input: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x, edge_attr=None):
        N, in_ch = x.shape
        T = self.towers
        assert (not self.divide_input) or in_ch % T == 0
        assert self.out_channels % T == 0
        F_in = in_ch // T if self.divide_input else in_ch
        F_out = self.out_channels // T

        if self.divide_input:
            xt = x.reshape(N, T, F_in)
        else:
            xt = jnp.broadcast_to(x[:, None, :], (N, T, F_in))

        x_i = xt[graph.receivers]                     # receiver FIRST
        x_j = xt[graph.senders]
        parts = [x_i, x_j]
        if self.edge_dim is not None:
            e = _torch_dense(F_in, 'edge_encoder', self.edge_dim)(edge_attr)
            parts.append(jnp.broadcast_to(e[:, None, :],
                                          (e.shape[0], T, F_in)))
        h = jnp.concatenate(parts, axis=-1)           # [E, T, (2|3)*F_in]

        msgs = []
        for t in range(T):
            m = h[:, t]
            for i in range(self.pre_layers):
                if i > 0:
                    m = jax.nn.relu(m)
                m = _torch_dense(F_in, f'pre_nns_{t}_lin_{i}', m.shape[-1])(m)
            msgs.append(m)
        msg = jnp.stack(msgs, axis=1)                 # [E, T, F_in]

        bank = _pyg_aggregate(msg, graph.receivers, N, graph.edge_mask,
                              self.aggregators, self.scalers, self.avg_deg)

        out = jnp.concatenate([xt, bank], axis=-1)    # [N, T, (A*S+1)*F_in]
        outs = []
        for t in range(T):
            o = out[:, t]
            for i in range(self.post_layers):
                if i > 0:
                    o = jax.nn.relu(o)
                o = _torch_dense(F_out, f'post_nns_{t}_lin_{i}',
                                 o.shape[-1])(o)
            outs.append(o)
        out = jnp.concatenate(outs, axis=-1)          # [N, out_channels]
        return _torch_dense(self.out_channels, 'lin',
                            self.out_channels)(out)   # NO activation


class PNAConvSimplePyG(nn.Module):
    """``PNAConvSimple`` (models/pytorch_geometric/pna.py:167-254): raw
    x_j messages, scaler-major bank [N, S*A*F] (no self concat), post_nn."""
    out_channels: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_deg: dict
    post_layers: int = 1

    @nn.compact
    def __call__(self, graph: Graph, x, edge_attr=None):
        N = x.shape[0]
        msg = x[graph.senders]                        # message = x_j
        bank = _pyg_aggregate(msg, graph.receivers, N, graph.edge_mask,
                              self.aggregators, self.scalers, self.avg_deg)
        o = bank
        for i in range(self.post_layers):
            if i > 0:
                o = jax.nn.relu(o)
            o = _torch_dense(self.out_channels, f'post_nn_lin_{i}',
                             o.shape[-1])(o)
        return o


class PNANetPyGExample(nn.Module):
    """The self-contained MolHIV example net
    (models/pytorch_geometric/example.py:27-55): AtomEncoder(80) ->
    4 x [PNAConvSimple -> BatchNorm -> relu -> residual -> dropout 0.3] ->
    global_mean_pool -> MLP(80->40->20->1)."""
    avg_deg: dict
    hidden: int = 80
    n_layers: int = 4
    aggregators: Sequence[str] = ('mean', 'min', 'max', 'std')
    scalers: Sequence[str] = ('identity', 'amplification', 'attenuation')
    dropout: float = 0.3

    @nn.compact
    def __call__(self, graph: Graph, x_idx, train: bool = False):
        from pna_tpu.nn.nets import AtomEncoder
        from pna_tpu.ops.readout import readout
        x = AtomEncoder(self.hidden, name='node_emb')(x_idx)
        for i in range(self.n_layers):
            h = PNAConvSimplePyG(self.hidden, self.aggregators, self.scalers,
                                 self.avg_deg, name=f'conv_{i}')(graph, x)
            # torch BatchNorm1d over real nodes only (padded rows masked out)
            from pna_tpu.nn.sparse import MaskedBatchNorm
            h = MaskedBatchNorm(name=f'bn_{i}')(h, graph.node_mask, train)
            h = jax.nn.relu(h)
            x = h + x
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        hg = readout('mean', graph, x)
        hg = jax.nn.relu(_torch_dense(40, 'mlp_lin_0', self.hidden)(hg))
        hg = jax.nn.relu(_torch_dense(20, 'mlp_lin_1', 40)(hg))
        return _torch_dense(1, 'mlp_lin_2', 20)(hg)
