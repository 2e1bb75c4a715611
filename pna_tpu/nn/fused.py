"""Fused-towers PNA layer — the performance variant of ``PNALayerSparse``.

The reference loops towers in Python, giving T separate small matmuls whose
output widths (out_dim/T) waste most of the 128-wide MXU
(``models/dgl/pna_layer.py:130-139``).  Here the tower axis is folded into the
matmuls (BASELINE.json north star: "towers/pretransformation MLPs run as
batched XLA matmuls"):

* pretrans: one einsum over stacked tower kernels [T, in, out];
* the aggregator x scaler bank runs ONCE over the [E, T*F] concatenated
  messages (one ELL gather instead of T);
* posttrans/mixing likewise batched.

Math is identical to ``PNALayerSparse`` (same EPS/clamps, per-tower batch-norm
channels are disjoint so stacking is exact); tests/test_fused_layer.py checks
equivalence with ported weights."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pna_tpu.graph import Graph
from pna_tpu.nn.layers import xavier_uniform_gain
from pna_tpu.nn.sparse import MaskedBatchNorm, aggregate_bank


class StackedMLP(nn.Module):
    """Per-tower MLPs with stacked kernels: [N..., T, in] -> [N..., T, out]
    via einsum (relu between layers, none at the end — matches
    models/layers.py MLP with mid relu / last none)."""
    hidden: int
    out: int
    layers: int
    towers: int

    @nn.compact
    def __call__(self, x):  # x: [..., T, F_in]
        dims = ([x.shape[-1]] + [self.hidden] * (self.layers - 1) + [self.out]
                if self.layers > 1 else [x.shape[-1], self.out])
        for i in range(len(dims) - 1):
            k = self.param(f'kernel_{i}',
                           _stacked_xavier(dims[i]),
                           (self.towers, dims[i], dims[i + 1]))
            b = self.param(f'bias_{i}', nn.initializers.zeros,
                           (self.towers, dims[i + 1]))
            x = jnp.einsum('...tf,tfo->...to', x, k) + b
            if i < len(dims) - 2:
                x = jax.nn.relu(x)
        return x


def _stacked_xavier(in_size):
    base = xavier_uniform_gain(1.0 / in_size)

    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, shape[0])
        return jnp.stack([base(k, shape[1:], dtype) for k in keys])
    return init


class PNALayerFused(nn.Module):
    """Drop-in equivalent of PNALayerSparse with the tower loop vectorized."""
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    dropout: float = 0.0
    graph_norm: bool = False
    batch_norm: bool = False
    towers: int = 1
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    divide_input: bool = True
    residual: bool = False
    edge_features: bool = False

    @nn.compact
    def __call__(self, graph: Graph, h, e=None, train: bool = False):
        in_dim = h.shape[-1]
        T = self.towers
        assert (not self.divide_input) or in_dim % T == 0
        assert self.out_dim % T == 0
        Ft = in_dim // T if self.divide_input else in_dim
        Fo = self.out_dim // T
        residual = self.residual and in_dim == self.out_dim
        h_in = h
        N = h.shape[0]

        # per-tower input views [N, T, Ft]
        if self.divide_input:
            ht = h.reshape(N, T, Ft)
        else:
            ht = jnp.broadcast_to(h[:, None, :], (N, T, Ft))

        src = ht[graph.senders]          # [E, T, Ft]
        dst = ht[graph.receivers]
        parts = [src, dst]
        if self.edge_features:
            eT = jnp.broadcast_to(e[:, None, :], (e.shape[0], T, e.shape[-1]))
            parts.append(eT)
        z2 = jnp.concatenate(parts, axis=-1)      # [E, T, 2Ft(+Fe)]
        pretrans = StackedMLP(hidden=Ft, out=Ft, layers=self.pretrans_layers,
                              towers=T, name='pretrans')
        msg = pretrans(z2)                        # [E, T, Ft]

        self_msg = None
        if 'identity' in self.aggregators:
            zs = [ht, ht]
            if self.edge_features:
                zs.append(jnp.zeros((N, T, e.shape[-1]), h.dtype))
            self_msg = pretrans(jnp.concatenate(zs, axis=-1)).reshape(N, T * Ft)

        # one pass of the aggregator x scaler bank over all towers at once
        A, S = len(self.aggregators), len(self.scalers)
        from pna_tpu.ops import fused_vjp
        if (graph.nbr_edge_ids is not None
                and fused_vjp.supports(self.aggregators, self.scalers)):
            # custom-VJP fused kernel: forward = one moment-sketch pass,
            # backward = node partials + one gather (no scatter)
            bank = fused_vjp.make_fused_bank(graph.receivers, graph.edge_mask)
            deg = jnp.sum(graph.nbr_mask, axis=1).astype(h.dtype)
            agg = bank(msg.reshape(-1, T * Ft), graph.nbr_edge_ids,
                       graph.nbr_mask, deg, tuple(self.aggregators),
                       tuple(self.scalers), dict(self.avg_d))
            agg = agg.reshape(agg.shape[0], -1)               # [N, S*A*T*Ft]
        else:
            agg = aggregate_bank(graph, msg.reshape(-1, T * Ft),
                                 list(self.aggregators), list(self.scalers),
                                 self.avg_d, self_msg=self_msg)  # [N, S*A*T*Ft]
        # reorder (s, a, t, f) -> per-tower (t, s, a, f)
        agg = agg.reshape(N, S, A, T, Ft)
        agg = jnp.transpose(agg, (0, 3, 1, 2, 4)).reshape(N, T, S * A * Ft)

        h_cat = jnp.concatenate([ht, agg], axis=-1)   # [N, T, (A*S+1)*Ft]
        out = StackedMLP(hidden=Fo, out=Fo, layers=self.posttrans_layers,
                         towers=T, name='posttrans')(h_cat)  # [N, T, Fo]
        out = out.reshape(N, T * Fo)

        if self.graph_norm:
            out = out * graph.snorm_n
        if self.batch_norm:
            # per-tower BN channels are disjoint -> one BN over T*Fo channels
            out = MaskedBatchNorm(name='batchnorm_h')(out, graph.node_mask,
                                                      train)
        if self.dropout:
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)

        out = nn.Dense(self.out_dim, use_bias=True,
                       kernel_init=xavier_uniform_gain(1.0 / self.out_dim),
                       bias_init=nn.initializers.zeros, name='mixing')(out)
        out = jax.nn.leaky_relu(out, negative_slope=0.01)
        if residual:
            out = h_in + out
        return out
