"""Sparse (edge-list) graph convolution layers on segment kernels.

TPU-native replacement for the DGL message-passing path
(``models/dgl/pna_layer.py``) and the PyG path (``models/pytorch_geometric/pna.py``):
degree-bucketed mailboxes become degree-agnostic segment reductions over a
static-shape edge list; ``apply_edges`` pretransformations become batched
matmuls over the [E, F] message tensor (MXU-friendly).

Semantics parity notes:
* Pretrans concat order is (src, dst[, edge]) as in the DGL tower
  (``models/dgl/pna_layer.py:37-40``); the dense tower uses (dst, src)
  (``models/pytorch/pna/layer.py:37-39``) — per-variant parity, see SURVEY §7.3.
* Scaler degree D = in-degree of the destination (the DGL mailbox width,
  ``models/dgl/pna_layer.py:46-47``), with the PyG deg==0 guards.
* Zero in-degree nodes aggregate to 0 (reference workloads have none).
* The DGL moment aggregator reduces over *all* dims (a latent bug at
  ``models/dgl/aggregators.py:33``); we implement proper per-node moments via
  the shared segment bank instead.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pna_tpu.graph import Graph
from pna_tpu.nn.layers import FCLayer, MLP, torch_linear_init
from pna_tpu.ops import segment as seg
from pna_tpu.ops.aggregators import SEGMENT_AGGREGATORS, SegmentCtx
from pna_tpu.ops.scalers import SCALERS


def aggregate_bank(graph: Graph, msg: jnp.ndarray, aggregators: Sequence[str],
                   scalers: Sequence[str], avg_d: dict,
                   self_msg: Optional[jnp.ndarray] = None,
                   degrees: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Aggregator x scaler cross-product over edge messages -> [N, A*S*F].

    Fast path: when the graph carries the ELL (padded neighbor-list) layout,
    every aggregator is a gather + masked static-axis reduction that XLA fuses
    into one pass — no scatter (pna_tpu/ops/ell.py).  Fallback: segment ops.
    """
    if graph.nbr_edge_ids is not None:
        from pna_tpu.ops.ell import ELL_AGGREGATORS, EllCtx
        out_deg = (graph.out_degrees(msg.dtype)
                   if 'normalised_mean' in aggregators else None)
        ctx = EllCtx.create(msg, graph.nbr_edge_ids, graph.nbr_mask,
                            self_msg=self_msg, senders=graph.senders,
                            out_deg=out_deg)
        h = jnp.concatenate([ELL_AGGREGATORS[a](ctx) for a in aggregators],
                            axis=-1)
        deg = ctx.raw_cnt[:, 0] if degrees is None else degrees
    else:
        ctx = SegmentCtx.create(msg, graph.receivers, graph.n_node_pad,
                                mask=graph.edge_mask, senders=graph.senders,
                                self_msg=self_msg)
        h = jnp.concatenate([SEGMENT_AGGREGATORS[a](ctx) for a in aggregators],
                            axis=-1)
        deg = ctx.count if degrees is None else degrees
    h = jnp.concatenate([SCALERS[s](h, deg, avg_d) for s in scalers], axis=-1)
    return h


class PNATowerSparse(nn.Module):
    """PNA tower on edge lists (models/dgl/pna_layer.py:17-76)."""
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    dropout: float = 0.0
    graph_norm: bool = False
    batch_norm: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    edge_features: bool = False

    @nn.compact
    def __call__(self, graph: Graph, h, e=None, train: bool = False):
        F = h.shape[-1]
        src_h = h[graph.senders]
        dst_h = h[graph.receivers]
        if self.edge_features:
            z2 = jnp.concatenate([src_h, dst_h, e], axis=-1)
        else:
            z2 = jnp.concatenate([src_h, dst_h], axis=-1)
        pretrans = MLP(hidden_size=F, out_size=F, layers=self.pretrans_layers,
                       mid_activation='relu', last_activation='none',
                       name='pretrans')
        msg = pretrans(z2, train)

        self_msg = None
        if 'identity' in self.aggregators:
            # dense-identity equivalent: the message a node sends itself
            z_self = (jnp.concatenate(
                [h, h, jnp.zeros((h.shape[0], e.shape[-1]), h.dtype)], -1)
                if self.edge_features else jnp.concatenate([h, h], -1))
            self_msg = pretrans(z_self, train)

        agg = aggregate_bank(graph, msg, self.aggregators, self.scalers,
                             self.avg_d, self_msg=self_msg)
        h_cat = jnp.concatenate([h, agg], axis=-1)
        h_new = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                    layers=self.posttrans_layers, mid_activation='relu',
                    last_activation='none', name='posttrans')(h_cat, train)

        if self.graph_norm:
            h_new = h_new * graph.snorm_n
        if self.batch_norm:
            # BatchNorm statistics over *real* nodes only: padded rows are
            # first zeroed and the batch axis length is corrected via mask —
            # implemented by masking before BN and restoring after.
            h_new = MaskedBatchNorm(name='batchnorm_h')(h_new, graph.node_mask,
                                                        train)
        if self.dropout:
            h_new = nn.Dropout(rate=self.dropout, deterministic=not train)(h_new)
        return h_new


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the node axis that ignores padded rows.

    torch BatchNorm1d (models/dgl/pna_layer.py:26) sees only real nodes; with
    padding we compute masked mean/var ourselves and keep running stats in the
    'batch_stats' collection (momentum 0.1 torch-style, eps 1e-5).

    ``axis_name`` (str or tuple of mesh axis names) makes the statistics
    global under sharding: the masked (count, sum, sum-of-squares) partials
    are psum'd over the named axes inside shard_map/pjit, so data- or
    graph-parallel training reproduces single-device statistics exactly.
    """
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        feat = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (feat,))
        bias = self.param('bias', nn.initializers.zeros, (feat,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((feat,)))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((feat,)))
        if train:
            # Shifted-moments form: accumulate moments of (x - shift) with
            # shift = running mean (identical on every shard, so the psum
            # stays a plain sum).  Avoids the E[x^2]-E[x]^2 cancellation when
            # |mean| >> std while remaining a single-pass psum (ADVICE r2).
            shift = jax.lax.stop_gradient(ra_mean.value)
            xc = x - shift
            m = mask.astype(x.dtype)[:, None]
            n = jnp.sum(m)
            s1 = jnp.sum(xc * m, axis=0)
            s2 = jnp.sum((xc * xc) * m, axis=0)
            if self.axis_name is not None and not self.is_initializing():
                n = jax.lax.psum(n, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            n = jnp.maximum(n, 1.0)
            dmean = s1 / n
            mean = shift + dmean
            var = jnp.maximum(s2 / n - dmean * dmean, 0.0)
            if not self.is_initializing():
                # torch running_var uses the unbiased estimate
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y


class PNALayerSparse(nn.Module):
    """PNA layer: towers + mixing FC + residual (models/dgl/pna_layer.py:79-148)."""
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
        assert (not self.divide_input) or in_dim % self.towers == 0
        assert self.out_dim % self.towers == 0
        input_tower = in_dim // self.towers if self.divide_input else in_dim
        output_tower = self.out_dim // self.towers
        residual = self.residual and in_dim == self.out_dim  # :117-118

        hs = []
        for t in range(self.towers):
            ht = (h[:, t * input_tower:(t + 1) * input_tower]
                  if self.divide_input else h)
            hs.append(PNATowerSparse(
                out_dim=output_tower, aggregators=self.aggregators,
                scalers=self.scalers, avg_d=self.avg_d, dropout=self.dropout,
                graph_norm=self.graph_norm, batch_norm=self.batch_norm,
                pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers,
                edge_features=self.edge_features,
                name=f'tower_{t}')(graph, ht, e, train))
        h_cat = jnp.concatenate(hs, axis=-1)
        h_out = FCLayer(self.out_dim, activation='leakyrelu',
                        name='mixing')(h_cat, train)
        if residual:
            h_out = h + h_out
        return h_out


class PNASimpleLayerSparse(nn.Module):
    """Simplified PNA layer: no pretrans/towers/edge feats
    (models/dgl/pna_layer.py:151-219).  posttrans input is (A*S)*in (:183-185);
    order: posttrans -> BN -> ReLU -> residual -> dropout (:202-216)."""
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    dropout: float = 0.0
    batch_norm: bool = False
    residual: bool = False
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, graph: Graph, h, train: bool = False):
        h_in = h
        msg = h[graph.senders]  # fn.copy_u (:202)
        agg = aggregate_bank(graph, msg, self.aggregators, self.scalers,
                             self.avg_d)
        h_new = MLP(hidden_size=self.out_dim, out_size=self.out_dim,
                    layers=self.posttrans_layers, mid_activation='relu',
                    last_activation='none', name='posttrans')(agg, train)
        if self.batch_norm:
            h_new = MaskedBatchNorm(name='batchnorm_h')(h_new, graph.node_mask,
                                                        train)
        h_new = jax.nn.relu(h_new)
        if self.residual:
            h_new = h_in + h_new
        if self.dropout:
            h_new = nn.Dropout(rate=self.dropout, deterministic=not train)(h_new)
        return h_new


class GCNLayerSparse(nn.Module):
    """GCN on segment kernels: XW -> sym-normalised aggregation with self-loops
    -> bias -> LeakyReLU (sparse analog of models/pytorch/gcn/layer.py:41-53)."""
    out_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, h, train: bool = False):
        xw = nn.Dense(self.out_features, use_bias=False,
                      kernel_init=torch_linear_init())(h)
        # degrees including self-loop
        deg = graph.in_degrees() + 1.0
        r = jax.lax.rsqrt(deg)
        w = r[graph.senders] * r[graph.receivers]
        msg = xw[graph.senders] * w[:, None]
        out = seg.segment_sum(msg, graph.receivers, graph.n_node_pad,
                              graph.edge_mask)
        out = out + xw * (r * r)[:, None]  # self-loop contribution
        if self.bias:
            b = self.param('b', nn.initializers.zeros, (self.out_features,))
            out = out + b
        return jax.nn.leaky_relu(out, negative_slope=0.01)


class GATLayerSparse(nn.Module):
    """GAT on SDDMM + segment-softmax + SpMM kernels (sparse analog of
    models/pytorch/gat/layer.py, consistent direction: softmax over in-edges)."""
    out_features: int
    alpha: float = 0.2
    nheads: int = 1
    activation: bool = True

    @nn.compact
    def __call__(self, graph: Graph, h, train: bool = False):
        assert self.out_features % self.nheads == 0
        F_head = self.out_features // self.nheads
        outs = []
        for i in range(self.nheads):
            W = self.param(f'W_{i}', nn.initializers.xavier_uniform(),
                           (h.shape[-1], F_head))
            a = self.param(f'a_{i}', nn.initializers.xavier_uniform(),
                           (2 * F_head, 1))
            hw = h @ W
            a_dst, a_src = a[:F_head, 0], a[F_head:, 0]
            # SDDMM: per-edge logits from endpoint projections
            logits = jax.nn.leaky_relu(
                (hw @ a_dst)[graph.receivers] + (hw @ a_src)[graph.senders],
                negative_slope=self.alpha)
            att = seg.segment_softmax_weights(logits[:, None], graph.receivers,
                                              graph.n_node_pad, graph.edge_mask)
            msg = hw[graph.senders] * att
            out = seg.segment_sum(msg, graph.receivers, graph.n_node_pad,
                                  graph.edge_mask)
            outs.append(jax.nn.elu(out) if self.activation else out)
        return jnp.concatenate(outs, axis=-1)


class GINLayerSparse(nn.Module):
    """GIN on segment kernels: (1+eps)*x + sum_nbrs -> MLP (sparse analog of
    models/pytorch/gin/layer.py:36-40)."""
    out_features: int
    fc_layers: int = 2

    @nn.compact
    def __call__(self, graph: Graph, h, train: bool = False):
        eps = self.param('epsilon', lambda k, s: jnp.full(s, 0.1), (1,))
        nbr = seg.segment_sum(h[graph.senders], graph.receivers,
                              graph.n_node_pad, graph.edge_mask)
        support = nbr + (1.0 + eps[0]) * h
        return MLP(hidden_size=max(h.shape[-1], self.out_features),
                   out_size=self.out_features, layers=self.fc_layers,
                   mid_activation='relu', last_activation='relu',
                   mid_b_norm=True, last_b_norm=False,
                   name='post_transformation')(support, train)
