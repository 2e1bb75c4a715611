"""Dense (B x N x N adjacency) graph convolution layers.

TPU-first rationale: the multitask benchmark's graphs have N in 15..100, so the
O(N^2) dense formulation is *faster* on TPU than sparse gather/scatter — the
pairwise pretransformation is one big batched matmul on the MXU and the masked
reductions fuse in XLA.  Semantics match ``models/pytorch/{pna,gcn,gat,gin}``
exactly (weights portable, per-layer allclose parity).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pna_tpu.nn.layers import (FCLayer, MLP, get_activation, xavier_uniform_gain)
from pna_tpu.ops.aggregators import DENSE_AGGREGATORS
from pna_tpu.ops.scalers import DENSE_SCALERS


class PNATowerDense(nn.Module):
    """Single PNA tower on dense graphs (models/pytorch/pna/layer.py:9-54).

    pretrans MLP on cat(h_i, h_j) over all N^2 pairs -> aggregator x scaler
    cross-product -> cat with input -> posttrans MLP.
    """
    out_features: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    self_loop: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        B, N, F = x.shape
        # pairwise concat: h_cat[b, i, j] = cat(x[b, i], x[b, j])
        h_i = jnp.broadcast_to(x[:, :, None, :], (B, N, N, F))
        h_j = jnp.broadcast_to(x[:, None, :, :], (B, N, N, F))
        h_cat = jnp.concatenate([h_i, h_j], axis=3)
        h_mod = MLP(hidden_size=F, out_size=F, layers=self.pretrans_layers,
                    mid_activation='relu', last_activation='none',
                    name='pretrans')(h_cat, train)

        m = jnp.concatenate(
            [DENSE_AGGREGATORS[a](h_mod, adj, self_loop=self.self_loop)
             for a in self.aggregators], axis=2)
        m = jnp.concatenate(
            [DENSE_SCALERS[s](m, adj, avg_d=self.avg_d) for s in self.scalers],
            axis=2)

        m_cat = jnp.concatenate([x, m], axis=2)
        return MLP(hidden_size=self.out_features, out_size=self.out_features,
                   layers=self.posttrans_layers, mid_activation='relu',
                   last_activation='none', name='posttrans')(m_cat, train)


class PNALayerDense(nn.Module):
    """PNA layer: towers + LeakyReLU mixing FC (models/pytorch/pna/layer.py:57-114)."""
    out_features: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    towers: int = 1
    self_loop: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    divide_input: bool = True

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        in_features = x.shape[-1]
        assert (not self.divide_input) or in_features % self.towers == 0
        assert self.out_features % self.towers == 0
        input_tower = in_features // self.towers if self.divide_input else in_features
        output_tower = self.out_features // self.towers

        ys = []
        for t in range(self.towers):
            xt = (x[:, :, t * input_tower:(t + 1) * input_tower]
                  if self.divide_input else x)
            ys.append(PNATowerDense(
                out_features=output_tower, aggregators=self.aggregators,
                scalers=self.scalers, avg_d=self.avg_d, self_loop=self.self_loop,
                pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers,
                name=f'tower_{t}')(xt, adj, train))
        y = jnp.concatenate(ys, axis=2)
        return FCLayer(self.out_features, activation='leakyrelu',
                       name='mixing')(y, train)


class GCNLayerDense(nn.Module):
    """GCN layer (models/pytorch/gcn/layer.py:7-57): XW -> D^-1/2 (A+I) D^-1/2 ->
    bias -> LeakyReLU."""
    out_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        in_features = x.shape[-1]
        # reference init: U(-stdv, stdv), stdv = 1/sqrt(out_features) (:31-35)
        stdv = 1.0 / np.sqrt(self.out_features)
        W = self.param('W', lambda k, s: jax.random.uniform(
            k, s, jnp.float32, -stdv, stdv), (in_features, self.out_features))
        XW = x @ W
        N = adj.shape[-1]
        adj = adj + jnp.eye(N, dtype=adj.dtype)[None]
        d = jnp.sum(adj, axis=-1)
        r = jnp.power(d, -0.5)
        norm_adj = adj * r[:, :, None] * r[:, None, :]
        y = jnp.einsum('bij,bjf->bif', norm_adj, XW)
        if self.bias:
            b = self.param('b', lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -stdv, stdv), (self.out_features,))
            y = y + b
        return jax.nn.leaky_relu(y, negative_slope=0.01)


class GATHeadDense(nn.Module):
    """Single GAT attention head (models/pytorch/gat/layer.py:6-44)."""
    out_features: int
    alpha: float
    activation: bool = True

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        in_features = x.shape[-1]
        init = xavier_uniform_gain(0.1414)  # reference gain (:21-22)
        W = self.param('W', init, (in_features, self.out_features))
        a = self.param('a', init, (2 * self.out_features, 1))
        h = x @ W  # [B, N, F']
        B, N, Fh = h.shape
        # QUIRK (faithfully reproduced): the reference builds the pairwise
        # concat with torch.cat(..., dim=1) — the *sequence* axis — inherited
        # from 2-D pyGAT where dim=1 was the feature axis
        # (models/pytorch/gat/layer.py:28-29).  For batched 3-D inputs this
        # scrambles the (i, j) pairing; we reproduce the exact reshape
        # semantics so per-layer activations match.
        h_i = jnp.tile(h, (1, 1, N)).reshape(B, N * N, Fh)
        h_j = jnp.tile(h, (1, N, 1))
        a_input = jnp.concatenate([h_i, h_j], axis=1).reshape(B, N, N, 2 * Fh)
        e = jax.nn.leaky_relu(jnp.squeeze(a_input @ a, -1),
                              negative_slope=self.alpha)
        e = jnp.where(adj > 0, e, -9e15)  # reference mask value (:32-34)
        # QUIRK (reproduced): softmax over dim=1 — the *source/row* axis — then
        # h' = attention @ h (:35-36).
        attention = jax.nn.softmax(e, axis=1)
        h_prime = jnp.einsum('bij,bjf->bif', attention, h)
        return jax.nn.elu(h_prime) if self.activation else h_prime


class GATLayerDense(nn.Module):
    """Multi-head GAT layer, heads concatenated (models/pytorch/gat/layer.py:47-80)."""
    out_features: int
    alpha: float
    nheads: int = 1
    activation: bool = True

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        assert self.out_features % self.nheads == 0
        out_head = self.out_features // self.nheads
        ys = [GATHeadDense(out_features=out_head, alpha=self.alpha,
                           activation=self.activation, name=f'head_{i}')(x, adj, train)
              for i in range(self.nheads)]
        return jnp.concatenate(ys, axis=2)


class GINLayerDense(nn.Module):
    """GIN layer (models/pytorch/gin/layer.py:6-45): (A + (1+eps) I) X -> MLP."""
    out_features: int
    fc_layers: int = 2

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        in_features = x.shape[-1]
        eps = self.param('epsilon', lambda k, s: jnp.full(s, 0.1), (1,))
        N = adj.shape[-1]
        mod_adj = adj + jnp.eye(N, dtype=adj.dtype)[None] * (1.0 + eps[0])
        support = jnp.einsum('bij,bjf->bif', mod_adj, x)
        return MLP(hidden_size=max(in_features, self.out_features),
                   out_size=self.out_features, layers=self.fc_layers,
                   mid_activation='relu', last_activation='relu',
                   mid_b_norm=True, last_b_norm=False,
                   name='post_transformation')(support, train)
