"""End-to-end network assemblies for the real-world benchmarks.

TPU-native equivalents of ``realworld_benchmark/nets/*/pna_net.py``:
embed -> L x PNA layer (optional shared GRU between layers) -> graph readout ->
MLPReadout.  All operate on the padded edge-list ``Graph``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pna_tpu.graph import Graph
from pna_tpu.nn.layers import GRUUpdate, MLPReadout
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.nn.sparse import PNALayerSparse, PNASimpleLayerSparse
from pna_tpu.ops.readout import readout

# OGB molecular feature cardinalities (ogb.utils.features get_atom/bond_feature_dims)
OGB_ATOM_FEATURE_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
OGB_BOND_FEATURE_DIMS = (5, 6, 2)


class AtomEncoder(nn.Module):
    """OGB AtomEncoder: sum of per-feature embeddings, xavier-uniform init
    (used at realworld_benchmark/nets/HIV_graph_classification/pna_net.py:30)."""
    emb_dim: int
    feature_dims: Sequence[int] = OGB_ATOM_FEATURE_DIMS

    @nn.compact
    def __call__(self, x):  # x: [N, num_features] int
        out = 0
        for i, dim in enumerate(self.feature_dims):
            out = out + nn.Embed(dim, self.emb_dim,
                                 embedding_init=nn.initializers.xavier_uniform(),
                                 name=f'emb_{i}')(x[..., i])
        return out


class BondEncoder(nn.Module):
    emb_dim: int
    feature_dims: Sequence[int] = OGB_BOND_FEATURE_DIMS

    @nn.compact
    def __call__(self, e):
        out = 0
        for i, dim in enumerate(self.feature_dims):
            out = out + nn.Embed(dim, self.emb_dim,
                                 embedding_init=nn.initializers.xavier_uniform(),
                                 name=f'emb_{i}')(e[..., i])
        return out


class PNANetMolecules(nn.Module):
    """ZINC graph-regression net
    (realworld_benchmark/nets/molecules_graph_regression/pna_net.py:16-96).

    Atom-type embedding -> in_feat_dropout -> (L-1) x PNALayer(hidden->hidden,
    divide_input_first) + final PNALayer(->out_dim, divide_input_last) with
    optional shared GRU between layers -> readout -> MLPReadout(out_dim, 1).
    """
    num_atom_type: int
    num_bond_type: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    readout_type: str = 'sum'
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = True
    towers: int = 1
    divide_input_first: bool = True
    divide_input_last: bool = True
    edge_feat: bool = False
    edge_dim: int = 0
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    gru_enable: bool = False
    # towers-as-batched-matmuls fast path (pna_tpu/nn/fused.py); same math
    fused_towers: bool = True
    # bf16 matmuls/gathers with f32 accumulation (fused path only)
    compute_dtype: Optional[jnp.dtype] = None
    # aggregation backend for the fused path: 'auto'|'pallas'|'bucketed'|
    # 'ell'|'generic' (see pna_tpu/nn/fused.py)
    kernel: str = 'auto'
    max_degree: int = 0
    pallas_interpret: bool = False
    # rematerialize each conv layer in the backward pass: residuals shrink
    # to the layer inputs (bf16 h/e) instead of the f32 msg/moment
    # intermediates autodiff would otherwise store (SURVEY hbm guidance;
    # measured on the flagship bench via --remat)
    remat: bool = False

    @nn.compact
    def __call__(self, graph: Graph, h_idx, e_idx=None, train: bool = False):
        h = nn.Embed(self.num_atom_type, self.hidden_dim,
                     embedding_init=nn.initializers.normal(1.0),
                     name='embedding_h')(h_idx)
        h = nn.Dropout(rate=self.in_feat_dropout,
                       deterministic=not train)(h)
        e = None
        if self.edge_feat:
            e = nn.Embed(self.num_bond_type, self.edge_dim,
                         embedding_init=nn.initializers.normal(1.0),
                         name='embedding_e')(e_idx)

        common = dict(aggregators=self.aggregators, scalers=self.scalers,
                      avg_d=self.avg_d, dropout=self.dropout,
                      graph_norm=self.graph_norm, batch_norm=self.batch_norm,
                      residual=self.residual, towers=self.towers,
                      edge_features=self.edge_feat,
                      pretrans_layers=self.pretrans_layers,
                      posttrans_layers=self.posttrans_layers)
        gru = (GRUUpdate(hidden_size=self.hidden_dim, name='gru')
               if self.gru_enable else None)

        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            layer_cls = PNALayerFused if self.fused_towers else PNALayerSparse
            if self.remat and self.fused_towers:
                layer_cls = nn.remat(layer_cls, static_argnums=(4,))
            extra = ({'compute_dtype': self.compute_dtype,
                      'kernel': self.kernel, 'max_degree': self.max_degree,
                      'pallas_interpret': self.pallas_interpret}
                     if self.fused_towers else {})
            conv = layer_cls(
                out_dim=self.out_dim if last else self.hidden_dim,
                divide_input=(self.divide_input_last if last
                              else self.divide_input_first),
                name=f'layer_{i}', **extra, **common)
            h_t = conv(graph, h, e, train)
            if gru is not None and not last:
                h_t = gru(h, h_t)
            h = h_t

        hg = readout(self.readout_type, graph, h)
        return MLPReadout(1, name='MLP_layer')(hg)

    @staticmethod
    def loss(scores, targets, graph_mask=None):
        """L1 loss (pna_net.py:94-96), masked over real graphs."""
        err = jnp.abs(scores.squeeze(-1) - targets)
        if graph_mask is not None:
            m = graph_mask.astype(err.dtype)
            return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
        return jnp.mean(err)


class PNANetSuperpixels(nn.Module):
    """MNIST/CIFAR10 superpixel classification net
    (realworld_benchmark/nets/superpixels_graph_classification/pna_net.py:17-97):
    Linear embeddings of float features, CE loss, n_classes outputs."""
    in_dim: int
    in_dim_edge: int
    hidden_dim: int
    out_dim: int
    n_classes: int
    n_layers: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    readout_type: str = 'sum'
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = True
    towers: int = 1
    divide_input_first: bool = True
    divide_input_last: bool = True
    edge_feat: bool = False
    edge_dim: int = 0
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    gru_enable: bool = False
    # towers-as-batched-matmuls fast path (pna_tpu/nn/fused.py); same math
    fused_towers: bool = True
    # bf16 matmuls/gathers with f32 accumulation (fused path only)
    compute_dtype: Optional[jnp.dtype] = None
    # aggregation backend for the fused path: 'auto'|'pallas'|'bucketed'|
    # 'ell'|'generic' (see pna_tpu/nn/fused.py)
    kernel: str = 'auto'
    max_degree: int = 0
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, graph: Graph, h, e=None, train: bool = False):
        from pna_tpu.nn.layers import torch_linear_init, torch_linear_bias_init
        h = nn.Dense(self.hidden_dim, kernel_init=torch_linear_init(),
                     bias_init=torch_linear_bias_init(h.shape[-1]),
                     name='embedding_h')(h)
        if self.edge_feat:
            e = nn.Dense(self.edge_dim, kernel_init=torch_linear_init(),
                         bias_init=torch_linear_bias_init(e.shape[-1]),
                         name='embedding_e')(e)
        else:
            e = None

        common = dict(aggregators=self.aggregators, scalers=self.scalers,
                      avg_d=self.avg_d, dropout=self.dropout,
                      graph_norm=self.graph_norm, batch_norm=self.batch_norm,
                      residual=self.residual, towers=self.towers,
                      edge_features=self.edge_feat,
                      pretrans_layers=self.pretrans_layers,
                      posttrans_layers=self.posttrans_layers)
        gru = (GRUUpdate(hidden_size=self.hidden_dim, name='gru')
               if self.gru_enable else None)

        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            layer_cls = PNALayerFused if self.fused_towers else PNALayerSparse
            extra = ({'compute_dtype': self.compute_dtype,
                      'kernel': self.kernel, 'max_degree': self.max_degree,
                      'pallas_interpret': self.pallas_interpret}
                     if self.fused_towers else {})
            conv = layer_cls(
                out_dim=self.out_dim if last else self.hidden_dim,
                divide_input=(self.divide_input_last if last
                              else self.divide_input_first),
                name=f'layer_{i}', **extra, **common)
            h_t = conv(graph, h, e, train)
            if gru is not None and not last:
                h_t = gru(h, h_t)
            h = h_t

        hg = readout(self.readout_type, graph, h)
        return MLPReadout(self.n_classes, name='MLP_layer')(hg)

    @staticmethod
    def loss(logits, labels, graph_mask=None):
        """CrossEntropy (superpixels pna_net.py:94-96), masked over real graphs."""
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
        if graph_mask is not None:
            m = graph_mask.astype(nll.dtype)
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
        return jnp.mean(nll)


class PNANetHIV(nn.Module):
    """MolHIV classification net
    (realworld_benchmark/nets/HIV_graph_classification/pna_net.py:9-64):
    AtomEncoder -> L x PNASimpleLayer -> readout -> MLPReadout(out_dim, 1),
    BCEWithLogits loss."""
    hidden_dim: int
    out_dim: int
    n_layers: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    readout_type: str = 'mean'
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, graph: Graph, h_idx, train: bool = False):
        h = AtomEncoder(self.hidden_dim, name='embedding_h')(h_idx)
        h = nn.Dropout(rate=self.in_feat_dropout, deterministic=not train)(h)
        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            h = PNASimpleLayerSparse(
                out_dim=self.out_dim if last else self.hidden_dim,
                aggregators=self.aggregators, scalers=self.scalers,
                avg_d=self.avg_d, dropout=self.dropout,
                batch_norm=self.batch_norm, residual=self.residual,
                posttrans_layers=self.posttrans_layers,
                name=f'layer_{i}')(graph, h, train)
        hg = readout(self.readout_type, graph, h)
        return MLPReadout(1, name='MLP_layer')(hg)

    @staticmethod
    def loss(scores, labels, graph_mask=None):
        """BCEWithLogitsLoss (HIV pna_net.py:62-64), masked over real graphs."""
        x = scores.squeeze(-1)
        y = labels.astype(x.dtype)
        # log(1+exp(-|x|)) formulation for stability
        bce = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
        if graph_mask is not None:
            m = graph_mask.astype(bce.dtype)
            return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0)
        return jnp.mean(bce)
