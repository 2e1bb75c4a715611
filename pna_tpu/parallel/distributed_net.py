"""Fully-distributed PNA training step over a 2-D ('data', 'graph') mesh.

The TPU-native scaling path (reference has none — SURVEY §2.5): a large graph
is edge-partitioned over the ``graph`` mesh axis (halo exchange per layer, see
``pna_tpu.parallel.partition``), while independent feature batches ride the
``data`` axis.  The whole train step — forward, graph readout (psum over
``graph``), loss (pmean over ``data``), backward (shard_map transposes the
feature broadcast into grad psums) and the Adam update — is one jitted SPMD
program.

The model is the REAL flagship stack: embedding -> L x ``PNALayerFused``
(towers, split-kernel pretrans, fused aggregator x scaler bank, masked
BatchNorm with cross-device statistics, residual) -> masked-mean readout ->
``MLPReadout`` head — the same modules the ZINC benchmark trains
(pna_tpu/nn/nets.py), so the partitioned run is gradient-exact against the
single-device oracle (tests/test_distributed_net.py).  Reference anchor for
what must distribute: the DGL tower layer /root/reference/models/dgl/
pna_layer.py:17-148 (which has no distributed counterpart).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.core import FrozenDict
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pna_tpu.graph import Graph
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.nn.layers import MLPReadout
from pna_tpu.parallel.partition import EdgePartition, halo_exchange


class DistributedPNANet(nn.Module):
    """Flagship PNA net, device-count agnostic.

    With ``send_idx``/``send_mask`` (inside shard_map): before every layer the
    current node features are halo-exchanged over ``graph_axis`` and the layer
    gathers senders from the ghost table; BatchNorm statistics are psum'd over
    ``bn_axes``.  Without them (``None``): plain single-device semantics — the
    oracle the distributed run is tested against, with an identical param tree.
    """
    hidden_dim: int = 64
    out_dim: int = 64
    n_layers: int = 4
    towers: int = 4
    aggregators: Sequence[str] = ('mean', 'max', 'min', 'std')
    scalers: Sequence[str] = ('identity', 'amplification', 'attenuation')
    avg_d: Optional[dict] = None
    batch_norm: bool = True
    residual: bool = True
    graph_axis: str = 'graph'
    bn_axes: Optional[Tuple[str, ...]] = None   # e.g. ('data', 'graph')
    # aggregation backend forwarded to PNALayerFused; with a bucketized
    # partition (partition.bucketize_partition) 'auto'/'bucketed' runs the
    # gather/scatter-free dense-bucket path inside the distributed step
    kernel: str = 'auto'
    # split local/boundary aggregation so the local partial has no data
    # dependence on the all_to_all (comm/compute overlap; needs the
    # ``split`` tables from partition.split_edges in __call__)
    overlap: bool = False

    @nn.compact
    def __call__(self, graph: Graph, h, send_idx=None, send_mask=None,
                 train: bool = False, split=None):
        avg_d = self.avg_d or {'lin': 1.0, 'log': 1.0}
        distributed = send_idx is not None
        h = nn.Dense(self.hidden_dim, name='embedding_h')(h)
        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            table = layer_overlap = None
            if distributed:
                halo = halo_exchange(h, send_idx, send_mask, self.graph_axis)
                if self.overlap:
                    assert split is not None
                    layer_overlap = (halo,) + tuple(split)
                else:
                    table = jnp.concatenate([h, halo], axis=0)
            h = PNALayerFused(
                out_dim=self.out_dim if last else self.hidden_dim,
                aggregators=self.aggregators, scalers=self.scalers,
                avg_d=avg_d, towers=self.towers, divide_input=True,
                batch_norm=self.batch_norm, residual=self.residual,
                bn_axis_name=self.bn_axes if distributed else None,
                kernel=self.kernel,
                name=f'layer_{i}')(graph, h, train=train,
                                   sender_table=table,
                                   overlap=layer_overlap)
        # masked mean readout over ALL real nodes of the (single) graph
        m = graph.node_mask.astype(h.dtype)[:, None]
        s = jnp.sum(h * m, axis=0)
        c = jnp.sum(m)
        if distributed:
            s = jax.lax.psum(s, self.graph_axis)
            c = jax.lax.psum(c, self.graph_axis)
        hg = s / jnp.maximum(c, 1.0)
        return MLPReadout(1, name='MLP_layer')(hg)[0]


def _local_graph(nl, senders_l, receivers_l, edge_mask, node_mask,
                 bucket_spec=None, in_deg=None):
    # node_feats is a zero-width placeholder: layers receive h separately,
    # but Graph.n_node_pad reads node_feats.shape[0].
    return Graph(node_feats=jnp.zeros((nl, 0)), senders=senders_l,
                 receivers=receivers_l,
                 node_graph_ids=jnp.zeros((nl,), jnp.int32),
                 node_mask=node_mask, edge_mask=edge_mask,
                 graph_mask=jnp.ones((1,), bool),
                 bucket_spec=bucket_spec, in_deg=in_deg)


def full_graph(part: EdgePartition, senders: np.ndarray,
               receivers: np.ndarray) -> Graph:
    """Single-device oracle graph over the same padded node space [P*Nl].

    ``senders``/``receivers`` are in ORIGINAL node ids; when the partition
    was built with a locality reordering (or bucketized) they are relabeled
    into the partitioned space here, so oracle and distributed runs line up."""
    if part.node_order is not None:
        inv = part._positions()
        senders = inv[np.asarray(senders)]
        receivers = inv[np.asarray(receivers)]
    P_, nl = part.num_parts, part.nodes_per_part
    n_pad = P_ * nl
    node_mask = part.node_mask.reshape(-1)
    e_pad = max(-(-len(senders) // 8) * 8, 8)
    s = np.zeros(e_pad, np.int32)
    r = np.zeros(e_pad, np.int32)
    s[:len(senders)] = senders
    r[:len(receivers)] = receivers
    em = np.zeros(e_pad, bool)
    em[:len(senders)] = True
    return Graph(node_feats=jnp.zeros((n_pad, 0)), senders=jnp.asarray(s),
                 receivers=jnp.asarray(r),
                 node_graph_ids=jnp.zeros((n_pad,), jnp.int32),
                 node_mask=jnp.asarray(node_mask), edge_mask=jnp.asarray(em),
                 graph_mask=jnp.ones((1,), bool))


def make_distributed_train_step(part: EdgePartition, mesh: Mesh,
                                net: DistributedPNANet,
                                learning_rate: float = 1e-3,
                                tx: Optional[optax.GradientTransformation]
                                = None):
    """Returns (step_fn, put_consts, tx).

    ``step_fn(params, batch_stats, opt_state, feats, targets, *consts)
    -> (params, batch_stats, opt_state, loss)`` with feats [D, G, Nl, F]
    sharded P('data', 'graph') and targets [D] sharded P('data').  Params,
    batch_stats and opt_state are replicated; gradients psum over both axes
    via the loss pmean + shard_map transpose.
    """
    tx = tx if tx is not None else optax.adam(learning_rate)
    data_axis, graph_axis = 'data', net.graph_axis
    nl = part.nodes_per_part

    bucket_spec = part.bucket_spec
    n_split = 6 if net.overlap else 0

    def local_loss(params, batch_stats, feats, targets, senders_l,
                   receivers_l, edge_mask, send_idx, send_mask, node_mask,
                   *extra):
        # index tables are sharded over 'graph' only; mark them varying over
        # 'data' too so mask-derived BN counts may psum over both axes
        # (numerically a no-op — every data shard sees the same tables).
        node_mask = jax.lax.pcast(node_mask, (data_axis,), to='varying')
        in_deg = extra[0] if bucket_spec is not None else None
        split = (tuple(x[0] for x in extra[-n_split:]) if n_split else None)
        g = _local_graph(nl, senders_l[0], receivers_l[0], edge_mask[0],
                         node_mask[0], bucket_spec=bucket_spec,
                         in_deg=None if in_deg is None else in_deg[0])
        pred, mutated = net.apply(
            {'params': params, 'batch_stats': batch_stats},
            g, feats[0, 0], send_idx, send_mask, train=True,
            mutable=['batch_stats'], split=split)
        loss = (pred - targets[0]) ** 2
        # pred is already invarying over 'graph' (readout psum), so only the
        # data axis needs averaging; psum'd BN statistics are already
        # identical on every device.
        return jax.lax.pmean(loss, data_axis), mutated['batch_stats']

    table_spec = P(graph_axis)

    n_tables = (7 if bucket_spec is not None else 6) + n_split

    def loss_fn(params, batch_stats, feats, targets, *consts):
        f = shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(), P(),                  # params/stats replicated
                      P(data_axis, graph_axis),  # feats [D, G, Nl, F]
                      P(data_axis),               # targets [D]
                      *([table_spec] * n_tables)),
            out_specs=(P(), P()))
        return f(params, batch_stats, feats, targets, *consts)

    @jax.jit
    def step(params, batch_stats, opt_state, feats, targets, *consts):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, feats, targets,
                                   *consts)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    def put_consts():
        # put_global handles both single- and multi-process meshes
        from pna_tpu.parallel.multihost import put_global
        tables = (part.senders_local, part.receivers_local, part.edge_mask,
                  part.send_idx, part.send_mask, part.node_mask)
        if bucket_spec is not None:
            tables = tables + (part.in_deg,)
        if net.overlap:
            from pna_tpu.parallel.partition import split_edges
            sp = split_edges(part)
            tables = tables + (sp.senders_local, sp.receivers_local,
                               sp.mask_local, sp.senders_bound,
                               sp.receivers_bound, sp.mask_bound)
        return tuple(put_global(x, mesh, table_spec) for x in tables)

    return step, put_consts, tx


def init_net(net: DistributedPNANet, part: EdgePartition, feat_dim: int,
             seed: int = 0):
    """Initialize params/batch_stats on the single-device oracle graph (the
    param tree is identical to the distributed one)."""
    g = full_graph(part, np.zeros(1, np.int64), np.zeros(1, np.int64))
    feats = jnp.zeros((part.num_parts * part.nodes_per_part, feat_dim))
    variables = net.init({'params': jax.random.PRNGKey(seed)}, g, feats,
                         train=False)
    return variables['params'], variables.get('batch_stats', FrozenDict())
