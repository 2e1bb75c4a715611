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
    # gather/scatter-free dense-bucket path inside the distributed step, and
    # with a receiver-sorted one (partition.sort_partition_edges) 'pallas'
    # runs the skew-surviving sorted-edge sketch kernel per part
    kernel: str = 'auto'
    # split local/boundary aggregation so the local partial has no data
    # dependence on the all_to_all (comm/compute overlap; needs the
    # ``split`` tables from partition.split_edges in __call__)
    overlap: bool = False
    # per-edge input features: they live with their edge (sharded over the
    # graph axis, no exchange — the pretrans concat includes them,
    # /root/reference/models/dgl/pna_layer.py:36-43)
    edge_features: bool = False
    # node-level objective head: per-node predictions [Nl] instead of the
    # psum graph readout (the realistic objective at 10M nodes — a graph
    # scalar starves 10M nodes of signal)
    node_level: bool = False
    # Pallas kernel options forwarded to PNALayerFused
    max_degree: int = 0
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, graph: Graph, h, send_idx=None, send_mask=None,
                 train: bool = False, split=None, e=None):
        avg_d = self.avg_d or {'lin': 1.0, 'log': 1.0}
        distributed = send_idx is not None
        h = nn.Dense(self.hidden_dim, name='embedding_h')(h)
        if self.edge_features:
            e = nn.Dense(self.hidden_dim, name='embedding_e')(e)
        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            table = layer_overlap = None
            if distributed:
                halo = halo_exchange(h, send_idx, send_mask, self.graph_axis)
                if self.overlap:
                    assert split is not None
                    layer_overlap = (halo,) + tuple(split[:6])
                    if self.edge_features:
                        # split the embedded edge features to follow their
                        # edges into the local/boundary halves
                        idx_l, idx_b = split[6], split[7]
                        layer_overlap = layer_overlap + (e[idx_l], e[idx_b])
                else:
                    table = jnp.concatenate([h, halo], axis=0)
            h = PNALayerFused(
                out_dim=self.out_dim if last else self.hidden_dim,
                aggregators=self.aggregators, scalers=self.scalers,
                avg_d=avg_d, towers=self.towers, divide_input=True,
                batch_norm=self.batch_norm, residual=self.residual,
                bn_axis_name=self.bn_axes if distributed else None,
                kernel=self.kernel, edge_features=self.edge_features,
                max_degree=self.max_degree,
                pallas_interpret=self.pallas_interpret,
                name=f'layer_{i}')(graph, h, e=e, train=train,
                                   sender_table=table,
                                   overlap=layer_overlap)
        if self.node_level:
            return MLPReadout(1, name='MLP_layer')(h)[..., 0]   # [Nl]
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
                 bucket_spec=None, in_deg=None, edge_ptr=None):
    # node_feats is a zero-width placeholder: layers receive h separately,
    # but Graph.n_node_pad reads node_feats.shape[0].
    return Graph(node_feats=jnp.zeros((nl, 0)), senders=senders_l,
                 receivers=receivers_l,
                 node_graph_ids=jnp.zeros((nl,), jnp.int32),
                 node_mask=node_mask, edge_mask=edge_mask,
                 graph_mask=jnp.ones((1,), bool),
                 bucket_spec=bucket_spec, in_deg=in_deg, edge_ptr=edge_ptr)


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


def _const_tables(part: EdgePartition, net: DistributedPNANet,
                  efeats: Optional[np.ndarray] = None):
    """(tables, parse) — the static per-part index tables the step closes
    over, plus a parser that rebuilds (Graph, e, split) from the shard_map
    slices (each [1, ...], this device's row)."""
    bucket_spec = part.bucket_spec
    has_ptr = part.edge_ptr is not None
    has_e = efeats is not None
    n_split = (8 if has_e else 6) if net.overlap else 0
    nl = part.nodes_per_part

    tables = (part.senders_local, part.receivers_local, part.edge_mask,
              part.send_idx, part.send_mask, part.node_mask)
    if bucket_spec is not None:
        tables = tables + (part.in_deg,)
    if has_ptr:
        tables = tables + (part.edge_ptr,)
    if has_e:
        tables = tables + (efeats,)
    if net.overlap:
        from pna_tpu.parallel.partition import split_edges
        sp = split_edges(part)
        tables = tables + (sp.senders_local, sp.receivers_local,
                           sp.mask_local, sp.senders_bound,
                           sp.receivers_bound, sp.mask_bound)
        if has_e:
            tables = tables + (sp.idx_local, sp.idx_bound)

    def parse(*extra):
        i = 0
        in_deg = extra[i][0] if bucket_spec is not None else None
        i += bucket_spec is not None
        edge_ptr = extra[i][0] if has_ptr else None
        i += has_ptr
        e = extra[i][0] if has_e else None
        i += has_e
        split = (tuple(x[0] for x in extra[i:i + n_split]) if n_split
                 else None)
        return in_deg, edge_ptr, e, split

    return tables, parse


def make_distributed_train_step(part: EdgePartition, mesh: Mesh,
                                net: DistributedPNANet,
                                learning_rate: float = 1e-3,
                                tx: Optional[optax.GradientTransformation]
                                = None,
                                efeats: Optional[np.ndarray] = None):
    """Returns (step_fn, put_consts, tx).

    ``step_fn(params, batch_stats, opt_state, feats, targets, *consts)
    -> (params, batch_stats, opt_state, loss)`` with feats [D, G, Nl, F]
    sharded P('data', 'graph') and targets [D] sharded P('data').  Params,
    batch_stats and opt_state are replicated; gradients psum over both axes
    via the loss pmean + shard_map transpose.  ``efeats`` [P, El, Fe]
    (``part.scatter_edge_features``) rides the graph axis as a constant —
    edge features live with their edges, no exchange.
    """
    tx = tx if tx is not None else optax.adam(learning_rate)
    data_axis, graph_axis = 'data', net.graph_axis
    nl = part.nodes_per_part
    bucket_spec = part.bucket_spec
    tables, parse = _const_tables(part, net, efeats)
    # pallas_call does not support shard_map's vma checking on any backend:
    # interpret mode rejects mixed-varying dynamic_slice in the HLO
    # interpreter, and the compiled TPU path fails to lower the inserted
    # `pvary` primitive inside the kernel (measured on the real chip,
    # 2026-08-21).
    check_vma = net.kernel not in ('pallas', 'pallas_fused')

    def local_loss(params, batch_stats, feats, targets, senders_l,
                   receivers_l, edge_mask, send_idx, send_mask, node_mask,
                   *extra):
        # index tables are sharded over 'graph' only; mark them varying over
        # 'data' too so mask-derived BN counts may psum over both axes
        # (numerically a no-op — every data shard sees the same tables).
        if check_vma:
            node_mask = jax.lax.pcast(node_mask, (data_axis,), to='varying')
        in_deg, edge_ptr, e, split = parse(*extra)
        g = _local_graph(nl, senders_l[0], receivers_l[0], edge_mask[0],
                         node_mask[0], bucket_spec=bucket_spec,
                         in_deg=in_deg, edge_ptr=edge_ptr)
        pred, mutated = net.apply(
            {'params': params, 'batch_stats': batch_stats},
            g, feats[0, 0], send_idx, send_mask, train=True,
            mutable=['batch_stats'], split=split, e=e)
        loss = (pred - targets[0]) ** 2
        # pred is already invarying over 'graph' (readout psum), so only the
        # data axis needs averaging; psum'd BN statistics are already
        # identical on every device.
        return jax.lax.pmean(loss, data_axis), mutated['batch_stats']

    table_spec = P(graph_axis)
    n_tables = len(tables)

    def loss_fn(params, batch_stats, feats, targets, *consts):
        f = shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(), P(),                  # params/stats replicated
                      P(data_axis, graph_axis),  # feats [D, G, Nl, F]
                      P(data_axis),               # targets [D]
                      *([table_spec] * n_tables)),
            out_specs=(P(), P()), check_vma=check_vma)
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
        return tuple(put_global(x, mesh, table_spec) for x in tables)

    return step, put_consts, tx


def init_net(net: DistributedPNANet, part: EdgePartition, feat_dim: int,
             seed: int = 0, efeats: Optional[np.ndarray] = None):
    """Initialize params/batch_stats on the single-device oracle graph (the
    param tree is identical to the distributed one)."""
    g = full_graph(part, np.zeros(1, np.int64), np.zeros(1, np.int64))
    feats = jnp.zeros((part.num_parts * part.nodes_per_part, feat_dim))
    e = None
    if net.edge_features:
        assert efeats is not None, "edge_features=True needs efeats for init"
        e = jnp.zeros((g.senders.shape[0], efeats.shape[-1]))
    # the oracle graph has no edge_ptr/bucket tables; the kernel choice does
    # not change the param tree, so init through the generic path
    init_n = (net.clone(kernel='auto')
              if net.kernel in ('pallas', 'pallas_fused') else net)
    variables = init_n.init({'params': jax.random.PRNGKey(seed)}, g, feats,
                            train=False, e=e)
    return variables['params'], variables.get('batch_stats', FrozenDict())
