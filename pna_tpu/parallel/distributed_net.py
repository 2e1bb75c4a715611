"""Fully-distributed PNA training step over a 2-D ('data', 'graph') mesh.

The TPU-native scaling path (reference has none — SURVEY §2.5): a large graph
is edge-partitioned over the ``graph`` mesh axis (halo exchange per layer, see
``pna_tpu.parallel.partition``), while independent feature batches ride the
``data`` axis.  The whole train step — forward, graph readout (psum over
``graph``), loss (pmean over ``data``), backward (shard_map transposes the
feature broadcast into grad psums) and the Adam update — is one jitted SPMD
program.

Model: a PNASimpleLayer-style stack (aggregate -> linear -> relu [+ residual])
with a mean-node graph readout and scalar regression head; enough structure to
exercise every communication pattern while staying kernel-honest.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pna_tpu.graph import Graph
from pna_tpu.nn.sparse import aggregate_bank
from pna_tpu.parallel.partition import EdgePartition, halo_exchange


def init_distributed_pna_params(rng, in_dim: int, hidden: int, n_layers: int,
                                n_aggs: int, n_scalers: int) -> Dict:
    params = {}
    k = rng
    dim = in_dim
    for l in range(n_layers):
        k, k1, k2 = jax.random.split(k, 3)
        fan_in = n_aggs * n_scalers * dim
        params[f'layer_{l}'] = {
            'W': jax.random.normal(k1, (fan_in, hidden)) / np.sqrt(fan_in),
            'b': jnp.zeros((hidden,)),
        }
        dim = hidden
    k, k1 = jax.random.split(k)
    params['head'] = {'W': jax.random.normal(k1, (hidden, 1)) / np.sqrt(hidden),
                      'b': jnp.zeros((1,))}
    return params


def make_distributed_train_step(part: EdgePartition, mesh: Mesh,
                                aggregators: Sequence[str] = ('mean', 'max',
                                                              'min', 'std'),
                                scalers: Sequence[str] = ('identity',
                                                          'amplification',
                                                          'attenuation'),
                                avg_d=None,
                                learning_rate: float = 1e-3):
    """Returns (step_fn, put_consts) where
    ``step_fn(params, opt_state, feats, targets) -> (params, opt_state, loss)``
    with feats [DATA, GRAPH, Nl, F] sharded P('data', 'graph') and targets
    [DATA] sharded P('data')."""
    avg_d = avg_d or {'lin': 1.0, 'log': 1.0}
    tx = optax.adam(learning_rate)
    n_layers_holder = {}

    data_axis, graph_axis = 'data', 'graph'

    def local_forward(params, feats, senders_l, receivers_l, edge_mask,
                      send_idx, send_mask, node_mask):
        """Runs on one device: feats [1, 1, Nl, F]; index tables [1, ...]."""
        h = feats[0, 0]
        nl = h.shape[0]
        g = Graph(node_feats=h, senders=senders_l[0],
                  receivers=receivers_l[0],
                  node_graph_ids=jnp.zeros((nl,), jnp.int32),
                  node_mask=node_mask[0], edge_mask=edge_mask[0],
                  graph_mask=jnp.ones((1,), bool))
        layers = [k for k in params if k.startswith('layer_')]
        for l in range(len(layers)):
            halo = halo_exchange(h, send_idx, send_mask, graph_axis)
            ghost = jnp.concatenate([h, halo], axis=0)
            msg = ghost[senders_l[0]]
            agg = aggregate_bank(g, msg, list(aggregators), list(scalers),
                                 avg_d)
            p = params[f'layer_{l}']
            h_new = jax.nn.relu(agg @ p['W'] + p['b'])
            h = h_new if h.shape[-1] != h_new.shape[-1] else h + h_new
        # graph readout: masked mean over ALL nodes => psum over graph axis
        m = node_mask[0].astype(h.dtype)[:, None]
        local_sum = jnp.sum(h * m, axis=0)
        local_cnt = jnp.sum(m)
        total_sum = jax.lax.psum(local_sum, graph_axis)
        total_cnt = jax.lax.psum(local_cnt, graph_axis)
        hg = total_sum / total_cnt
        out = hg @ params['head']['W'] + params['head']['b']
        return out[0]

    def local_loss(params, feats, targets, *consts):
        pred = local_forward(params, feats, *consts)
        loss = (pred - targets[0]) ** 2
        return jax.lax.pmean(loss, data_axis)

    spec_dg = P(data_axis, graph_axis)
    spec_g = P(None, *([graph_axis]))  # [1, ...] per-graph tables: see below

    # index tables are stacked [P_graph, ...] -> shard over graph axis only
    table_spec = P(graph_axis)

    def loss_fn(params, feats, targets, *consts):
        f = shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(),            # params replicated
                      spec_dg,        # feats [D, G, Nl, F]
                      P(data_axis),   # targets [D]
                      *([table_spec] * 6)),
            out_specs=P())
        return f(params, feats, targets, *consts)

    @jax.jit
    def step(params, opt_state, feats, targets, *consts):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, targets,
                                                  *consts)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def put_consts():
        s = lambda x: jax.device_put(jnp.asarray(x),
                                     NamedSharding(mesh, table_spec))
        return tuple(s(x) for x in
                     (part.senders_local, part.receivers_local, part.edge_mask,
                      part.send_idx, part.send_mask, part.node_mask))

    return step, put_consts, tx
