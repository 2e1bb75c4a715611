"""Distributed ('data' x 'graph' mesh) train step == single-device oracle:
same loss and same updated parameters (bitwise-near)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pna_tpu.graph import Graph
from pna_tpu.nn.sparse import aggregate_bank
from pna_tpu.parallel.distributed_net import (init_distributed_pna_params,
                                              make_distributed_train_step)
from pna_tpu.parallel.partition import partition_edges, powerlaw_graph

AGGS = ('mean', 'max', 'min', 'std')
SCAL = ('identity', 'amplification', 'attenuation')
AVG_D = {'lin': 1.0, 'log': 1.0}


def single_device_loss(params, feats_all, targets, send, recv, num_nodes):
    """Oracle: same model math on the full graph, mean over data batches."""
    n_pad = feats_all.shape[1]  # [D, N_pad, F]
    g = Graph(node_feats=feats_all[0],
              senders=jnp.asarray(send, jnp.int32),
              receivers=jnp.asarray(recv, jnp.int32),
              node_graph_ids=jnp.zeros((n_pad,), jnp.int32),
              node_mask=jnp.arange(n_pad) < num_nodes,
              edge_mask=jnp.ones((len(send),), bool),
              graph_mask=jnp.ones((1,), bool))

    def one(feats, target):
        h = feats
        layers = [k for k in params if k.startswith('layer_')]
        for l in range(len(layers)):
            msg = h[g.senders]
            agg = aggregate_bank(g, msg, list(AGGS), list(SCAL), AVG_D)
            p = params[f'layer_{l}']
            h_new = jax.nn.relu(agg @ p['W'] + p['b'])
            h = h_new if h.shape[-1] != h_new.shape[-1] else h + h_new
        m = g.node_mask.astype(h.dtype)[:, None]
        hg = jnp.sum(h * m, axis=0) / jnp.sum(m)
        out = hg @ params['head']['W'] + params['head']['b']
        return (out[0] - target) ** 2

    losses = jax.vmap(one)(feats_all, targets)
    return jnp.mean(losses)


@pytest.mark.parametrize("d_data,d_graph", [(1, 4), (2, 2), (2, 4)])
def test_distributed_step_matches_oracle(d_data, d_graph):
    n = d_data * d_graph
    if len(jax.devices()) < n:
        pytest.skip("not enough devices")
    num_nodes, num_edges, F, hidden = 48, 200, 6, 8
    send, recv = powerlaw_graph(num_nodes, num_edges, seed=2)
    part = partition_edges(send, recv, num_nodes, d_graph)
    nl = part.nodes_per_part

    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(d_data, d_graph),
                ('data', 'graph'))
    step, put_consts, tx = make_distributed_train_step(
        part, mesh, AGGS, SCAL, AVG_D, learning_rate=1e-2)

    rng = jax.random.PRNGKey(0)
    params = init_distributed_pna_params(rng, F, hidden, n_layers=2,
                                         n_aggs=len(AGGS),
                                         n_scalers=len(SCAL))
    opt_state = tx.init(params)

    feats_np = np.random.RandomState(0).randn(
        d_data, d_graph * nl, F).astype(np.float32)
    feats_np[:, num_nodes:] = 0.0
    targets_np = np.arange(d_data, dtype=np.float32)

    # oracle step
    o_loss, o_grads = jax.value_and_grad(single_device_loss)(
        params, jnp.asarray(feats_np), jnp.asarray(targets_np),
        send, recv, num_nodes)
    o_updates, _ = tx.update(o_grads, tx.init(params), params)
    o_params = optax.apply_updates(params, o_updates)

    # distributed step
    feats_sharded = jax.device_put(
        jnp.asarray(feats_np.reshape(d_data, d_graph, nl, F)),
        NamedSharding(mesh, P('data', 'graph')))
    targets = jax.device_put(jnp.asarray(targets_np),
                             NamedSharding(mesh, P('data')))
    consts = put_consts()
    new_params, _, loss = step(params, opt_state, feats_sharded, targets,
                               *consts)

    np.testing.assert_allclose(float(loss), float(o_loss), rtol=1e-4)
    for path, a in jax.tree_util.tree_leaves_with_path(new_params):
        b = o_params
        for k in path:
            b = b[k.key]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=str(path))
