"""Tower tensor-parallelism: PNALayerFused with the towers axis sharded over
a 'model' mesh axis == the unsharded single-device layer (forward and grads).
Runs on the virtual CPU mesh from conftest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pna_tpu.graph import batch_graphs
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.parallel.tower_tp import shard_tower_params, tower_param_specs

AVG_D = {"lin": 3.0, "log": 1.1}
AGGS = ('mean', 'max', 'min', 'std')
SCAL = ('identity', 'amplification', 'attenuation')


def _graph(seed=0, n=14):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < 0.4).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    for i in range(n):
        if adj[i].sum() == 0:
            j = (i + 1) % n
            adj[i, j] = adj[j, i] = 1
    recv, send = np.nonzero(adj)
    feats = rng.randn(n, 16).astype(np.float32)
    return batch_graphs([dict(node_feats=feats, senders=send.astype(np.int32),
                              receivers=recv.astype(np.int32))])


@pytest.mark.parametrize("tp", [2, 4])
def test_tower_tp_matches_single_device(tp):
    if len(jax.devices()) < tp:
        pytest.skip("not enough devices")
    towers = 4
    graph = _graph()
    h = np.asarray(graph.node_feats)

    base = PNALayerFused(out_dim=16, aggregators=AGGS, scalers=SCAL,
                         avg_d=AVG_D, towers=towers, divide_input=True,
                         batch_norm=False, residual=True)
    tp_layer = base.clone(tp_axis='model')

    params = base.init({'params': jax.random.PRNGKey(0)}, graph,
                       jnp.asarray(h), train=False)['params']

    def fwd_loss(module):
        def f(p, hh):
            out = module.apply({'params': p}, graph, hh, train=False)
            return jnp.sum(out * out), out
        return f

    ref_loss, ref_out = fwd_loss(base)(params, jnp.asarray(h))
    ref_grads = jax.grad(lambda p: fwd_loss(base)(p, jnp.asarray(h))[0])(
        params)

    mesh = Mesh(np.asarray(jax.devices()[:tp]), ('model',))
    specs = tower_param_specs(params)
    # stacked tower weights must actually be sharded over 'model'
    stacked = [s for path, s in jax.tree_util.tree_leaves_with_path(specs)
               if s != P()]
    assert len(stacked) >= 4
    sharded = shard_tower_params(params, mesh)

    with jax.sharding.set_mesh(mesh):
        tp_loss, tp_out = jax.jit(fwd_loss(tp_layer))(sharded,
                                                      jnp.asarray(h))
        tp_grads = jax.jit(jax.grad(
            lambda p: fwd_loss(tp_layer)(p, jnp.asarray(h))[0]))(sharded)

    np.testing.assert_allclose(np.asarray(tp_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(tp_grads),
            jax.tree_util.tree_leaves_with_path(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=str(path))
