"""Per-layer allclose parity vs the reference PyTorch implementation with ported
weights (BASELINE.json: "Per-layer activations must match the reference PyTorch
implementation (allclose)")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests._reference import add_reference_to_path, reference_available
from tests.port_torch import (port_gat_layer_dense, port_gcn_layer_dense,
                              port_gin_layer_dense, port_gnn,
                              port_pna_layer_dense, to_variables)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")

B, N, NFEAT, NHID = 2, 9, 6, 8
AVG_D = {"lin": 3.5, "log": 1.3, "exp": 0.9}
AGGS = ['mean', 'max', 'min', 'std']
SCAL = ['identity', 'amplification', 'attenuation']


def random_graph(seed=0):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(B, N, N) < 0.5).astype(np.float32)
    adj = np.maximum(adj, adj.transpose(0, 2, 1))
    np.einsum('bii->bi', adj)[:] = 0
    for b in range(B):
        for i in range(N):
            if adj[b, i].sum() == 0:
                j = (i + 1) % N
                adj[b, i, j] = adj[b, j, i] = 1.0
    x = rng.randn(B, N, NFEAT).astype(np.float32)
    return adj, x


def check(flax_mod, variables, ref_mod, x, adj, atol=5e-4, extract=None):
    import torch
    ref_mod.eval()
    with torch.no_grad():
        ref_out = ref_mod(torch.tensor(x), torch.tensor(adj))
    ours = flax_mod.apply(variables, jnp.asarray(x), jnp.asarray(adj),
                          train=False)
    if extract is None:
        ref_out, ours = [ref_out], [ours]
    else:
        ref_out, ours = extract(ref_out), extract(ours)
    for r, o in zip(ref_out, ours):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-3, atol=atol)


def test_pna_layer_dense_parity():
    add_reference_to_path()
    import torch
    from models.pytorch.pna.layer import PNALayer as RefPNALayer
    from pna_tpu.nn.dense import PNALayerDense

    torch.manual_seed(0)
    ref = RefPNALayer(in_features=NFEAT, out_features=NHID, aggregators=AGGS,
                      scalers=SCAL, avg_d=AVG_D, towers=2, self_loop=False,
                      pretrans_layers=2, posttrans_layers=2, divide_input=True)
    adj, x = random_graph()
    mod = PNALayerDense(out_features=NHID, aggregators=AGGS, scalers=SCAL,
                        avg_d=AVG_D, towers=2, pretrans_layers=2,
                        posttrans_layers=2, divide_input=True)
    params, stats = port_pna_layer_dense(ref)
    check(mod, to_variables(params, stats), ref, x, adj)


def test_pna_layer_all_aggregators_parity():
    add_reference_to_path()
    import torch
    from models.pytorch.pna.layer import PNALayer as RefPNALayer
    from pna_tpu.nn.dense import PNALayerDense

    aggs = ['mean', 'sum', 'max', 'min', 'identity', 'std', 'var',
            'normalised_mean', 'softmax', 'softmin', 'moment3', 'moment4',
            'moment5']
    scal = ['identity', 'amplification', 'attenuation', 'linear',
            'inverse_linear']
    torch.manual_seed(1)
    ref = RefPNALayer(in_features=NFEAT, out_features=NHID, aggregators=aggs,
                      scalers=scal, avg_d=AVG_D, towers=1, self_loop=True,
                      pretrans_layers=1, posttrans_layers=1, divide_input=False)
    adj, x = random_graph(1)
    mod = PNALayerDense(out_features=NHID, aggregators=aggs, scalers=scal,
                        avg_d=AVG_D, towers=1, self_loop=True,
                        divide_input=False)
    params, stats = port_pna_layer_dense(ref)
    check(mod, to_variables(params, stats), ref, x, adj, atol=1e-3)


def test_gcn_layer_parity():
    add_reference_to_path()
    import torch
    from models.pytorch.gcn.layer import GCNLayer as RefGCN
    from pna_tpu.nn.dense import GCNLayerDense

    torch.manual_seed(0)
    ref = RefGCN(in_features=NFEAT, out_features=NHID)
    adj, x = random_graph(2)
    mod = GCNLayerDense(out_features=NHID)
    params, stats = port_gcn_layer_dense(ref)
    check(mod, to_variables(params, stats), ref, x, adj)


def test_gat_layer_parity():
    add_reference_to_path()
    import torch
    from models.pytorch.gat.layer import GATLayer as RefGAT
    from pna_tpu.nn.dense import GATLayerDense

    torch.manual_seed(0)
    ref = RefGAT(in_features=NFEAT, out_features=NHID, alpha=0.2, nheads=2)
    adj, x = random_graph(3)
    mod = GATLayerDense(out_features=NHID, alpha=0.2, nheads=2)
    params, stats = port_gat_layer_dense(ref)
    check(mod, to_variables(params, stats), ref, x, adj)


def test_gin_layer_parity():
    add_reference_to_path()
    import torch
    from models.pytorch.gin.layer import GINLayer as RefGIN
    from pna_tpu.nn.dense import GINLayerDense

    torch.manual_seed(0)
    ref = RefGIN(in_features=NFEAT, out_features=NHID, fc_layers=2)
    adj, x = random_graph(4)
    mod = GINLayerDense(out_features=NHID, fc_layers=2)
    params, stats = port_gin_layer_dense(ref)
    check(mod, to_variables(params, stats), ref, x, adj)


@pytest.mark.parametrize("opts", [
    dict(),
    dict(skip=True),
    dict(gru=True),
    dict(fixed=True),
    dict(variable=True, fixed=True),
])
def test_gnn_framework_parity(opts):
    add_reference_to_path()
    import torch
    from models.pytorch.gnn_framework import GNN as RefGNN
    from models.pytorch.pna.layer import PNALayer as RefPNALayer
    from pna_tpu.nn.dense import PNALayerDense
    from pna_tpu.nn.gnn import GNN, VARIABLE_LAYERS_FUNCTIONS

    torch.manual_seed(0)
    conv_args = dict(aggregators=AGGS, scalers=SCAL, avg_d=AVG_D, towers=2,
                     divide_input=False)
    variable = opts.get('variable', False)
    ref = RefGNN(
        nfeat=NFEAT, nhid=NHID, nodes_out=3, graph_out=2, dropout=0.0,
        conv_layers=(lambda adj: adj.shape[1] // 2) if variable else 3,
        fc_layers=2,
        first_conv_descr=dict(layer_type=RefPNALayer, args=dict(conv_args)),
        middle_conv_descr=dict(layer_type=RefPNALayer, args=dict(conv_args)),
        **opts)
    adj, x = random_graph(5)
    mod = GNN(
        nhid=NHID, nodes_out=3, graph_out=2, dropout=0.0,
        conv_layers='N/2' if variable else 3, fc_layers=2,
        first_conv=dict(layer_type=PNALayerDense, args=dict(conv_args)),
        middle_conv=dict(layer_type=PNALayerDense, args=dict(conv_args)),
        **opts)
    params, stats = port_gnn(ref, port_pna_layer_dense)
    check(mod, to_variables(params, stats), ref, x, adj, atol=1e-3,
          extract=lambda out: list(out))
