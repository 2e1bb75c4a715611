"""End-to-end integration: tiny multitask dataset -> short PNA training run
must beat the mean-predictor baseline (SURVEY §4: integration ring)."""

import numpy as np
import pytest

from pna_tpu.data.graph_generation import GraphType
from pna_tpu.data.multitask import build_multitask_dataset, make_label_getters
from pna_tpu.nn.dense import PNALayerDense
from pna_tpu.nn.gnn import GNN
from pna_tpu.ops.scalers import avg_d_from_dense_adj
from pna_tpu.train.engine import MultitaskTrainer, TrainConfig


@pytest.fixture(scope="module")
def tiny_dataset():
    return build_multitask_dataset(
        seed=7, graph_type=GraphType.RANDOM,
        n_graphs={'train': [32, 32], 'val': [16], 'default': [16]},
        sizes={'train': [8, 10], 'val': [9], 'test': [9]},
        verbose=False)


def test_engine_beats_baseline(tiny_dataset):
    data = tiny_dataset
    avg_d = avg_d_from_dense_adj(data['adj']['train'])
    conv_args = dict(aggregators=['mean', 'max', 'min', 'std'],
                     scalers=['identity', 'amplification', 'attenuation'],
                     avg_d=avg_d, towers=1, divide_input=False)
    model = GNN(nhid=16, nodes_out=data['node_labels']['train'][0].shape[-1],
                graph_out=data['graph_labels']['train'][0].shape[-1],
                dropout=0.0, conv_layers=2, fc_layers=2,
                first_conv=dict(layer_type=PNALayerDense, args=conv_args),
                middle_conv=dict(layer_type=PNALayerDense, args=conv_args))
    cfg = TrainConfig(lr=0.01, epochs=60, patience=60, print_every=20)
    trainer = MultitaskTrainer(model, data, cfg)
    state = trainer.fit()

    # mean-predictor baseline on test
    nl = data['node_labels']
    gl = data['graph_labels']
    mean_node = np.mean(np.stack([x.mean(axis=(0, 1)) for x in nl['train']]), 0)
    mean_graph = np.mean(np.stack([x.mean(axis=0) for x in gl['train']]), 0)
    base_n = np.mean([(x - mean_node) ** 2 for x in nl['test']][0])
    base_g = np.mean([(x - mean_graph) ** 2 for x in gl['test']][0])
    n_n = nl['test'][0].shape[-1]
    n_g = gl['test'][0].shape[-1]
    baseline = (base_n * n_n + base_g * n_g) / (n_n + n_g)

    test_loss, _ = trainer.evaluate(state, 'test')
    print("test loss", test_loss, "baseline", baseline)
    assert test_loss < baseline


def test_engine_gru_skip_variants(tiny_dataset):
    """Training smoke test for skip/gru/fixed structural options."""
    data = tiny_dataset
    avg_d = avg_d_from_dense_adj(data['adj']['train'])
    conv_args = dict(aggregators=['mean', 'max'], scalers=['identity'],
                     avg_d=avg_d, towers=1, divide_input=False)
    for opts in (dict(skip=True), dict(gru=True),
                 dict(variable=True, fixed=True)):
        model = GNN(nhid=8, nodes_out=data['node_labels']['train'][0].shape[-1],
                    graph_out=data['graph_labels']['train'][0].shape[-1],
                    dropout=0.1,
                    conv_layers='N/2' if opts.get('variable') else 2,
                    fc_layers=2,
                    first_conv=dict(layer_type=PNALayerDense, args=conv_args),
                    middle_conv=dict(layer_type=PNALayerDense, args=conv_args),
                    **opts)
        cfg = TrainConfig(lr=0.01, epochs=3, patience=10, print_every=10)
        trainer = MultitaskTrainer(model, data, cfg)
        state = trainer.fit()
        assert np.isfinite(state['best_val'])
