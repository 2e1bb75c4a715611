"""Shared CLI plumbing for the multitask benchmark — equivalent of
``multitask_benchmark/util/train.py:21-64`` (argparse flags) wired to the
TPU-native engine."""

from __future__ import annotations

import argparse

from pna_tpu.data.multitask import load_multitask_dataset
from pna_tpu.ops.scalers import avg_d_from_dense_adj
from pna_tpu.nn.gnn import GNN, VARIABLE_LAYERS_FUNCTIONS
from pna_tpu.train.engine import MultitaskTrainer, TrainConfig


def build_arg_parser() -> argparse.ArgumentParser:
    """Flags of multitask_benchmark/util/train.py:21-54 (CUDA flags replaced by
    TPU-native options)."""
    p = argparse.ArgumentParser()
    p.add_argument('--data', type=str, default='./data/multitask_dataset.pkl')
    p.add_argument('--only_nodes', action='store_true', default=False)
    p.add_argument('--only_graph', action='store_true', default=False)
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--epochs', type=int, default=10000)
    p.add_argument('--lr', type=float, default=0.003)
    p.add_argument('--weight_decay', type=float, default=1e-6)
    p.add_argument('--hidden', type=int, default=16)
    p.add_argument('--dropout', type=float, default=0.0)
    p.add_argument('--patience', type=int, default=1000)
    p.add_argument('--conv_layers', type=int, default=None)
    p.add_argument('--variable_conv_layers', type=str, default='N',
                   choices=sorted(VARIABLE_LAYERS_FUNCTIONS))
    p.add_argument('--fc_layers', type=int, default=3)
    p.add_argument('--loss', type=str, default='mse')
    p.add_argument('--print_every', type=int, default=50)
    p.add_argument('--final_activation', type=str, default='LeakyReLu')
    p.add_argument('--skip', action='store_true', default=False)
    p.add_argument('--gru', action='store_true', default=False)
    p.add_argument('--fixed', action='store_true', default=False)
    p.add_argument('--variable', action='store_true', default=False)
    p.add_argument('--data_parallel', action='store_true', default=False,
                   help='Shard bucket batches over all local devices.')
    p.add_argument('--checkpoint_dir', type=str, default=None,
                   help='directory for latest+best checkpoints (resume-able)')
    p.add_argument('--resume', action='store_true', default=False,
                   help='resume from checkpoint_dir/latest.ckpt')
    return p


def execute_train(gnn_args: dict, args) -> None:
    """Equivalent of multitask_benchmark/util/train.py:67-232."""
    data = load_multitask_dataset(args.data, print_baseline=True,
                                  loss=args.loss)

    needs_avg_d = ('avg_d' in gnn_args['first_conv'].get('args', {}) or
                   'avg_d' in gnn_args['middle_conv'].get('args', {}))
    if needs_avg_d:
        avg_d = avg_d_from_dense_adj(data['adj']['train'])
        for key in ('first_conv', 'middle_conv'):
            if 'avg_d' in gnn_args[key].get('args', {}):
                gnn_args[key]['args']['avg_d'] = avg_d

    if args.variable:
        assert args.conv_layers is None, \
            "If model is variable, use --variable_conv_layers"
        conv_layers = args.variable_conv_layers
    else:
        assert args.conv_layers is not None, "--conv_layers required"
        conv_layers = args.conv_layers

    model = GNN(
        nhid=args.hidden,
        nodes_out=data['node_labels']['train'][0].shape[-1],
        graph_out=data['graph_labels']['train'][0].shape[-1],
        dropout=args.dropout, conv_layers=conv_layers,
        fc_layers=args.fc_layers, final_activation=args.final_activation,
        skip=args.skip, gru=args.gru, fixed=args.fixed, variable=args.variable,
        **gnn_args)

    cfg = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                      epochs=args.epochs, patience=args.patience,
                      loss=args.loss, only_nodes=args.only_nodes,
                      only_graph=args.only_graph, seed=args.seed,
                      print_every=args.print_every,
                      data_parallel=args.data_parallel,
                      checkpoint_dir=args.checkpoint_dir,
                      resume=args.resume)
    trainer = MultitaskTrainer(model, data, cfg)
    state = trainer.fit()
    trainer.test(state)
