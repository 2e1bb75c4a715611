"""CLI: distributed large-graph training over a ('data', 'graph') mesh.

The distributed counterpart of the multitask/realworld trainers (reference
training engine: /root/reference/multitask_benchmark/util/train.py:67-232,
which is single-device; the reference has no distributed path at all —
SURVEY §2.5).  Trains the flagship PNA stack with a node-level objective on
one edge-partitioned synthetic graph, with JSONL curves, checkpoint/resume
and a val split.

Examples
--------
# 8-way graph-parallel on the virtual CPU mesh, 100 steps:
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
python -m pna_tpu.cli.train_largegraph --nodes 100000 --edges 1000000 \
    --d_graph 8 --steps 100 --kernel bucketed --log runs/lg.jsonl

# skew-surviving Pallas backend (receiver-sorted layout per part):
python -m pna_tpu.cli.train_largegraph --kernel pallas --graph powerlaw
"""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--nodes', type=int, default=100_000)
    p.add_argument('--edges', type=int, default=1_000_000)
    p.add_argument('--graph', default='powerlaw',
                   choices=['powerlaw', 'uniform'])
    p.add_argument('--exponent', type=float, default=1.5)
    p.add_argument('--feat_dim', type=int, default=8)
    p.add_argument('--edge_feat_dim', type=int, default=0)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--d_data', type=int, default=1)
    p.add_argument('--d_graph', type=int, default=8)
    p.add_argument('--kernel', default='auto',
                   choices=['auto', 'bucketed', 'generic', 'pallas',
                            'pallas_fused'])
    p.add_argument('--hidden_dim', type=int, default=64)
    p.add_argument('--out_dim', type=int, default=64)
    p.add_argument('--n_layers', type=int, default=4)
    p.add_argument('--towers', type=int, default=4)
    p.add_argument('--aggregators', default='mean max min std')
    p.add_argument('--scalers', default='identity amplification attenuation')
    p.add_argument('--no_batch_norm', action='store_true')
    p.add_argument('--steps', type=int, default=100)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--weight_decay', type=float, default=0.0)
    p.add_argument('--val_frac', type=float, default=0.1)
    p.add_argument('--eval_every', type=int, default=10)
    p.add_argument('--ckpt_every', type=int, default=25)
    p.add_argument('--patience', type=int, default=0)
    p.add_argument('--log', default=None, help='JSONL curve path')
    p.add_argument('--ckpt_dir', default=None)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--max_degree', type=int, default=0)
    p.add_argument('--pallas_interpret', action='store_true',
                   help='run the Pallas kernel interpreted (CPU mesh)')
    return p


def main(argv=None):
    import jax
    from pna_tpu.train.largegraph import LargeGraphConfig, train_largegraph
    args = build_parser().parse_args(argv)
    interpret = args.pallas_interpret or (
        args.kernel in ('pallas', 'pallas_fused')
        and jax.default_backend() != 'tpu')
    cfg = LargeGraphConfig(
        num_nodes=args.nodes, num_edges=args.edges, graph_kind=args.graph,
        exponent=args.exponent, feat_dim=args.feat_dim,
        edge_feat_dim=args.edge_feat_dim, seed=args.seed,
        d_data=args.d_data, d_graph=args.d_graph, kernel=args.kernel,
        hidden_dim=args.hidden_dim, out_dim=args.out_dim,
        n_layers=args.n_layers, towers=args.towers,
        aggregators=tuple(args.aggregators.split()),
        scalers=tuple(args.scalers.split()),
        batch_norm=not args.no_batch_norm, steps=args.steps, lr=args.lr,
        weight_decay=args.weight_decay, val_frac=args.val_frac,
        eval_every=args.eval_every, ckpt_every=args.ckpt_every,
        patience=args.patience, log_path=args.log, ckpt_dir=args.ckpt_dir,
        resume=args.resume, max_degree=args.max_degree,
        pallas_interpret=interpret)
    _, _, history = train_largegraph(cfg)
    first = history[0]['train_loss'] if history else float('nan')
    last = history[-1] if history else {}
    print(json.dumps({'steps_run': len(history), 'first_train_loss': first,
                      'final': last}))


if __name__ == '__main__':
    main()
