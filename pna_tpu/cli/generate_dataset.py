"""Multitask dataset generation CLI — equivalent of
``multitask_benchmark/datasets_generation/multitask_dataset.py:93-144``."""

import argparse

from pna_tpu.data.graph_generation import GraphType
from pna_tpu.data.multitask import (DEFAULT_GRAPH_LABELS, DEFAULT_NODE_LABELS,
                                    build_multitask_dataset)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', type=str, default='./data/multitask_dataset.pkl')
    p.add_argument('--seed', type=int, default=1234)
    p.add_argument('--graph_type', type=str, default='RANDOM')
    p.add_argument('--nodes_labels', nargs='+', default=DEFAULT_NODE_LABELS)
    p.add_argument('--graph_labels', nargs='+', default=DEFAULT_GRAPH_LABELS,
                   help='graph-label oracle names from '
                        'pna_tpu.data.graph_algorithms; the default '
                        'is_connected reproduces the reference\'s bipartite-'
                        'coloring bug (graph_algorithms.py:20-31) — pass '
                        'is_connected_exact for the true predicate')
    p.add_argument('--extrapolation', action='store_true', default=False)
    args = p.parse_args()

    build_multitask_dataset(
        out_path=args.out, seed=args.seed,
        graph_type=getattr(GraphType, args.graph_type),
        node_label_names=args.nodes_labels,
        graph_label_names=args.graph_labels,
        extrapolation=args.extrapolation)


if __name__ == '__main__':
    main()
