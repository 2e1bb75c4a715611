"""Multitask GAT CLI — equivalent of ``multitask_benchmark/train/gat.py``."""

from pna_tpu.cli.common import build_arg_parser, execute_train
from pna_tpu.nn.dense import GATLayerDense


def main():
    parser = build_arg_parser()
    parser.add_argument('--nheads', type=int, default=4)
    parser.add_argument('--alpha', type=float, default=0.2)
    args = parser.parse_args()
    conv = dict(layer_type=GATLayerDense,
                args=dict(nheads=args.nheads, alpha=args.alpha))
    execute_train(gnn_args=dict(first_conv=dict(conv), middle_conv=dict(conv)),
                  args=args)


if __name__ == '__main__':
    main()
