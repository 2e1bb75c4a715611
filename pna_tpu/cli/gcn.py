"""Multitask GCN CLI — equivalent of ``multitask_benchmark/train/gcn.py``."""

from pna_tpu.cli.common import build_arg_parser, execute_train
from pna_tpu.nn.dense import GCNLayerDense


def main():
    args = build_arg_parser().parse_args()
    conv = dict(layer_type=GCNLayerDense, args=dict())
    execute_train(gnn_args=dict(first_conv=dict(conv), middle_conv=dict(conv)),
                  args=args)


if __name__ == '__main__':
    main()
