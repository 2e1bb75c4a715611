"""Multitask GIN CLI — equivalent of ``multitask_benchmark/train/gin.py``."""

from pna_tpu.cli.common import build_arg_parser, execute_train
from pna_tpu.nn.dense import GINLayerDense


def main():
    parser = build_arg_parser()
    parser.add_argument('--gin_fc_layers', type=int, default=2)
    args = parser.parse_args()
    conv = dict(layer_type=GINLayerDense,
                args=dict(fc_layers=args.gin_fc_layers))
    execute_train(gnn_args=dict(first_conv=dict(conv), middle_conv=dict(conv)),
                  args=args)


if __name__ == '__main__':
    main()
