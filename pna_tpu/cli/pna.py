"""Multitask PNA training CLI — equivalent of
``multitask_benchmark/train/pna.py`` (first conv divide_input=False, middle
divide_input=True)."""

from pna_tpu.cli.common import build_arg_parser, execute_train
from pna_tpu.nn.dense import PNALayerDense


def main():
    parser = build_arg_parser()
    parser.add_argument('--self_loop', action='store_true', default=False)
    parser.add_argument('--aggregators', type=str,
                        default='mean max min std')
    parser.add_argument('--scalers', type=str,
                        default='identity amplification attenuation')
    parser.add_argument('--towers', type=int, default=4)
    parser.add_argument('--pretrans_layers', type=int, default=1)
    parser.add_argument('--posttrans_layers', type=int, default=1)
    args = parser.parse_args()

    def conv(divide_input):
        return dict(layer_type=PNALayerDense,
                    args=dict(aggregators=args.aggregators.split(),
                              scalers=args.scalers.split(), avg_d=None,
                              towers=args.towers, self_loop=args.self_loop,
                              divide_input=divide_input,
                              pretrans_layers=args.pretrans_layers,
                              posttrans_layers=args.posttrans_layers))

    execute_train(gnn_args=dict(first_conv=conv(False),
                                middle_conv=conv(True)), args=args)


if __name__ == '__main__':
    main()
