"""Ablation timing of the flagship train step: where do the milliseconds go?

Measures jitted wall time (30 iters, block_until_ready) of:
  fwd            forward loss only
  fwd_bwd        value_and_grad, no optimizer
  full           the bench train step (grad + Adam + BN mutation)
and model ablations (each a full train step):
  no_bn          batch_norm off
  no_gnorm       graph_norm off
  no_edge        edge features off (different param shapes)
  no_dropout     (dropout is already 0 in the bench config)
  agg1           single aggregator (mean) x single scaler

Usage: python benchmarks/ablate_step.py [--batch 1024] [--out FILE]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __import__('os').path.join(
    __import__('os').path.dirname(__import__('os').path.abspath(__file__)),
    '..'))


def time_call(fn, args, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def build(batch, **model_over):
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial
    from pna_tpu.data.molecules import ZincDataset, collate_records
    from pna_tpu.nn.nets import PNANetMolecules

    ds = ZincDataset.synthetic(n_train=batch, n_val=1, n_test=1, seed=0)
    graph, labels = collate_records(ds.train, with_snorm=True,
                                    bucket_by_degree=True)
    avg_d = ds.avg_d()
    kw = dict(num_atom_type=ds.num_atom_type, num_bond_type=ds.num_bond_type,
              n_layers=4, hidden_dim=70, out_dim=60, edge_dim=50,
              edge_feat=True, divide_input_first=True, divide_input_last=True,
              aggregators=('mean', 'max', 'min', 'std'),
              scalers=('identity', 'amplification', 'attenuation'),
              avg_d=avg_d, readout_type='sum', towers=5, graph_norm=True,
              batch_norm=True, residual=True,
              compute_dtype=jnp.bfloat16, kernel='auto',
              max_degree=int(__import__('numpy').asarray(graph.in_deg).max()))
    kw.update(model_over)
    model = PNANetMolecules(**kw)
    graph = jax.device_put(graph)
    edge_feat = kw['edge_feat']
    e_idx = graph.edge_feats.squeeze(-1) if edge_feat else None
    variables = jax.jit(partial(model.init, train=False))(
        {'params': jax.random.PRNGKey(0)}, graph,
        graph.node_feats.squeeze(-1), e_idx)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    labels_j = jnp.asarray(labels)

    def loss_fn(p, bs, graph, labels):
        out, mutated = model.apply(
            {'params': p, 'batch_stats': bs}, graph,
            graph.node_feats.squeeze(-1), e_idx, train=True,
            rngs={'dropout': jax.random.PRNGKey(0)},
            mutable=['batch_stats'])
        return PNANetMolecules.loss(out, labels, graph.graph_mask), \
            mutated['batch_stats']

    @jax.jit
    def fwd(p, bs, graph, labels):
        return loss_fn(p, bs, graph, labels)[0]

    @jax.jit
    def fwd_bwd(p, bs, graph, labels):
        (l, _), g = jax.value_and_grad(
            lambda p_: loss_fn(p_, bs, graph, labels), has_aux=True)(p)
        return l, g

    @jax.jit
    def full(p, bs, o, graph, labels):
        (l, ns), g = jax.value_and_grad(
            lambda p_: loss_fn(p_, bs, graph, labels), has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), ns, o, l

    return dict(fwd=(fwd, (params, batch_stats, graph, labels_j)),
                fwd_bwd=(fwd_bwd, (params, batch_stats, graph, labels_j)),
                full=(full, (params, batch_stats, opt_state, graph,
                             labels_j)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--out', default=None)
    ap.add_argument('--only', default=None,
                    help='comma list of measurements to run')
    args = ap.parse_args()
    res = {}
    want = set(args.only.split(',')) if args.only else None

    def run(name, builder_kw, which=('full',)):
        if want and name not in want:
            return
        b = build(args.batch, **builder_kw)
        for w in which:
            fn, a = b[w]
            key = name if w == 'full' else f'{name}:{w}'
            res[key] = round(time_call(fn, a, args.iters), 3)
            print(key, res[key], 'ms', flush=True)

    run('base', {}, which=('fwd', 'fwd_bwd', 'full'))
    run('no_bn', dict(batch_norm=False))
    run('no_gnorm', dict(graph_norm=False))
    run('no_edge', dict(edge_feat=False, edge_dim=0,
                        divide_input_first=False, hidden_dim=75, out_dim=70))
    run('agg1', dict(aggregators=('mean',), scalers=('identity',)))
    run('towers1', dict(towers=1))
    if args.out:
        json.dump(res, open(args.out, 'w'), indent=1)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
