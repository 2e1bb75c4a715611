"""Epoch-time comparison of the batch layouts the real trainers can use
(VERDICT r2 weak item 2 / next-round item 7): degree-bucketed single-shape
batches (``derive_bucket_caps``) vs the per-batch-padded ELL layout.

Times full training epochs of ``PNANetMolecules`` (flagship ZINC config) on
synthetic ZINC via the actual ``RealworldTrainer.run_epoch`` path — the same
code the CLIs run — with ``bucket_by_degree`` on and off.  Epoch 1 includes
compilation (the bucketed layout compiles ONCE; the padded layout compiles
one program per distinct shape); steady state is epochs >= 2.

Writes RESULTS_epoch_layout.json.  Run on the real chip:
python benchmarks/epoch_layout.py [--graphs 2048 --epochs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(bucket: bool, n_graphs: int, epochs: int, batch_size: int):
    import jax
    import jax.numpy as jnp
    from pna_tpu.data.molecules import ZincDataset, batch_iterator
    from pna_tpu.nn.nets import PNANetMolecules
    from pna_tpu.train.realworld import PipelineConfig, RealworldTrainer

    ds = ZincDataset.synthetic(n_train=n_graphs, n_val=64, n_test=64, seed=0)
    cfg = PipelineConfig(epochs=epochs, batch_size=batch_size,
                         bucket_by_degree=bucket, metric='mae')
    model = PNANetMolecules(
        num_atom_type=ds.num_atom_type, num_bond_type=ds.num_bond_type,
        hidden_dim=70, out_dim=60, n_layers=4,
        aggregators=('mean', 'max', 'min', 'std'),
        scalers=('identity', 'amplification', 'attenuation'),
        avg_d=ds.avg_d(), readout_type='sum', towers=5,
        divide_input_first=False, divide_input_last=True,
        graph_norm=True, batch_norm=True, residual=True, edge_feat=True,
        edge_dim=50)
    tr = RealworldTrainer(
        model, PNANetMolecules.loss, cfg,
        forward_args=lambda g: (g, g.node_feats.squeeze(-1),
                                g.edge_feats.squeeze(-1)))
    if bucket:
        from pna_tpu.data.molecules import derive_bucket_caps
        tr._bucket_caps = derive_bucket_caps(
            ds.train + ds.val + ds.test, batch_size)
    g0, l0 = next(batch_iterator(ds.train, batch_size, 0, shuffle=False,
                                 bucket_caps=tr._bucket_caps))
    state = tr.init_state(g0, jnp.asarray(l0))
    times = []
    for ep in range(epochs):
        t0 = time.time()
        loss, _ = tr.run_epoch(state, ds.train, train=True, seed=ep)
        times.append(time.time() - t0)
    return dict(epoch_s=[round(t, 2) for t in times],
                steady_epoch_s=round(min(times[1:]), 2),
                first_epoch_s=round(times[0], 2),
                final_train_loss=round(float(loss), 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--graphs', type=int, default=2048)
    ap.add_argument('--epochs', type=int, default=4)
    ap.add_argument('--batch_size', type=int, default=128)
    ap.add_argument('--out', default=os.path.join(
        REPO, 'RESULTS_epoch_layout.json'))
    args = ap.parse_args()
    import jax
    res = dict(what=(
        'Training-epoch wall time of the flagship ZINC config through the '
        'REAL trainer path (RealworldTrainer.run_epoch) on synthetic ZINC, '
        f'{args.graphs} graphs, batch {args.batch_size}: degree-bucketed '
        'single-shape layout (one compiled step) vs per-batch padded layout '
        '(ELL aggregation, one compile per distinct shape). steady_epoch_s '
        'is the fastest post-compile epoch.'),
        device=str(jax.devices()[0]), graphs=args.graphs,
        batch_size=args.batch_size)
    for name, bucket in (('bucketed', True), ('padded_ell', False)):
        res[name] = run(bucket, args.graphs, args.epochs, args.batch_size)
        print(name, res[name], flush=True)
    s_b = res['bucketed']['steady_epoch_s']
    s_e = res['padded_ell']['steady_epoch_s']
    res['speedup_steady'] = round(s_e / s_b, 3)
    with open(args.out, 'w') as f:
        json.dump(res, f, indent=1)
    print('wrote', args.out, 'speedup', res['speedup_steady'])


if __name__ == '__main__':
    main()
