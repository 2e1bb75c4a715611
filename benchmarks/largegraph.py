"""Hardware-measured large-graph point (VERDICT r2 item 4): the largest
single-chip-feasible power-law config through ``PNALayerFused`` on the real
TPU, one full train step (fwd+bwd+adam) per aggregation backend.

Two in-degree regimes of the same edge count:

* ``uniform_in``  — receivers uniform (senders power-law): short segments,
  max in-degree ~40.  ELL and bucketed layouts are feasible.
* ``skewed_in``   — receivers power-law: hub nodes with 10^4-10^5 in-edges.
  ELL is infeasible (the [N, D_max] table would be ~TBs); bucketing pads the
  tail classes heavily; this is the sorted-edge Pallas kernel's design case.

Writes RESULTS_largegraph.json: edges/sec per backend per regime, plus the
layout-build costs.  Run on the real chip:  python benchmarks/largegraph.py
[--nodes 1000000 --deg 10 --feat 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_inputs(num_nodes, num_edges, skewed_in, seed=0):
    from pna_tpu.parallel.partition import powerlaw_graph
    send, recv = powerlaw_graph(num_nodes, num_edges, seed=seed)
    if skewed_in:
        send, recv = recv, send
    return send.astype(np.int32), recv.astype(np.int32)


def make_graph(send, recv, num_nodes, feat, kernel, seed=0):
    """Build the Graph in the layout the backend needs; returns
    (graph, layout_build_seconds) or (None, reason).

    ``kernel='auto'`` resolves through ``pna_tpu.ops.layout.choose_layout``
    — the codified decision boundary this benchmark's own measurements
    define; the resolved backend is returned as a third element."""
    from pna_tpu.graph import batch_graphs
    rng = np.random.RandomState(seed)
    feats = rng.randn(num_nodes, feat).astype(np.float32)
    rec = dict(node_feats=feats, senders=send, receivers=recv)
    t0 = time.time()
    if kernel == 'auto':
        from pna_tpu.ops.layout import choose_layout
        choice = choose_layout(send, recv, num_nodes, feat)
        print(f"choose_layout -> {choice.kernel}: {choice.reason}",
              flush=True)
        kernel = choice.kernel
    deg = np.bincount(recv, minlength=num_nodes)
    if kernel == 'ell' and deg.max() > 256:
        return None, f"infeasible: max in-degree {int(deg.max())} -> " \
                     f"[N, D_max] table {num_nodes * int(deg.max()) * 4 / 2**30:.0f} GiB", kernel
    g = batch_graphs(
        [rec],
        with_ell=(kernel == 'ell'),
        ell_max_degree=None if kernel == 'ell' else 0,
        sort_edges=True,
        bucket_by_degree=(kernel == 'bucketed'),
        bucket_max_buckets=8)
    return g, time.time() - t0, kernel


def bench_backend(g, kernel, feat, towers, max_degree, n_steps=10):
    import jax
    import jax.numpy as jnp
    import optax
    from pna_tpu.nn.fused import PNALayerFused

    layer = PNALayerFused(
        out_dim=feat, aggregators=('mean', 'max', 'min', 'std'),
        scalers=('identity', 'amplification', 'attenuation'),
        avg_d={'lin': 10.0, 'log': 2.0}, towers=towers, divide_input=True,
        batch_norm=False, residual=True, compute_dtype=jnp.bfloat16,
        kernel=kernel, max_degree=max_degree)
    h = jnp.asarray(np.asarray(g.node_feats), jnp.float32)
    # the graph MUST be a jit argument, not a closure: closed-over arrays
    # become compile-time constants and the 5M-edge index tables blow up the
    # remote compile helper (exit code 1 — the round-3/4 'pending' cells)
    g = jax.device_put(g)
    variables = layer.init({'params': jax.random.PRNGKey(0)}, g, h,
                           train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables['params'])

    @jax.jit
    def step(params, opt_state, g, h):
        def loss_fn(p):
            out = layer.apply({'params': p}, g, h, train=False)
            return jnp.mean(out * out)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables['params']
    t_c0 = time.time()
    params, opt_state, loss = step(params, opt_state, g, h)
    jax.block_until_ready(loss)
    compile_s = time.time() - t_c0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, g, h)
        # block on the FULL output tree every step: through the axon tunnel
        # a bare block on the scalar loss returned early and under-measured
        # (the bogus 0.12 ms pallas cell this fixed)
        jax.block_until_ready((params, opt_state, loss))
    step_ms = (time.perf_counter() - t0) / n_steps * 1e3
    return step_ms, compile_s, float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nodes', type=int, default=1_000_000)
    ap.add_argument('--deg', type=int, default=10)
    ap.add_argument('--feat', type=int, default=64)
    ap.add_argument('--towers', type=int, default=4)
    ap.add_argument('--backends', nargs='+',
                    default=['bucketed', 'ell', 'pallas', 'generic'])
    ap.add_argument('--regimes', nargs='+',
                    default=['uniform_in', 'skewed_in'])
    ap.add_argument('--out', default=os.path.join(REPO,
                                                  'RESULTS_largegraph.json'))
    args = ap.parse_args()
    num_edges = args.nodes * args.deg

    import jax
    results = dict(what=(
        'Full train step (fwd+bwd+adam, bf16 compute) of one PNALayerFused '
        f'(towers={args.towers}, mean/max/min/std x id/amp/att) on a '
        f'{args.nodes:,}-node / {num_edges:,}-edge power-law graph, real '
        'TPU, per aggregation backend. uniform_in: receivers uniform; '
        'skewed_in: receivers power-law (hub in-degrees, the Pallas sorted-'
        'edge kernel design case; ELL infeasible there).'),
        device=str(jax.devices()[0]), nodes=args.nodes, edges=num_edges,
        feat=args.feat, towers=args.towers)
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = json.load(f)
        for k, v in old.items():   # preserve every previously measured cell
            if k not in results:   # incl. string fields like notes/timing
                results[k] = v

    for regime in args.regimes:
        send, recv = build_inputs(args.nodes, num_edges,
                                  regime == 'skewed_in')
        deg = np.bincount(recv, minlength=args.nodes)
        max_deg = int(deg.max())
        entry = results.get(regime, {})
        entry['max_in_degree'] = max_deg
        for kernel in args.backends:
            print(f'--- {regime} / {kernel}', flush=True)
            try:
                g, build, resolved = make_graph(send, recv, args.nodes,
                                                args.feat, kernel)
                if g is None:
                    entry[kernel] = dict(status=build)
                    print(kernel, build, flush=True)
                    continue
                pad_ratio = float(g.senders.shape[0]) / num_edges
                step_ms, compile_s, loss = bench_backend(
                    g, resolved, args.feat, args.towers,
                    max_degree=max_deg if resolved == 'pallas' else 0)
                entry[kernel] = dict(
                    step_ms=round(step_ms, 2),
                    edges_per_sec=round(num_edges / (step_ms / 1e3)),
                    layout_build_s=round(build, 2),
                    compile_s=round(compile_s, 1),
                    edge_pad_ratio=round(pad_ratio, 3),
                    loss=loss,
                    **({'resolved_kernel': resolved}
                       if kernel == 'auto' else {}))
                print(kernel, entry[kernel], flush=True)
            except Exception as exc:  # OOM etc. — record honestly
                entry[kernel] = dict(status=f'failed: {type(exc).__name__}: '
                                            f'{str(exc)[:300]}')
                print(kernel, entry[kernel], flush=True)
            results[regime] = entry
            with open(args.out, 'w') as f:
                json.dump(results, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
