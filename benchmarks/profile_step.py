"""Profile the flagship ZINC train step on the real TPU and break the step
time down per HLO op (VERDICT r2 weak item 3: replace the byte-count
roofline *argument* with a profiler *measurement*).

Captures a ``jax.profiler`` trace of the bench harness's train step, parses
it with ``jax.profiler.ProfileData`` and aggregates device-side op events
into categories (aggregation reductions, gathers, matmuls/convs, elementwise
fusions, copies, infeed/outfeed).  Writes RESULTS_profile.json with the
per-category ms and the top-20 individual ops.

Usage (real TPU):  python benchmarks/profile_step.py [--kernel auto]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def categorize(name: str) -> str:
    n = name.lower()
    if 'all-to-all' in n or 'all-reduce' in n or 'collective' in n:
        return 'collective'
    if 'gather' in n:
        return 'gather'
    if 'scatter' in n:
        return 'scatter'
    if 'dot' in n or 'conv' in n or 'matmul' in n:
        return 'matmul'
    if 'reduce' in n:
        return 'reduce'
    if 'copy' in n or 'bitcast' in n or 'transpose' in n:
        return 'copy/layout'
    if 'fusion' in n:
        return 'fusion(elementwise)'
    if 'infeed' in n or 'outfeed' in n or 'transfer' in n:
        return 'transfer'
    return 'other'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--kernel', default='auto')
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--out', default=os.path.join(REPO,
                                                  'RESULTS_profile.json'))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_bench
    train_step, state, (graph, labels_j), n_edges, n_nodes, _ = build_bench(
        batch_graphs_n=args.batch, kernel=args.kernel,
        compute_dtype=jnp.bfloat16)
    params, batch_stats, opt_state = state
    for _ in range(2):   # compile + settle
        params, batch_stats, opt_state, l = train_step(
            params, batch_stats, opt_state, graph, labels_j)
    jax.block_until_ready(l)
    tdir = '/tmp/profile_step_trace'
    t0 = time.time()
    with jax.profiler.trace(tdir):
        for _ in range(args.steps):
            params, batch_stats, opt_state, l = train_step(
                params, batch_stats, opt_state, graph, labels_j)
        jax.block_until_ready(l)
    wall_ms = (time.time() - t0) / args.steps * 1e3

    from jax.profiler import ProfileData
    pb = sorted(glob.glob(tdir + '/**/*.xplane.pb', recursive=True))[-1]
    d = ProfileData.from_file(pb)
    per_op = defaultdict(float)
    lines_seen = []
    for pl in d.planes:
        if 'TPU' not in pl.name and 'tpu' not in pl.name.lower():
            continue
        for ln in pl.lines:
            lines_seen.append((pl.name, ln.name, len(list(ln.events))))
            if 'XLA Ops' not in ln.name and 'xla op' not in ln.name.lower():
                continue
            for e in ln.events:
                per_op[e.name] += (e.end_ns - e.start_ns) / 1e6
    if not per_op:   # fall back: aggregate every TPU plane line
        for pl in d.planes:
            if 'TPU' not in pl.name:
                continue
            for ln in pl.lines:
                for e in ln.events:
                    per_op[e.name] += (e.end_ns - e.start_ns) / 1e6

    cats = defaultdict(float)
    for name, ms in per_op.items():
        cats[categorize(name)] += ms / args.steps
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:20]
    result = dict(
        what=('Per-op device-time breakdown of the flagship ZINC bf16 train '
              'step (bench.py config), measured with jax.profiler on the '
              'real chip; ms are per step, averaged over the traced steps.'),
        kernel=args.kernel, batch=args.batch,
        wall_ms_per_step=round(wall_ms, 2),
        device_ms_by_category={k: round(v, 3) for k, v in
                               sorted(cats.items(), key=lambda kv: -kv[1])},
        top_ops_ms=[{ 'op': n, 'ms_per_step': round(ms / args.steps, 3)}
                    for n, ms in top],
        trace_lines=[f'{p} | {l} ({c} events)' for p, l, c in
                     lines_seen[:12]],
    )
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result['device_ms_by_category'], indent=1))
    print('wall_ms_per_step', result['wall_ms_per_step'])
    print('wrote', args.out)


if __name__ == '__main__':
    main()
