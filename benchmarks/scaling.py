"""Scaling-efficiency benchmark (BASELINE.json config 5).

Measures edges/sec of the distributed fused PNA aggregation (halo exchange +
segment bank) on a synthetic power-law graph, partitioned over 1..P devices,
and reports scaling efficiency vs the 1-device run.

On the CI machine there is one real TPU chip; multi-device scaling runs on a
virtual CPU mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count),
which validates the communication structure and load balance.  On a real pod
slice the same code path measures ICI scaling — the partition/halo machinery
is device-count agnostic.

Usage:
  python benchmarks/scaling.py --nodes 200000 --edges 2000000 --feat 64
  # multi-device CPU run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/scaling.py --parts 1 2 4 8
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_parts(num_nodes, num_edges, feat, parts, iters=10, seed=0,
                reorder='locality'):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pna_tpu.parallel.partition import (make_distributed_aggregate,
                                            partition_edges, powerlaw_graph)

    send, recv = powerlaw_graph(num_nodes, num_edges, seed=seed)
    results = {}
    for p in parts:
        if len(jax.devices()) < p:
            print(f"[skip] parts={p}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        t_part = time.perf_counter()
        part = partition_edges(send, recv, num_nodes, p, reorder=reorder)
        t_part = time.perf_counter() - t_part
        # total halo volume = distinct (sender, dst part) pairs shipped
        halo_total = int(part.send_mask.sum())
        halo_raw = int(partition_edges(send, recv, num_nodes, p,
                                       reorder=None).send_mask.sum())
        mesh = Mesh(np.asarray(jax.devices()[:p]), ('graph',))
        agg = make_distributed_aggregate(part, mesh)
        feats_np = np.random.RandomState(0).randn(
            num_nodes, feat).astype(np.float32)
        feats = jax.device_put(jnp.asarray(part.scatter_features(feats_np)),
                               NamedSharding(mesh, P('graph')))
        out = agg(feats)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = agg(feats)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        eps = num_edges / dt
        results[p] = dict(edges_per_sec=eps, step_ms=dt * 1e3,
                          partition_s=t_part, halo=part.halo_size,
                          halo_total=halo_total, halo_total_raw_order=halo_raw,
                          halo_fraction=halo_total / max(
                              p * part.nodes_per_part, 1),
                          edges_per_part=part.edges_per_part)
        print(f"parts={p}: {eps:,.0f} edges/s  step={dt*1e3:.2f}ms  "
              f"halo_total={halo_total} (raw order {halo_raw})  "
              f"partition_build={t_part:.2f}s", file=sys.stderr)
    if 1 in results:
        base = results[1]['edges_per_sec']
        for p, r in results.items():
            r['scaling_efficiency'] = r['edges_per_sec'] / (base * p)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nodes', type=int, default=100_000)
    ap.add_argument('--edges', type=int, default=1_000_000)
    ap.add_argument('--feat', type=int, default=64)
    ap.add_argument('--parts', type=int, nargs='+', default=[1, 2, 4, 8])
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--reorder', default='locality',
                    choices=['locality', 'none'])
    args = ap.parse_args()
    results = bench_parts(args.nodes, args.edges, args.feat, args.parts,
                          args.iters,
                          reorder=None if args.reorder == 'none'
                          else args.reorder)
    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == '__main__':
    main()
