"""Benchmark harness — prints ONE JSON line with the headline metric:
edges/sec/chip of a full PNA training step in the reference's headline ZINC
configuration (edge features ON — the 0.188-MAE recipe of
realworld_benchmark/README.md:62: L=4, hidden 70, out 60, edge_dim 50,
towers 5, mean/max/min/std x identity/amplification/attenuation, graph- and
batch-norm, residual), measured compute-bound (1024-graph batch) in bf16
with f32 accumulation.

"edges/sec" counts message-layer traversals: real_edges x n_layers / step
time — the throughput of the aggregation kernel the framework exists for.

Alongside the headline the JSON carries a ``detail`` dict with both dtypes'
step time, XLA-counted FLOPs per step (exact) and bytes per step (an upper
bound — XLA counts fused intermediates), an MXU utilization from the flop
count, and the byte-bound roofline: when ``bw_bound_frac`` is ~1 the step is
running at the HBM roofline of the XLA byte bound (measured on v5e: the
bound alone implies more time than the step takes, i.e. the true traffic is
below the bound and the kernel is bandwidth-saturated).

The reference publishes no throughput numbers (BASELINE.md: "published": {});
``vs_baseline`` is therefore reported relative to the first value this
harness ever recorded on TPU (benchmarks/baseline_value.json, round 1:
1.58M edges/s on the no-edge-feat f32 latency-bound config — the honest
reading of vs_baseline is "self-improvement of the framework's fast path").

Flags: --kernel {auto,bucketed,ell,pallas,generic} picks the aggregation
backend (pna_tpu/nn/fused.py), --batch scales the graph batch, --dtype
restricts measurement to one dtype.  The optimizer runs as ONE fused Adam
over a flattened param vector by default (--no_flat_opt for per-tensor
updates); step args are donated; --remat and --max_buckets expose the
measured-and-rejected experiment knobs (RESULTS_byteaudit.json).
"""

import argparse
import json
import os
import time
from functools import partial

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_value.json")

# per-chip peak dense-matmul FLOP/s (bf16, f32 accumulate) and HBM bytes/s
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
    "TPU v3": (123e12, 900e9),
    "TPU v2": (45e12, 700e9),
}

N_LAYERS = 4


def build_bench(batch_graphs_n=1024, seed=0, edge_feat=True,
                compute_dtype=None, kernel="auto", max_buckets=4,
                flat_opt=False, remat=False, hidden_dim=None, out_dim=None,
                edge_dim=None, towers=5):
    import jax
    import jax.numpy as jnp
    import optax
    from pna_tpu.data.molecules import ZincDataset, collate_records
    from pna_tpu.nn.nets import PNANetMolecules

    ds = ZincDataset.synthetic(n_train=batch_graphs_n, n_val=1, n_test=1,
                               seed=seed)
    # layout per backend: the degree-bucketed static layout (gather/scatter-
    # free) for auto/bucketed; receiver-sorted edges (CSR edge_ptr) for the
    # Pallas moment-sketch kernel and the ELL/generic paths.
    bucket = kernel in ("auto", "bucketed")
    graph, labels = collate_records(ds.train, with_snorm=True,
                                    bucket_by_degree=bucket,
                                    bucket_max_buckets=max_buckets)
    avg_d = ds.avg_d()
    n_edges = int(np.asarray(graph.edge_mask).sum())
    n_nodes = int(np.asarray(graph.node_mask).sum())
    max_deg = int(np.asarray(graph.in_deg).max()) if graph.in_deg is not None \
        else 32

    if edge_feat:
        # reference headline ZINC recipe (README.md:62): 0.188 +/- 0.004 MAE
        net_kw = dict(hidden_dim=70, out_dim=60, edge_dim=50, edge_feat=True,
                      divide_input_first=True, divide_input_last=True)
    else:
        # no-edge-feat recipe (README.md:61): 0.320 MAE
        net_kw = dict(hidden_dim=75, out_dim=70, edge_dim=0, edge_feat=False,
                      divide_input_first=False, divide_input_last=True)
    # lane-padding experiment overrides (NOT the reference recipe — a bench
    # datapoint quantifying what 128-lane-aligned feature dims buy vs the
    # sub-lane-width 70/60/50 layout churn, VERDICT r4 item 6)
    if hidden_dim is not None:
        net_kw['hidden_dim'] = hidden_dim
    if out_dim is not None:
        net_kw['out_dim'] = out_dim
    if edge_dim is not None:
        net_kw['edge_dim'] = edge_dim

    model = PNANetMolecules(
        num_atom_type=ds.num_atom_type, num_bond_type=ds.num_bond_type,
        n_layers=N_LAYERS,
        aggregators=('mean', 'max', 'min', 'std'),
        scalers=('identity', 'amplification', 'attenuation'),
        avg_d=avg_d, readout_type='sum', towers=towers,
        graph_norm=True, batch_norm=True, residual=True,
        compute_dtype=compute_dtype, kernel=kernel, max_degree=max_deg,
        remat=remat, **net_kw)

    # materialize the batch on device once — the step must not re-upload
    # host arrays through the transfer path every iteration
    graph = jax.device_put(graph)

    rng = jax.random.PRNGKey(0)
    e_idx = graph.edge_feats.squeeze(-1) if edge_feat else None
    # jit the init: eagerly it dispatches thousands of ops one-by-one
    # through the device tunnel (~minutes); jitted it is one program
    variables = jax.jit(partial(model.init, train=False))(
        {'params': rng}, graph, graph.node_feats.squeeze(-1), e_idx)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx = optax.adam(1e-3)
    if flat_opt:
        # one fused Adam over a single flattened vector instead of ~100
        # per-tensor updates (cuts hundreds of small ops from the step)
        tx = optax.flatten(tx)
    opt_state = tx.init(params)
    labels_j = jnp.asarray(labels)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, graph, labels):
        def loss_fn(p):
            out, mutated = model.apply(
                {'params': p, 'batch_stats': batch_stats}, graph,
                graph.node_feats.squeeze(-1),
                graph.edge_feats.squeeze(-1) if edge_feat else None,
                train=True,
                rngs={'dropout': jax.random.PRNGKey(0)},
                mutable=['batch_stats'])
            l = PNANetMolecules.loss(out, labels, graph.graph_mask)
            return l, mutated['batch_stats']

        (l, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, l

    state = (params, batch_stats, opt_state)
    args = (params, batch_stats, opt_state, graph, labels_j)
    return train_step, state, (graph, labels_j), n_edges, n_nodes, args


class BenchRunner:
    """One compiled train-step executable plus its carried state.

    Exposes ``time_block(n)`` so the caller can interleave timing blocks of
    different configs (dtypes) and take per-config minima — the defense
    against machine-state drift (tunnel contention, clock state) that made
    single-shot measurements vary by >30% between runs (VERDICT r4 weak #1).
    """

    def __init__(self, batch, edge_feat, compute_dtype, kernel,
                 max_buckets=4, flat_opt=False, remat=False,
                 hidden_dim=None, out_dim=None, edge_dim=None, towers=5):
        import jax
        train_step, state, dev_batch, n_edges, n_nodes, args = build_bench(
            batch_graphs_n=batch, edge_feat=edge_feat,
            compute_dtype=compute_dtype, kernel=kernel,
            max_buckets=max_buckets, flat_opt=flat_opt, remat=remat,
            hidden_dim=hidden_dim, out_dim=out_dim, edge_dim=edge_dim,
            towers=towers)
        # compile ONCE (AOT); reuse the executable for cost analysis + timing
        self.compiled = train_step.lower(*args).compile()
        self.flops, self.hbm_bytes = 0.0, 0.0
        try:
            ca = self.compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            self.flops = float(ca.get("flops", 0.0))
            self.hbm_bytes = float(ca.get("bytes accessed", 0.0))
        except Exception:
            pass
        self.graph, self.labels = dev_batch
        self.params, self.batch_stats, self.opt_state = state
        self.n_edges, self.n_nodes = n_edges, n_nodes
        self._jax = jax

    def _run(self, n):
        p, bs, os_, g, lb = (self.params, self.batch_stats, self.opt_state,
                             self.graph, self.labels)
        l = None
        for _ in range(n):
            p, bs, os_, l = self.compiled(p, bs, os_, g, lb)
        self._jax.block_until_ready(l)
        self.params, self.batch_stats, self.opt_state = p, bs, os_

    def warmup(self, n=5):
        self._run(n)

    def time_block(self, n):
        t0 = time.perf_counter()
        self._run(n)
        return (time.perf_counter() - t0) / n


def run_config(batch, edge_feat, compute_dtype, kernel, n_iters,
               max_buckets=4, flat_opt=False, remat=False):
    """Single-config path (kept for scripts importing run_config)."""
    r = BenchRunner(batch, edge_feat, compute_dtype, kernel,
                    max_buckets=max_buckets, flat_opt=flat_opt, remat=remat)
    r.warmup(5)
    blocks = [r.time_block(max(1, n_iters // 3)) for _ in range(3)]
    dt = min(blocks)
    return dict(step_ms=dt * 1e3, n_edges=r.n_edges, n_nodes=r.n_nodes,
                edges_per_sec=r.n_edges * N_LAYERS / dt,
                flops_per_step=r.flops, hbm_bytes_per_step=r.hbm_bytes,
                dt=dt, block_ms=[b * 1e3 for b in blocks])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--kernel", default="auto",
                    choices=["auto", "bucketed", "ell", "pallas",
                             "pallas_fused", "generic"])
    ap.add_argument("--dtype", default="both", choices=["both", "f32", "bf16"])
    ap.add_argument("--no_edge_feat", action="store_true")
    # lane-padding experiment (VERDICT r4 item 6): e.g. --hidden_dim 128
    # --out_dim 128 --edge_dim 128 measures what 128-lane-aligned feature
    # dims buy; NOT the reference recipe, reported separately
    ap.add_argument("--hidden_dim", type=int, default=None)
    ap.add_argument("--towers", type=int, default=5)
    ap.add_argument("--out_dim", type=int, default=None)
    ap.add_argument("--edge_dim", type=int, default=None)
    # block size matters: switching between two compiled executables through
    # the axon tunnel costs ~25-30 ms, so blocks must be >=40 iterations for
    # the switch cost to vanish in the block mean (measured 2026-08-21:
    # 6-iter blocks inflate the step 9.3 -> 13.1 ms; 40-iter blocks read
    # 9.08 ms with 0.1 ms spread)
    ap.add_argument("--iters", type=int, default=120,
                    help="total timed iterations per dtype (split into "
                         "--repeats interleaved blocks)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="interleaved timing blocks per dtype; the reported "
                         "time is the MIN block mean")
    ap.add_argument("--warmup", type=int, default=8,
                    help="warmup iterations per dtype before timing")
    ap.add_argument("--max_buckets", type=int, default=4)
    # fused Adam over one flattened param vector: cuts ~300 small per-tensor
    # update ops from the step (measured 9.55 -> 9.34 ms on v5e); default on
    ap.add_argument("--no_flat_opt", dest="flat_opt", action="store_false")
    ap.set_defaults(flat_opt=True)
    # per-layer rematerialization: measured SLOWER on the flagship config
    # (11.1 vs 9.3 ms — recompute cost exceeds residual-load savings on a
    # step that is not memory-capacity-bound); kept for large-graph configs
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw = PEAKS.get(kind, (197e12, 819e9))
    edge_feat = not args.no_edge_feat

    overrides = {k: v for k, v in (("hidden_dim", args.hidden_dim),
                                   ("out_dim", args.out_dim),
                                   ("edge_dim", args.edge_dim))
                 if v is not None}
    detail = {"device": kind, "batch_graphs": args.batch,
              "kernel": args.kernel, "edge_feat": edge_feat,
              **({"dim_overrides": overrides} if overrides else {}),
              "config": "ZINC headline (L=4, hidden 70, out 60, edge_dim 50,"
                        " towers 5)" if edge_feat else
                        "ZINC no-edge-feat (L=4, hidden 75, out 70, towers 5)"}
    # Build every requested dtype's executable up front, warm each, then
    # INTERLEAVE timing blocks (f32, bf16, f32, bf16, ...) taking the
    # per-dtype minimum block mean.  A machine-state glitch (tunnel
    # contention, clock dip) then hits all dtypes alike instead of biasing
    # whichever happened to run last, and the min discards it entirely.
    configs = [(name, cdt) for name, cdt in (("f32", None),
                                             ("bf16", jnp.bfloat16))
               if args.dtype in ("both", name)]
    runners = {}
    for name, cdt in configs:
        runners[name] = BenchRunner(
            args.batch, edge_feat, cdt, args.kernel,
            max_buckets=args.max_buckets, flat_opt=args.flat_opt,
            remat=args.remat, hidden_dim=args.hidden_dim,
            out_dim=args.out_dim, edge_dim=args.edge_dim, towers=args.towers)
        runners[name].warmup(args.warmup)
    block_n = max(1, args.iters // args.repeats)
    blocks = {name: [] for name, _ in configs}
    for _ in range(args.repeats):
        for name, _ in configs:
            blocks[name].append(runners[name].time_block(block_n))

    results = {}
    for name, _ in configs:
        runner = runners[name]
        dt = min(blocks[name])
        r = dict(step_ms=dt * 1e3, n_edges=runner.n_edges,
                 n_nodes=runner.n_nodes,
                 edges_per_sec=runner.n_edges * N_LAYERS / dt,
                 flops_per_step=runner.flops,
                 hbm_bytes_per_step=runner.hbm_bytes, dt=dt)
        entry = {"step_ms": round(r["step_ms"], 3),
                 "edges_per_sec": round(r["edges_per_sec"], 1),
                 "block_ms": [round(b * 1e3, 3) for b in blocks[name]],
                 "spread_ms": round(
                     (max(blocks[name]) - min(blocks[name])) * 1e3, 3)}
        if r["flops_per_step"]:
            # XLA cost analysis counts every op's operand bytes, including
            # fused intermediates that never reach HBM — so its byte count is
            # an UPPER BOUND on real traffic.  When that bound alone implies
            # a step time above the measured one, the kernel is running at
            # (or beyond) the bound's roofline: report the bound, the
            # bandwidth-implied ceiling on real traffic (peak_bw * step), and
            # an MFU from the (exact) flop count.
            bw_bound_ms = r["hbm_bytes_per_step"] / peak_bw * 1e3
            entry.update({
                "tflops_per_step": round(r["flops_per_step"] / 1e12, 4),
                "mxu_util": round(
                    r["flops_per_step"] / r["dt"] / peak_flops, 4),
                "xla_bytes_gb_upper_bound": round(
                    r["hbm_bytes_per_step"] / 1e9, 4),
                "xla_bytes_roofline_ms": round(bw_bound_ms, 3),
                "real_bytes_ceiling_gb": round(peak_bw * r["dt"] / 1e9, 4),
                "bw_bound_frac": round(
                    min(bw_bound_ms / r["step_ms"], 1.0), 4),
            })
        results[name] = entry
        detail["n_edges"] = r["n_edges"]
        detail["n_nodes"] = r["n_nodes"]
    detail["results"] = results

    head = results.get("bf16") or results["f32"]
    edges_per_sec = head["edges_per_sec"]

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                base = json.load(f)["value"]
            vs = edges_per_sec / base
        except Exception:
            pass
    else:
        try:
            os.makedirs(os.path.dirname(BASELINE_FILE), exist_ok=True)
            with open(BASELINE_FILE, "w") as f:
                json.dump({"value": edges_per_sec,
                           "recorded": time.time(),
                           "backend": jax.default_backend()}, f)
        except Exception:
            pass

    print(json.dumps({
        "metric": "pna_zinc_train_step_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(vs, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()


