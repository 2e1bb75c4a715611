"""Benchmark harness — prints ONE JSON line with the headline metric:
edges/sec/chip of a full PNA (ZINC-config) training step on a synthetic
molecular batch.

The reference publishes no throughput numbers (BASELINE.md: "published": {});
``vs_baseline`` is therefore reported relative to the first recorded value of
this harness (stored in benchmarks/baseline_value.json when first run on TPU).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_value.json")


def build_bench(batch_graphs_n=256, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from pna_tpu.data.molecules import ZincDataset, collate_records
    from pna_tpu.nn.nets import PNANetMolecules

    ds = ZincDataset.synthetic(n_train=batch_graphs_n, n_val=1, n_test=1,
                               seed=seed)
    # degree-bucketed static layout: gather/scatter-free aggregation path
    graph, labels = collate_records(ds.train, with_snorm=True,
                                    bucket_by_degree=True)
    avg_d = ds.avg_d()
    n_edges = int(np.asarray(graph.edge_mask).sum())

    model = PNANetMolecules(
        num_atom_type=ds.num_atom_type, num_bond_type=ds.num_bond_type,
        hidden_dim=75, out_dim=70, n_layers=4,
        aggregators=('mean', 'max', 'min', 'std'),
        scalers=('identity', 'amplification', 'attenuation'),
        avg_d=avg_d, readout_type='sum', towers=5,
        divide_input_first=False, divide_input_last=True,
        graph_norm=True, batch_norm=True, residual=True, edge_feat=False)

    # materialize the batch on device once — the step must not re-upload
    # host arrays through the transfer path every iteration
    graph = jax.device_put(graph)

    rng = jax.random.PRNGKey(0)
    variables = model.init({'params': rng}, graph,
                           graph.node_feats.squeeze(-1), None, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    labels_j = jnp.asarray(labels)

    @jax.jit
    def train_step(params, batch_stats, opt_state, graph, labels):
        def loss_fn(p):
            out, mutated = model.apply(
                {'params': p, 'batch_stats': batch_stats}, graph,
                graph.node_feats.squeeze(-1), None, train=True,
                rngs={'dropout': jax.random.PRNGKey(0)},
                mutable=['batch_stats'])
            l = PNANetMolecules.loss(out, labels, graph.graph_mask)
            return l, mutated['batch_stats']

        (l, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, l

    def run_once(state):
        params, batch_stats, opt_state = state
        params, batch_stats, opt_state, l = train_step(
            params, batch_stats, opt_state, graph, labels_j)
        return (params, batch_stats, opt_state), l

    return run_once, (params, batch_stats, opt_state), n_edges


def main():
    import jax

    run_once, state, n_edges = build_bench()

    # warmup / compile
    state, l = run_once(state)
    jax.block_until_ready(l)

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, l = run_once(state)
    jax.block_until_ready(l)
    dt = time.perf_counter() - t0

    edges_per_sec = n_edges * 4 * n_iters / dt  # 4 PNA layers per step

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
    }))


if __name__ == "__main__":
    main()
