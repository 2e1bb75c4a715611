"""Multi-process ("multi-host") distributed TRAINING run — not just one
step: two OS processes x 4 virtual CPU devices form a 2('data', DCN) x
4('graph', ICI) hybrid mesh via jax.distributed and train the node-level
large-graph objective for several full-batch steps (halo exchange,
cross-device BatchNorm, loss psum over 'graph' + pmean over 'data', Adam).

Every process must print the SAME loss at every step (the collective backend
is correct across the process boundary) and the curve must fall.  Writes
``RESULTS_multihost_training.json``.

Run (parent spawns children):  python benchmarks/multihost_train.py
Child mode:  python benchmarks/multihost_train.py --pid K --nproc 2 --port P
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NODES, EDGES, F = 20_000, 200_000, 8
STEPS = 8
D_DATA, D_GRAPH = 2, 4


def run_child(pid: int, nproc: int, port: int) -> None:
    from pna_tpu.parallel import multihost
    if nproc > 1:
        multihost.initialize(f"localhost:{port}", nproc, pid)

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    import optax
    from jax.sharding import PartitionSpec as P

    from pna_tpu.parallel.distributed_net import DistributedPNANet, init_net
    from pna_tpu.parallel.partition import partition_edges, powerlaw_graph
    from pna_tpu.train.largegraph import (make_node_train_step,
                                          neighbor_stats_labels)

    mesh = multihost.hybrid_mesh({"data": D_DATA}, {"graph": D_GRAPH})

    send, recv = powerlaw_graph(NODES, EDGES, seed=0)
    part = partition_edges(send, recv, NODES, D_GRAPH)
    feats_np = np.random.RandomState(0).randn(NODES, F).astype(np.float32)
    labels = neighbor_stats_labels(send, recv, feats_np, NODES)

    net = DistributedPNANet(hidden_dim=16, out_dim=16, n_layers=2, towers=2,
                            avg_d={"lin": float(EDGES / NODES), "log": 1.5},
                            batch_norm=True, residual=True,
                            bn_axes=("data", "graph"), node_level=True)
    params, stats = init_net(net, part, F, seed=0)
    tx = optax.adam(3e-3)
    step, evaluate, put_consts = make_node_train_step(part, mesh, net, tx)
    consts = put_consts()
    nl = part.nodes_per_part

    feats = np.broadcast_to(part.scatter_features(feats_np)[None],
                            (D_DATA, D_GRAPH, nl, F))
    feats = multihost.put_global(np.ascontiguousarray(feats), mesh,
                                 P("data", "graph"))
    targets = multihost.put_global(
        part.scatter_features(labels[:, None])[..., 0], mesh, P("graph"))
    tmask = multihost.put_global(part.node_mask, mesh, P("graph"))

    opt_state = tx.init(params)
    losses = []
    for it in range(STEPS):
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              feats, targets, tmask, *consts)
        losses.append(float(loss))
    multihost.barrier("end_of_train")
    print("MH_CURVE " + " ".join(f"{l:.8f}" for l in losses), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()
    if args.pid is not None:
        run_child(args.pid, args.nproc, args.port)
        return

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--pid", str(pid), "--nproc", "2",
         "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    curves = []
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out}"
        m = re.search(r"MH_CURVE (.+)", out)
        assert m, f"no MH_CURVE in proc {i} output:\n{out}"
        curves.append([float(x) for x in m.group(1).split()])
    assert curves[0] == curves[1], (
        f"processes diverged: {curves[0]} vs {curves[1]}")
    curve = curves[0]
    assert curve[-1] < curve[0], f"loss did not fall: {curve}"
    result = {
        "what": "Multi-process distributed TRAINING (2 OS processes x 4 "
                "virtual CPU devices = 2 DCN x 4 ICI hybrid mesh via "
                "jax.distributed): 8 full-batch steps of the node-level "
                "large-graph objective on a 20k/200k power-law graph "
                "(halo exchange, cross-device BN, Adam). Both processes "
                "print bit-identical losses every step and the curve falls "
                "— the collective backend trains, not just steps, across "
                "the process boundary. Real >=80% ICI scaling remains "
                "hardware-blocked (single physical chip).",
        "mesh": "2 processes x 4 devices ('data' DCN x 'graph' ICI)",
        "nodes": NODES, "edges": EDGES, "steps": STEPS,
        "loss_curve": curve,
        "processes_identical": True,
    }
    with open(os.path.join(REPO, "RESULTS_multihost_training.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
