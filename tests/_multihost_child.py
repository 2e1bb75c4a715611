"""Child process for tests/test_multihost.py — runs ONE edge-partitioned
train step of the flagship DistributedPNANet on a hybrid
('data' = DCN/processes) x ('graph' = ICI/local devices) mesh and prints the
loss.  Invoked as:  python _multihost_child.py <process_id> <num_processes>
<coordinator_port>.  With num_processes=1 the same function doubles as the
in-process oracle for the parent test."""

import sys


def run(pid: int, nproc: int, port, d_data: int = 2, d_graph: int = 4):
    from pna_tpu.parallel import multihost
    if nproc > 1:
        multihost.initialize(f"localhost:{port}", nproc, pid)

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    import jax.numpy as jnp  # noqa: F401
    import optax
    from jax.sharding import PartitionSpec as P

    from pna_tpu.parallel.distributed_net import (DistributedPNANet, init_net,
                                                  make_distributed_train_step)
    from pna_tpu.parallel.partition import partition_edges, powerlaw_graph

    if nproc > 1:
        assert jax.local_device_count() == d_graph, jax.local_devices()
        assert jax.device_count() == d_data * d_graph
    mesh = multihost.hybrid_mesh({"data": d_data}, {"graph": d_graph})

    num_nodes, F = 48, 6
    send, recv = powerlaw_graph(num_nodes, 200, seed=2)
    pairs = np.unique(send * num_nodes + recv)
    send, recv = pairs // num_nodes, pairs % num_nodes
    part = partition_edges(send, recv, num_nodes, d_graph)

    net = DistributedPNANet(hidden_dim=8, out_dim=8, n_layers=2, towers=2,
                            avg_d={"lin": 2.0, "log": 1.1}, batch_norm=True,
                            residual=True, bn_axes=("data", "graph"))
    params, stats = init_net(net, part, F, seed=0)
    step, put_consts, tx = make_distributed_train_step(part, mesh, net,
                                                       tx=optax.sgd(1e-2))
    nl = part.nodes_per_part
    feats = np.random.RandomState(1).randn(
        d_data, d_graph * nl, F).astype(np.float32)
    feats[:, num_nodes:] = 0.0
    feats = multihost.put_global(feats.reshape(d_data, d_graph, nl, F),
                                 mesh, P("data", "graph"))
    targets = multihost.put_global(np.asarray([0.3, -1.1], np.float32),
                                   mesh, P("data"))

    new_params, _, _, loss = step(params, stats, tx.init(params),
                                  feats, targets, *put_consts())
    multihost.barrier("end_of_step")
    # fingerprint the updated params too, so the test catches grad divergence
    leaves = jax.tree_util.tree_leaves(new_params)
    psum = float(sum(float(np.abs(np.asarray(x)).sum()) for x in leaves))
    print(f"MH_LOSS {float(loss):.10f} PSUM {psum:.6f}", flush=True)
    return float(loss), psum


if __name__ == "__main__":
    run(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
