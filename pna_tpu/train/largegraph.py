"""Multi-epoch edge-partitioned training on one large graph (the scaling
workload, BASELINE.json config 5: 10M nodes / 100M edges power-law).

This is the distributed counterpart of the single-device training engine
(``pna_tpu/train/engine.py``; reference anchor
/root/reference/multitask_benchmark/util/train.py:122-232): full-batch steps
over a node-partitioned graph on a ('data', 'graph') mesh with a NODE-LEVEL
objective — at 10M nodes a single graph scalar starves the model of signal,
so the realistic task is per-node regression against message-passing ground
truth (neighbour-statistics labels computed host-side, exactly the flavour of
the multitask node labels, /root/reference/multitask_benchmark/
datasets_generation/graph_algorithms.py).  Train/val node splits are
transductive (masks over the one graph).  JSONL curves, checkpoint/resume
under the mesh, plateau-free early stop on val loss — everything
``train/engine.py`` gives the small-graph benchmarks, distributed.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pna_tpu.parallel.distributed_net import (DistributedPNANet,
                                              _const_tables, _local_graph)
from pna_tpu.parallel.partition import (EdgePartition, bucketize_partition,
                                        partition_edges, powerlaw_graph,
                                        sort_partition_edges)
from pna_tpu.utils.checkpoint import (CheckpointManager, load_checkpoint,
                                      save_checkpoint)


def neighbor_stats_labels(senders: np.ndarray, receivers: np.ndarray,
                          feats: np.ndarray, num_nodes: int) -> np.ndarray:
    """Host-side message-passing ground truth (O(E), vectorized):

        y_i = mean_{j->i} x_j[0]  +  0.5 * max_{j->i} x_j[1]
              + 0.25 * log(1 + deg_i)

    — the same family as the reference's neighbourhood map-reduce node labels
    (graph_algorithms.py ``map_reduce_neighbourhood``); learnable only
    through actual aggregation, so a converging curve certifies the
    distributed message passing end to end."""
    deg = np.bincount(receivers, minlength=num_nodes).astype(np.float64)
    s0 = np.zeros(num_nodes)
    np.add.at(s0, receivers, feats[senders, 0].astype(np.float64))
    mean0 = s0 / np.maximum(deg, 1.0)
    mx1 = np.full(num_nodes, -np.inf)
    np.maximum.at(mx1, receivers, feats[senders, 1].astype(np.float64))
    mx1[deg == 0] = 0.0
    y = mean0 + 0.5 * mx1 + 0.25 * np.log1p(deg)
    return y.astype(np.float32)


def make_node_train_step(part: EdgePartition, mesh: Mesh,
                         net: DistributedPNANet,
                         tx: optax.GradientTransformation,
                         efeats: Optional[np.ndarray] = None):
    """Node-level masked-MSE train/eval steps over the ('data', 'graph') mesh.

    Returns ``(step, evaluate, put_consts)``:

    * ``step(params, stats, opt_state, feats, targets, mask, *consts) ->
      (params, stats, opt_state, loss)`` — feats [D, G, Nl, F] sharded
      P('data','graph'); targets/mask [G, Nl] sharded P('graph') (shared
      across the data axis); loss = sum of squared errors over masked nodes /
      count, psum over 'graph', pmean over 'data'.
    * ``evaluate(params, stats, feats, targets, mask, *consts) -> loss`` —
      same objective, ``train=False`` (BN running stats), no mutation.
    """
    data_axis, graph_axis = 'data', net.graph_axis
    nl = part.nodes_per_part
    bucket_spec = part.bucket_spec
    assert net.node_level, "make_node_train_step needs node_level=True"
    tables, parse = _const_tables(part, net, efeats)
    table_spec = P(graph_axis)
    n_tables = len(tables)
    # pallas does not support shard_map vma checking on any backend: in
    # interpret mode the checker rejects the kernel, and on real TPU the
    # inserted `pvary` primitive has no Pallas TC lowering (hit 2026-08-21
    # running the hub-skewed dryrun config on the real chip)
    check_vma = net.kernel not in ('pallas', 'pallas_fused')

    def local_forward(params, batch_stats, feats, targets, lmask, senders_l,
                      receivers_l, edge_mask, send_idx, send_mask, node_mask,
                      train, *extra):
        if check_vma:
            node_mask = jax.lax.pcast(node_mask, (data_axis,), to='varying')
            targets = jax.lax.pcast(targets, (data_axis,), to='varying')
            lmask = jax.lax.pcast(lmask, (data_axis,), to='varying')
        in_deg, edge_ptr, e, split = parse(*extra)
        g = _local_graph(nl, senders_l[0], receivers_l[0], edge_mask[0],
                         node_mask[0], bucket_spec=bucket_spec,
                         in_deg=in_deg, edge_ptr=edge_ptr)
        if train:
            pred, mutated = net.apply(
                {'params': params, 'batch_stats': batch_stats},
                g, feats[0, 0], send_idx, send_mask, train=True,
                mutable=['batch_stats'], split=split, e=e)
            new_stats = mutated['batch_stats']
        else:
            pred = net.apply({'params': params, 'batch_stats': batch_stats},
                             g, feats[0, 0], send_idx, send_mask,
                             train=False, split=split, e=e)
            new_stats = batch_stats
        m = lmask[0].astype(pred.dtype)
        se = jnp.sum(((pred - targets[0]) ** 2) * m)
        cnt = jnp.sum(m)
        se = jax.lax.psum(se, graph_axis)
        cnt = jax.lax.psum(cnt, graph_axis)
        loss = se / jnp.maximum(cnt, 1.0)
        return jax.lax.pmean(loss, data_axis), new_stats

    def make_fn(train):
        def local(params, batch_stats, feats, targets, lmask, *consts):
            return local_forward(params, batch_stats, feats, targets, lmask,
                                 *consts[:6], train, *consts[6:])
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(),
                      P(data_axis, graph_axis),   # feats [D, G, Nl, F]
                      table_spec, table_spec,     # targets/mask [G, Nl]
                      *([table_spec] * n_tables)),
            out_specs=(P(), P()), check_vma=check_vma)

    train_fn, eval_fn = make_fn(True), make_fn(False)

    @jax.jit
    def step(params, batch_stats, opt_state, feats, targets, mask, *consts):
        def loss_fn(p, bs):
            return train_fn(p, bs, feats, targets, mask, *consts)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def evaluate(params, batch_stats, feats, targets, mask, *consts):
        loss, _ = eval_fn(params, batch_stats, feats, targets, mask, *consts)
        return loss

    def put_consts():
        from pna_tpu.parallel.multihost import put_global
        return tuple(put_global(x, mesh, table_spec) for x in tables)

    return step, evaluate, put_consts


@dataclass
class LargeGraphConfig:
    """Config for the distributed large-graph trainer (CLI:
    pna_tpu/cli/train_largegraph.py)."""
    num_nodes: int = 100_000
    num_edges: int = 1_000_000
    graph_kind: str = 'powerlaw'          # 'powerlaw' | 'uniform'
    exponent: float = 1.5                 # power-law skew
    feat_dim: int = 8
    edge_feat_dim: int = 0                # >0: per-edge features + pretrans
    seed: int = 0
    # mesh / layout
    d_data: int = 1
    d_graph: int = 8
    kernel: str = 'auto'                  # auto|bucketed|generic|pallas
    # model
    hidden_dim: int = 64
    out_dim: int = 64
    n_layers: int = 4
    towers: int = 4
    aggregators: Sequence[str] = ('mean', 'max', 'min', 'std')
    scalers: Sequence[str] = ('identity', 'amplification', 'attenuation')
    batch_norm: bool = True
    # training
    steps: int = 100
    lr: float = 1e-3
    weight_decay: float = 0.0
    val_frac: float = 0.1
    eval_every: int = 10
    ckpt_every: int = 25
    patience: int = 0                     # 0 = no early stop (eval rounds)
    log_path: Optional[str] = None        # JSONL curve
    ckpt_dir: Optional[str] = None
    resume: bool = False
    max_degree: int = 0
    pallas_interpret: bool = False


def build_problem(cfg: LargeGraphConfig):
    """Graph + partition (layout matched to the kernel) + features/labels
    + masks, all host-side."""
    rng = np.random.RandomState(cfg.seed)
    if cfg.graph_kind == 'powerlaw':
        send, recv = powerlaw_graph(cfg.num_nodes, cfg.num_edges,
                                    seed=cfg.seed, exponent=cfg.exponent)
    elif cfg.graph_kind == 'uniform':
        send = rng.randint(0, cfg.num_nodes, cfg.num_edges).astype(np.int64)
        recv = rng.randint(0, cfg.num_nodes, cfg.num_edges).astype(np.int64)
    else:
        raise ValueError(cfg.graph_kind)

    part = partition_edges(send, recv, cfg.num_nodes, cfg.d_graph)

    kernel = cfg.kernel
    if kernel == 'auto':
        # codified backend decision (pna_tpu/ops/layout.py), fed the ACTUAL
        # heaviest part's edges rather than assuming an even E/P split —
        # under hub/receiver skew one part can hold far more than E/P edges
        # and its bucket table must fit ITS device's budget (ADVICE r4)
        import jax
        from pna_tpu.ops.layout import choose_layout
        part_edge_counts = part.edge_mask.sum(axis=1)
        p_heavy = int(np.argmax(part_edge_counts))
        orig = part.edge_origin[p_heavy][part.edge_mask[p_heavy]] \
            if part.edge_origin is not None else None
        if orig is not None:
            send_h, recv_h = send[orig], recv[orig]
        else:                      # fallback: global arrays, averaged budget
            send_h, recv_h = send, recv
        budget = 12 * 2 ** 30 if orig is not None \
            else 12 * 2 ** 30 / max(cfg.d_graph, 1)
        choice = choose_layout(
            send_h, recv_h, cfg.num_nodes, cfg.hidden_dim,
            hbm_budget_bytes=budget,
            on_tpu=cfg.pallas_interpret or jax.default_backend() == 'tpu')
        kernel = choice.kernel
        print(f"[choose_layout] {kernel} (heaviest part "
              f"{int(part_edge_counts[p_heavy])} of {cfg.num_edges} edges): "
              f"{choice.reason}")

    if kernel in ('bucketed',):
        part = bucketize_partition(part)
    elif kernel in ('pallas', 'pallas_fused'):
        part = sort_partition_edges(part)

    feats = rng.randn(cfg.num_nodes, cfg.feat_dim).astype(np.float32)
    labels = neighbor_stats_labels(send, recv, feats, cfg.num_nodes)
    deg = np.bincount(recv, minlength=cfg.num_nodes).astype(np.float64)
    d = np.maximum(deg, 1.0)
    avg_d = {'lin': float(np.mean(d)), 'log': float(np.mean(np.log(d + 1))),
             'exp': float(np.mean(np.exp(d))) if d.max() < 50 else 0.0}
    # the global edge list is no longer needed: every per-part view lives in
    # the partition.  Freeing it here (plus the degree scratch) keeps the
    # 100M-edge build inside host RAM (VERDICT r4 item 4: the r4 attempt
    # died at 115/125 GB with everything held in-core).
    del send, recv, deg, d

    # transductive split over real nodes
    val = rng.rand(cfg.num_nodes) < cfg.val_frac
    nm = part.node_mask
    val_p = part.scatter_features(val[:, None].astype(np.float32)
                                  )[..., 0].astype(bool)
    train_mask = nm & ~val_p
    val_mask = nm & val_p
    del val, val_p

    feats_p = part.scatter_features(feats)                  # [P, Nl, F]
    del feats
    labels_p = part.scatter_features(labels[:, None])[..., 0]   # [P, Nl]
    del labels

    efeats = None
    if cfg.edge_feat_dim:
        ef = rng.randn(cfg.num_edges, cfg.edge_feat_dim).astype(np.float32)
        efeats = part.scatter_edge_features(ef)
        del ef
    return part, feats_p, labels_p, train_mask, val_mask, efeats, avg_d, \
        kernel


def train_largegraph(cfg: LargeGraphConfig, devices=None):
    """Run the distributed trainer; returns (params, batch_stats, history)."""
    devices = devices if devices is not None else jax.devices()
    need = cfg.d_data * cfg.d_graph
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    mesh = Mesh(np.asarray(devices[:need]).reshape(cfg.d_data, cfg.d_graph),
                ('data', 'graph'))

    (part, feats_p, labels_p, train_mask, val_mask, efeats, avg_d,
     kernel) = build_problem(cfg)
    net = DistributedPNANet(
        hidden_dim=cfg.hidden_dim, out_dim=cfg.out_dim,
        n_layers=cfg.n_layers, towers=cfg.towers,
        aggregators=tuple(cfg.aggregators), scalers=tuple(cfg.scalers),
        avg_d=avg_d, batch_norm=cfg.batch_norm, residual=True,
        bn_axes=('data', 'graph'), kernel=kernel,
        edge_features=efeats is not None, node_level=True,
        max_degree=cfg.max_degree, pallas_interpret=cfg.pallas_interpret)

    from pna_tpu.parallel.distributed_net import init_net
    params, stats = init_net(net, part, cfg.feat_dim, seed=cfg.seed,
                             efeats=efeats)
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay) \
        if cfg.weight_decay else optax.adam(cfg.lr)
    opt_state = tx.init(params)

    step, evaluate, put_consts = make_node_train_step(part, mesh, net, tx,
                                                      efeats=efeats)
    consts = put_consts()
    D, G, nl = cfg.d_data, cfg.d_graph, part.nodes_per_part
    feats_in = jax.device_put(
        jnp.broadcast_to(jnp.asarray(feats_p)[None],
                         (D, G, nl, cfg.feat_dim)),
        NamedSharding(mesh, P('data', 'graph')))
    targets = jax.device_put(jnp.asarray(labels_p),
                             NamedSharding(mesh, P('graph')))
    tmask = jax.device_put(jnp.asarray(train_mask),
                           NamedSharding(mesh, P('graph')))
    vmask = jax.device_put(jnp.asarray(val_mask),
                           NamedSharding(mesh, P('graph')))

    start = 0
    best_val, since_best = float('inf'), 0
    mgr = None
    if cfg.ckpt_dir:
        mgr = CheckpointManager(cfg.ckpt_dir, keep_best=1, mode='min')
        latest = os.path.join(cfg.ckpt_dir, 'latest.ckpt')
        if cfg.resume and os.path.exists(latest):
            state, meta = load_checkpoint(latest)
            params = jax.tree_util.tree_map(jnp.asarray, state['params'])
            stats = jax.tree_util.tree_map(jnp.asarray, state['stats'])
            opt_state = jax.tree_util.tree_map(jnp.asarray,
                                               state['opt_state'])
            start = int(meta['step'])
            # restore the early-stop state so patience does not reset on
            # every resume (ADVICE r4)
            best_val = float(meta.get('best_val', float('inf')))
            since_best = int(meta.get('since_best', 0))
            print(f"[resume] from step {start} (best_val={best_val:.6g}, "
                  f"since_best={since_best})")

    history = []
    logf = open(cfg.log_path, 'a') if cfg.log_path else None
    t0 = time.time()
    for it in range(start, cfg.steps):
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              feats_in, targets, tmask,
                                              *consts)
        rec = {'step': it + 1, 'train_loss': float(loss),
               'wall_s': round(time.time() - t0, 3)}
        if (it + 1) % cfg.eval_every == 0 or it + 1 == cfg.steps:
            vl = float(evaluate(params, stats, feats_in, targets, vmask,
                                *consts))
            rec['val_loss'] = vl
            if mgr is not None:
                mgr.save_best({'params': params, 'stats': stats},
                              metric=vl, epoch=it + 1)
            if vl < best_val - 1e-9:
                best_val, since_best = vl, 0
            else:
                since_best += 1
        history.append(rec)
        if logf:
            logf.write(json.dumps(rec) + '\n')
            logf.flush()
        if cfg.ckpt_dir and ((it + 1) % cfg.ckpt_every == 0
                             or it + 1 == cfg.steps):
            save_checkpoint(os.path.join(cfg.ckpt_dir, 'latest.ckpt'),
                            {'params': params, 'stats': stats,
                             'opt_state': opt_state},
                            metadata={'step': it + 1,
                                      'best_val': best_val,
                                      'since_best': since_best})
        if cfg.patience and since_best >= cfg.patience:
            print(f"[early stop] no val improvement in {cfg.patience} evals")
            break
    if logf:
        logf.close()
    return params, stats, history
