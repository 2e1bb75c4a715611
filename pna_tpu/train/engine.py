"""Multitask training engine — TPU-native equivalent of
``multitask_benchmark/util/train.py:67-232``.

Differences from the reference, by design:
* per-size-bucket jitted train/eval steps (XLA compiles one program per bucket
  shape; the reference loops buckets eagerly);
* optax Adam with torch-style coupled weight decay (L2 on gradients, matching
  ``optim.Adam(..., weight_decay=...)`` at train.py:112);
* checkpoints are parameter pytrees kept in host memory and optionally written
  as a pickle (train.py:207-218 saves/rotates best state_dicts on disk);
* optional data-parallel sharding of each bucket batch over a device mesh.
"""

from __future__ import annotations

import pickle
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from pna_tpu.train.losses import (specific_loss_multiple_batches, total_loss,
                                  total_loss_multiple_batches)


@dataclass
class TrainConfig:
    """Flags of multitask_benchmark/util/train.py:21-54."""
    lr: float = 0.003
    weight_decay: float = 1e-6
    epochs: int = 10000
    patience: int = 1000
    loss: str = 'mse'
    only_nodes: bool = False
    only_graph: bool = False
    seed: int = 42
    print_every: int = 50
    checkpoint_path: Optional[str] = None
    # TPU-native additions
    data_parallel: bool = False  # shard bucket batches over all devices
    metrics_path: Optional[str] = None  # JSONL per-epoch metrics
    # hard wall-clock stop, like the realworld max_time flag
    # (realworld_benchmark/main_molecules.py:158-162); None = unlimited
    max_time_s: Optional[float] = None
    # checkpoint-restart (TPU-native addition; the reference only rotates
    # best state_dicts and cannot resume, util/train.py:207-218): 'latest'
    # checkpoint every checkpoint_every epochs + rotated best; resume=True
    # restores 'latest' and continues exactly.
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    checkpoint_every: int = 50


class MultitaskTrainer:
    """Trains a GNN (pna_tpu.nn.gnn.GNN or compatible (x, adj) model) on the
    multitask dense-bucket dataset."""

    def __init__(self, model, dataset: Dict[str, Any], config: TrainConfig):
        self.model = model
        self.data = dataset
        self.cfg = config
        self.tx = optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.adam(config.lr),
        )
        self._train_step_cache: Dict[Tuple[int, ...], Callable] = {}
        self._eval_cache: Dict[Tuple[int, ...], Callable] = {}
        self._sharding = None
        if config.data_parallel and len(jax.devices()) > 1:
            mesh = jax.sharding.Mesh(np.array(jax.devices()), ('data',))
            self._sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec('data'))

    # -- init -------------------------------------------------------------
    def init_state(self):
        rng = jax.random.PRNGKey(self.cfg.seed)
        feats = jnp.asarray(self.data['features']['train'][0][:2])
        adj = jnp.asarray(self.data['adj']['train'][0][:2])
        variables = self.model.init({'params': rng}, feats, adj, train=False)
        params = variables['params']
        batch_stats = variables.get('batch_stats', FrozenDict())
        opt_state = self.tx.init(params)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print("Total params", n_params)
        return dict(params=params, batch_stats=batch_stats,
                    opt_state=opt_state, rng=rng, epoch=0)

    # -- compiled steps ---------------------------------------------------
    def _make_train_step(self):
        cfg = self.cfg
        model = self.model

        def train_step(params, batch_stats, opt_state, rng, feats, adj,
                       node_labels, graph_labels):
            rng, dropout_rng = jax.random.split(rng)

            def loss_fn(p):
                out, mutated = model.apply(
                    {'params': p, 'batch_stats': batch_stats}, feats, adj,
                    train=True, rngs={'dropout': dropout_rng},
                    mutable=['batch_stats'])
                l = total_loss(out, (node_labels, graph_labels), loss=cfg.loss,
                               only_nodes=cfg.only_nodes,
                               only_graph=cfg.only_graph)
                return l, mutated['batch_stats']

            (l, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, rng, l

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def _make_eval_step(self):
        model = self.model

        def eval_step(params, batch_stats, feats, adj):
            return model.apply({'params': params, 'batch_stats': batch_stats},
                               feats, adj, train=False)

        return jax.jit(eval_step)

    def _put(self, *arrays):
        if self._sharding is None:
            return tuple(jnp.asarray(a) for a in arrays)
        return tuple(jax.device_put(jnp.asarray(a), self._sharding)
                     for a in arrays)

    # -- epoch loops ------------------------------------------------------
    def train_epoch(self, state):
        cfg = self.cfg
        step = self._train_step_cache.setdefault('step', self._make_train_step())
        last_loss = None
        d = self.data
        for b in range(len(d['adj']['train'])):
            feats, adj, nl, gl = self._put(
                d['features']['train'][b], d['adj']['train'][b],
                d['node_labels']['train'][b], d['graph_labels']['train'][b])
            (state['params'], state['batch_stats'], state['opt_state'],
             state['rng'], last_loss) = step(
                state['params'], state['batch_stats'], state['opt_state'],
                state['rng'], feats, adj, nl, gl)
        return float(last_loss)

    def evaluate(self, state, dset: str):
        cfg = self.cfg
        step = self._eval_cache.setdefault('step', self._make_eval_step())
        outs_n, outs_g = [], []
        d = self.data
        for b in range(len(d['adj'][dset])):
            feats, adj = self._put(d['features'][dset][b], d['adj'][dset][b])
            n_out, g_out = step(state['params'], state['batch_stats'], feats, adj)
            outs_n.append(n_out)
            outs_g.append(g_out)
        targets = (d['node_labels'][dset], d['graph_labels'][dset])
        tl = total_loss_multiple_batches(
            (outs_n, outs_g), targets, loss=cfg.loss,
            only_nodes=cfg.only_nodes, only_graph=cfg.only_graph)
        return tl, (outs_n, outs_g)

    def specific_losses(self, state, dset: str):
        _, outs = self.evaluate(state, dset)
        targets = (self.data['node_labels'][dset], self.data['graph_labels'][dset])
        return specific_loss_multiple_batches(
            outs, targets, loss=self.cfg.loss,
            only_nodes=self.cfg.only_nodes, only_graph=self.cfg.only_graph)

    # -- full loop --------------------------------------------------------
    def fit(self, state=None, epochs: Optional[int] = None,
            log_fn: Callable[[str], None] = print):
        cfg = self.cfg
        state = state or self.init_state()
        epochs = epochs if epochs is not None else cfg.epochs

        logger = None
        if cfg.metrics_path:
            from pna_tpu.utils.logging import MetricsLogger
            logger = MetricsLogger(cfg.metrics_path)

        best = float('inf')
        best_params = None
        best_stats = None
        best_epoch = -1
        bad = 0
        start_epoch = 0
        manager = None
        if cfg.checkpoint_dir:
            from pna_tpu.utils.checkpoint import CheckpointManager
            manager = CheckpointManager(cfg.checkpoint_dir, mode='min')
            if cfg.resume:
                ck, meta = manager.restore_latest()
                if ck is not None:
                    for k in ('params', 'batch_stats', 'opt_state', 'rng'):
                        state[k] = jax.tree_util.tree_map(jnp.asarray, ck[k])
                    best = meta['best']
                    best_epoch = meta['best_epoch']
                    bad = meta['bad']
                    start_epoch = meta['epoch'] + 1
                    b, _ = manager.restore_best()
                    if b is not None:
                        best_params = b['params']
                        best_stats = b['batch_stats']
                    log_fn(f"Resumed from epoch {meta['epoch']} "
                           f"(best {best:.4f} @{best_epoch})")
        t0 = time.time()
        for epoch in range(start_epoch, epochs):
            loss_train = self.train_epoch(state)
            loss_val, _ = self.evaluate(state, 'val')
            if logger:
                logger.log(epoch, loss_train=loss_train, loss_val=loss_val)
            if loss_val < best:
                best = loss_val
                best_params = jax.tree_util.tree_map(np.asarray, state['params'])
                best_stats = jax.tree_util.tree_map(np.asarray,
                                                    state['batch_stats'])
                best_epoch = epoch
                bad = 0
                if cfg.checkpoint_path:
                    with open(cfg.checkpoint_path, 'wb') as f:
                        pickle.dump(dict(params=best_params,
                                         batch_stats=best_stats,
                                         epoch=epoch, val_loss=best), f)
                if manager:
                    manager.save_best(dict(params=best_params,
                                           batch_stats=best_stats),
                                      metric=loss_val, epoch=epoch)
            else:
                bad += 1
            if manager and ((epoch + 1) % cfg.checkpoint_every == 0
                            or epoch + 1 == epochs):
                manager.save_latest(
                    dict(params=state['params'],
                         batch_stats=state['batch_stats'],
                         opt_state=state['opt_state'], rng=state['rng']),
                    epoch=epoch, best=best, best_epoch=best_epoch, bad=bad)
            if epoch % cfg.print_every == 0:
                log_fn(f"epoch {epoch}: loss.train {loss_train:.4f} "
                       f"loss.val {loss_val:.4f} (best {best:.4f} "
                       f"@{best_epoch}, {time.time() - t0:.1f}s)")
            if bad == cfg.patience:
                log_fn(f"Early stop at epoch {epoch + 1}")
                break
            if (cfg.max_time_s is not None
                    and time.time() - t0 > cfg.max_time_s):
                log_fn(f"Max-time stop at epoch {epoch + 1} "
                       f"({time.time() - t0:.0f}s)")
                break

        if logger:
            logger.close()
        # restore best
        state['params'] = jax.tree_util.tree_map(jnp.asarray, best_params)
        state['batch_stats'] = jax.tree_util.tree_map(jnp.asarray, best_stats)
        state['best_epoch'] = best_epoch
        state['best_val'] = best
        return state

    def test(self, state, log_fn: Callable[[str], None] = print):
        results = {}
        for dset in self.data['adj'].keys():
            tl, _ = self.evaluate(state, dset)
            sl = self.specific_losses(state, dset)
            results[dset] = dict(total=tl, per_task=sl)
            log_fn(f"Test set results {dset}: loss= {tl:.4f}")
            log_fn(f"{dset}: {sl}")
        return results
