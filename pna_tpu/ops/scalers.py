"""Degree scaler banks + avg_d statistics.

Dense semantics: ``models/pytorch/pna/scalers.py:7-42`` (degree = row sum of adj;
divides by zero on isolated nodes — parity).
Degree-vector semantics (sparse path): ``models/pytorch_geometric/scalers.py:8-38``
(deg==0 guarded to scale=1 for attenuation/inverse_linear).

avg_d statistics:
* multitask engine (``multitask_benchmark/util/train.py:91-94``):
    lin = mean(D), exp = mean(exp(1/D) - 1), log = mean(log(D + 1))
  averaged per size-bucket then across buckets.
* PyG degree-histogram version (``models/pytorch_geometric/pna.py:79-86``):
    lin = E[d], log = E[log(d+1)], exp = E[exp(d)].
* realworld mains (``realworld_benchmark/main_molecules.py:368-372``):
    avg_d = mean over train graphs of mean(log(in_degree + 1)) -> {'log': v}.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Dense scalers: f(X [B,N,D], adj [B,N,N], avg_d) -> [B,N,D]
# ---------------------------------------------------------------------------

def dense_scale_identity(X, adj, avg_d=None):
    return X


def dense_scale_amplification(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1)
    scale = (jnp.log(D + 1) / avg_d["log"])[..., None]
    return scale * X


def dense_scale_attenuation(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1)
    scale = (avg_d["log"] / jnp.log(D + 1))[..., None]
    return scale * X


def dense_scale_linear(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1, keepdims=True)
    return D * X / avg_d["lin"]


def dense_scale_inverse_linear(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1, keepdims=True)
    return avg_d["lin"] * X / D


DENSE_SCALERS: Dict[str, Callable] = {
    'identity': dense_scale_identity,
    'amplification': dense_scale_amplification,
    'attenuation': dense_scale_attenuation,
    'linear': dense_scale_linear,
    'inverse_linear': dense_scale_inverse_linear,
}


# ---------------------------------------------------------------------------
# Degree-vector scalers: f(X [N,D], deg [N] or [N,1], avg_d) -> [N,D]
# (models/pytorch_geometric/scalers.py, with the deg==0 guards)
# ---------------------------------------------------------------------------

def scale_identity(X, deg, avg_d=None):
    return X


def _col(deg, X):
    deg = jnp.asarray(deg)
    if deg.ndim == X.ndim - 1:
        deg = deg[..., None]
    return deg


def scale_amplification(X, deg, avg_d):
    deg = _col(deg, X)
    return X * (jnp.log(deg + 1) / avg_d['log'])


def scale_attenuation(X, deg, avg_d):
    deg = _col(deg, X)
    scale = avg_d['log'] / jnp.log(deg + 1)
    scale = jnp.where(deg == 0, 1.0, scale)  # pytorch_geometric/scalers.py:18
    return X * scale


def scale_linear(X, deg, avg_d):
    deg = _col(deg, X)
    return X * (deg / avg_d['lin'])


def scale_inverse_linear(X, deg, avg_d):
    deg = _col(deg, X)
    scale = avg_d['lin'] / deg
    scale = jnp.where(deg == 0, 1.0, scale)  # pytorch_geometric/scalers.py:28
    return X * scale


SCALERS: Dict[str, Callable] = {
    'identity': scale_identity,
    'amplification': scale_amplification,
    'attenuation': scale_attenuation,
    'linear': scale_linear,
    'inverse_linear': scale_inverse_linear,
}


# ---------------------------------------------------------------------------
# avg_d statistics
# ---------------------------------------------------------------------------

def avg_d_from_dense_adj(adjs) -> Dict[str, float]:
    """Multitask engine formula (multitask_benchmark/util/train.py:91-94).

    ``adjs`` is a list of dense adjacency batches [B, N, N]; statistics are the
    mean per batch, averaged over batches (each bucket weighted equally).
    """
    lin, ex, log = [], [], []
    for A in adjs:
        D = np.asarray(jnp.sum(jnp.asarray(A), axis=-1))
        lin.append(D.mean())
        ex.append((np.exp(1.0 / D) - 1).mean())
        log.append(np.log(D + 1).mean())
    n = len(adjs)
    return dict(lin=float(sum(lin) / n), exp=float(sum(ex) / n),
                log=float(sum(log) / n))


def avg_d_from_degree_hist(deg_hist) -> Dict[str, float]:
    """PyG degree-histogram formula (models/pytorch_geometric/pna.py:79-86)."""
    deg = np.asarray(deg_hist, dtype=np.float64)
    total = deg.sum()
    bins = np.arange(len(deg), dtype=np.float64)
    return dict(
        lin=float((bins * deg).sum() / total),
        log=float((np.log(bins + 1) * deg).sum() / total),
        exp=float((np.exp(bins) * deg).sum() / total),
    )


def avg_d_from_degrees(per_graph_degrees) -> Dict[str, float]:
    """Realworld mains formula (realworld_benchmark/main_molecules.py:368-372):
    mean over graphs of mean(log(in_degree + 1))."""
    logs = [float(np.mean(np.log(np.asarray(d, dtype=np.float64) + 1)))
            for d in per_graph_degrees]
    return dict(log=float(np.mean(logs)))
