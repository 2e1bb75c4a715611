"""Fused PNA aggregation with a hand-written VJP — the framework's core
kernel (SURVEY §7.2 phase 7, BASELINE north star).

Forward: one pass over the ELL-gathered messages produces the moment sketch
{sum, max, min, sum-of-squares}; mean/var/std and the degree scalers are
derived elementwise and emitted as the (scaler, aggregator, feature) tensor
the PNA tower consumes.

Backward (the point of this module): XLA's autodiff of the naive bank
re-gathers and scatter-adds per aggregator.  But every aggregator here has a
node-level sufficient statistic, so the true backward is:

  1. reduce d_out over the scaler axis with the (static, degree-dependent)
     scaler weights -> per-aggregator node partials        [N, A, F]
  2. fold mean/std chain rules into three node fields:
        g_lin  (coefficient of msg^0), g_quad (of msg), g_max, g_min
  3. d_msg[e] = g_lin[r] + 2 msg[e] g_quad[r]
               + (msg[e]==maxv[r]) g_max[r] + (msg[e]==minv[r]) g_min[r]

— a single GATHER per edge and pure elementwise math: no scatter anywhere.
Numerics match the reference formulas exactly (EPS inside sqrt at
models/pytorch/pna/aggregators.py:57, relu clamp :72, deg-0 guards
models/pytorch_geometric/scalers.py:18,28).  Max/min ties: gradient is split
among ties (like XLA's max-reduce), vs torch's first-argmax; both subgradients.

Supported: aggregators {mean, sum, max, min, var, std} x scalers {identity,
amplification, attenuation, linear, inverse_linear} — the benchmark configs.
``supports(...)`` reports coverage; callers fall back to the generic bank.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-5

_AGGS = ('mean', 'sum', 'max', 'min', 'var', 'std')
_SCALERS = ('identity', 'amplification', 'attenuation', 'linear',
            'inverse_linear')


def supports(aggregators: Sequence[str], scalers: Sequence[str]) -> bool:
    return (all(a in _AGGS for a in aggregators)
            and all(s in _SCALERS for s in scalers))


def _scaler_weights(scalers, deg, avg_d):
    """[S, N] multiplicative weights; deg==0 guarded to 1 for the inverse
    scalers (PyG semantics)."""
    ws = []
    for s in scalers:
        if s == 'identity':
            ws.append(jnp.ones_like(deg))
        elif s == 'amplification':
            ws.append(jnp.log(deg + 1) / avg_d['log'])
        elif s == 'attenuation':
            w = avg_d['log'] / jnp.log(deg + 1)
            ws.append(jnp.where(deg == 0, 1.0, w))
        elif s == 'linear':
            ws.append(deg / avg_d['lin'])
        elif s == 'inverse_linear':
            w = avg_d['lin'] / deg
            ws.append(jnp.where(deg == 0, 1.0, w))
        else:
            raise ValueError(s)
    return jnp.stack(ws)  # [S, N]


def _forward_stats(msg, nbr_edge_ids, nbr_mask):
    g = msg[nbr_edge_ids]                            # [N, D, F]
    m = nbr_mask[..., None].astype(msg.dtype)
    g = g * m
    deg = jnp.sum(m, axis=1)                         # [N, 1]
    cnt = jnp.maximum(deg, 1.0)
    s = jnp.sum(g, axis=1)                           # [N, F]
    sq = jnp.sum(g * g, axis=1)
    mx = jnp.where(m > 0, g, -jnp.inf).max(axis=1)
    mx = jnp.where(deg > 0, mx, 0.0)
    mn = jnp.where(m > 0, g, jnp.inf).min(axis=1)
    mn = jnp.where(deg > 0, mn, 0.0)
    return s, sq, mx, mn, deg[:, 0], cnt[:, 0]


def _assemble(aggregators, scalers, s, sq, mx, mn, deg, cnt, avg_d):
    mean = s / cnt[:, None]
    var_raw = sq / cnt[:, None] - mean * mean
    var = jax.nn.relu(var_raw)
    std = jnp.sqrt(var + EPS)
    table = {'mean': mean, 'sum': s, 'max': mx, 'min': mn, 'var': var,
             'std': std}
    agg = jnp.stack([table[a] for a in aggregators], axis=1)   # [N, A, F]
    w = _scaler_weights(scalers, deg, avg_d)                   # [S, N]
    out = agg[:, None, :, :] * w.T[:, :, None, None]           # [N, S, A, F]
    return out, (mean, var_raw, std)


def _node_partials(aggregators, scalers, avg_d, res, d_out):
    """Collapse d_out [N, S, A, F] into the four node-level gradient fields."""
    (msg, nbr_edge_ids, nbr_mask, deg, cnt, mean, var_raw, std, mx, mn) = res
    E, F = msg.shape
    N = deg.shape[0]

    w = _scaler_weights(scalers, deg, avg_d)        # [S, N]
    d_agg = jnp.einsum('nsaf,sn->naf', d_out, w)

    g_lin = jnp.zeros((N, F), msg.dtype)   # coefficient of 1 per edge
    g_quad = jnp.zeros((N, F), msg.dtype)  # coefficient of msg per edge
    g_max = jnp.zeros((N, F), msg.dtype)
    g_min = jnp.zeros((N, F), msg.dtype)
    inv_cnt = (1.0 / cnt)[:, None]

    for i, a in enumerate(aggregators):
        d = d_agg[:, i, :]
        if a == 'sum':
            g_lin = g_lin + d
        elif a == 'mean':
            g_lin = g_lin + d * inv_cnt
        elif a == 'max':
            g_max = g_max + d
        elif a == 'min':
            g_min = g_min + d
        elif a in ('var', 'std'):
            if a == 'std':
                d = d * (0.5 / std)
            relu_gate = (var_raw > 0).astype(msg.dtype)
            d = d * relu_gate
            # var = sq/cnt - mean^2 ; msg enters sq as msg^2, mean as msg/cnt.
            # d var/d msg_e = (2/cnt)(msg_e - mean); d_msg applies g_quad as
            # 2*msg*g_quad, so g_quad carries d/cnt (no extra 2).
            g_quad = g_quad + d * inv_cnt
            g_lin = g_lin - d * 2.0 * mean * inv_cnt
        else:
            raise ValueError(a)

    # split max/min gradient among ties (XLA max-reduce convention)
    if ('max' in aggregators) or ('min' in aggregators):
        gmsg = msg[nbr_edge_ids]                                  # [N, D, F]
        m = nbr_mask[..., None]
        if 'max' in aggregators:
            is_max = (gmsg == mx[:, None, :]) & m
            g_max = g_max / jnp.maximum(is_max.sum(axis=1), 1)
        if 'min' in aggregators:
            is_min = (gmsg == mn[:, None, :]) & m
            g_min = g_min / jnp.maximum(is_min.sum(axis=1), 1)
    return g_lin, g_quad, g_max, g_min


def make_fused_bank(receivers, edge_mask=None):
    """Bind the receivers vector (and optional edge mask) so the backward can
    gather node partials per edge.  Returns fused(msg, nbr_edge_ids, nbr_mask,
    deg, aggregators, scalers, avg_d) with full custom VJP."""

    @partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
    def fused(msg, nbr_edge_ids, nbr_mask, deg, aggregators, scalers, avg_d):
        s, sq, mx, mn, _, cnt = _forward_stats(msg, nbr_edge_ids, nbr_mask)
        out, _ = _assemble(aggregators, scalers, s, sq, mx, mn, deg, cnt,
                           avg_d)
        return out

    def fwd(msg, nbr_edge_ids, nbr_mask, deg, aggregators, scalers, avg_d):
        s, sq, mx, mn, _, cnt = _forward_stats(msg, nbr_edge_ids, nbr_mask)
        out, (mean, var_raw, std) = _assemble(aggregators, scalers, s, sq, mx,
                                              mn, deg, cnt, avg_d)
        return out, (msg, nbr_edge_ids, nbr_mask, deg, cnt, mean, var_raw,
                     std, mx, mn)

    def bwd(aggregators, scalers, avg_d, res, d_out):
        g_lin, g_quad, g_max, g_min = _node_partials(aggregators, scalers,
                                                     avg_d, res, d_out)
        msg = res[0]
        r = receivers
        d_msg = (g_lin[r] + 2.0 * msg * g_quad[r]
                 + (msg == res[8][r]).astype(msg.dtype) * g_max[r]
                 + (msg == res[9][r]).astype(msg.dtype) * g_min[r])
        # padded edges are never referenced by nbr_edge_ids, so their grad
        # must be exactly zero (otherwise pretrans sees garbage-row grads).
        if edge_mask is not None:
            d_msg = jnp.where(edge_mask[:, None], d_msg, 0.0)
        return d_msg, None, None, None

    fused.defvjp(fwd, bwd)
    return fused
