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


def _forward_stats(msg, nbr_edge_ids, nbr_mask, with_ties=False):
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
    if not with_ties:
        return s, sq, mx, mn, deg[:, 0], cnt[:, 0]
    # tie counts for the max/min subgradient, computed here while the
    # gathered [N, D, F] tensor is live — the backward then needs no
    # re-gather of the neighbourhood tensor at all.
    ties_mx = jnp.maximum(jnp.sum(((g == mx[:, None, :]) & (m > 0))
                                  .astype(msg.dtype), axis=1), 1.0)
    ties_mn = jnp.maximum(jnp.sum(((g == mn[:, None, :]) & (m > 0))
                                  .astype(msg.dtype), axis=1), 1.0)
    return s, sq, mx, mn, deg[:, 0], cnt[:, 0], ties_mx, ties_mn


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
    (msg, deg, cnt, mean, var_raw, std, mx, mn, ties_mx, ties_mn) = res
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

    # split max/min gradient among ties (XLA max-reduce convention);
    # tie counts come from the forward residuals — no neighbourhood re-gather.
    g_max = g_max / ties_mx
    g_min = g_min / ties_mn
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
        s, sq, mx, mn, _, cnt, ties_mx, ties_mn = _forward_stats(
            msg, nbr_edge_ids, nbr_mask, with_ties=True)
        out, (mean, var_raw, std) = _assemble(aggregators, scalers, s, sq, mx,
                                              mn, deg, cnt, avg_d)
        return out, (msg, deg, cnt, mean, var_raw, std, mx, mn,
                     ties_mx, ties_mn)

    def bwd(aggregators, scalers, avg_d, res, d_out):
        g_lin, g_quad, g_max, g_min = _node_partials(aggregators, scalers,
                                                     avg_d, res, d_out)
        msg, mx, mn = res[0], res[6], res[7]
        F = msg.shape[-1]
        # one wide gather instead of six per-field gathers — XLA's TPU gather
        # cost is per-row, flat in row width, so stacking is a ~6x win.
        fields = jnp.concatenate([g_lin, g_quad, g_max, g_min, mx, mn],
                                 axis=-1)                       # [N, 6F]
        fe = fields[receivers]                                  # [E, 6F]
        d_msg = (fe[:, :F] + 2.0 * msg * fe[:, F:2 * F]
                 + (msg == fe[:, 4 * F:5 * F]).astype(msg.dtype) * fe[:, 2 * F:3 * F]
                 + (msg == fe[:, 5 * F:]).astype(msg.dtype) * fe[:, 3 * F:4 * F])
        # padded edges are never referenced by nbr_edge_ids, so their grad
        # must be exactly zero (otherwise pretrans sees garbage-row grads).
        if edge_mask is not None:
            d_msg = jnp.where(edge_mask[:, None], d_msg, 0.0)
        return d_msg, None, None, None

    fused.defvjp(fwd, bwd)
    return fused


def _assemble_raw(aggregators, s, sq, mx, mn, cnt):
    mean = s / cnt[:, None]
    var_raw = sq / cnt[:, None] - mean * mean
    var = jax.nn.relu(var_raw)
    std = jnp.sqrt(var + EPS)
    table = {'mean': mean, 'sum': s, 'max': mx, 'min': mn, 'var': var,
             'std': std}
    agg = jnp.stack([table[a] for a in aggregators], axis=1)    # [N, A, F]
    return agg, (mean, var_raw, std)


def make_raw_bank(receivers, edge_mask=None):
    """Scaler-free variant of :func:`make_fused_bank`: returns the raw
    aggregator tensor Z [N, A, F] (aggregators in caller order, f32).

    The degree scalers are per-node *scalars*, so the (scaler, aggregator)
    cross-product never needs to be materialized: the consumer contracts Z
    against its posttrans weights first and applies the S scaler weights to
    the (much narrower) output — S x less HBM traffic through the widest
    tensor of the layer.  Backward is the same scatter-free node-partials +
    one wide gather as the full bank."""

    @partial(jax.custom_vjp, nondiff_argnums=(3,))
    def raw(msg, nbr_edge_ids, nbr_mask, aggregators):
        s, sq, mx, mn, _, cnt = _forward_stats(
            msg.astype(jnp.float32), nbr_edge_ids, nbr_mask)
        out, _ = _assemble_raw(aggregators, s, sq, mx, mn, cnt)
        return out

    def fwd(msg, nbr_edge_ids, nbr_mask, aggregators):
        s, sq, mx, mn, _, cnt, ties_mx, ties_mn = _forward_stats(
            msg.astype(jnp.float32), nbr_edge_ids, nbr_mask, with_ties=True)
        out, (mean, var_raw, std) = _assemble_raw(aggregators, s, sq, mx, mn,
                                                  cnt)
        return out, (msg, cnt, mean, var_raw, std, mx, mn, ties_mx, ties_mn)

    def bwd(aggregators, res, d_agg):
        (msg, cnt, mean, var_raw, std, mx, mn, ties_mx, ties_mn) = res
        msg32 = msg.astype(jnp.float32)
        N, F = mean.shape

        g_lin = jnp.zeros((N, F), jnp.float32)
        g_quad = jnp.zeros((N, F), jnp.float32)
        g_max = jnp.zeros((N, F), jnp.float32)
        g_min = jnp.zeros((N, F), jnp.float32)
        inv_cnt = (1.0 / cnt)[:, None]

        for i, a in enumerate(aggregators):
            d = d_agg[:, i, :].astype(jnp.float32)
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
                d = d * (var_raw > 0).astype(jnp.float32)
                g_quad = g_quad + d * inv_cnt
                g_lin = g_lin - d * 2.0 * mean * inv_cnt
            else:
                raise ValueError(a)
        g_max = g_max / ties_mx
        g_min = g_min / ties_mn

        fields = jnp.concatenate([g_lin, g_quad, g_max, g_min, mx, mn],
                                 axis=-1)                       # [N, 6F]
        fe = fields[receivers]                                  # [E, 6F]
        d_msg = (fe[:, :F] + 2.0 * msg32 * fe[:, F:2 * F]
                 + (msg32 == fe[:, 4 * F:5 * F]).astype(jnp.float32)
                 * fe[:, 2 * F:3 * F]
                 + (msg32 == fe[:, 5 * F:]).astype(jnp.float32)
                 * fe[:, 3 * F:4 * F])
        if edge_mask is not None:
            d_msg = jnp.where(edge_mask[:, None], d_msg, 0.0)
        return d_msg.astype(msg.dtype), None, None

    raw.defvjp(fwd, bwd)
    return raw
