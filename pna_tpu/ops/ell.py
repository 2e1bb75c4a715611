"""ELL (padded neighbor-list) fused aggregation — the TPU-native fast path.

``jax.ops.segment_*`` lowers to scatter, which serializes on TPU.  With the
in-edges of each node padded to the max in-degree (``Graph.nbr_edge_ids`` /
``nbr_mask``, built host-side), every aggregator becomes a gather + masked
reduction over a *static* axis: pure vectorized VPU work that XLA fuses into a
single pass over the gathered messages — the "fused multi-aggregator kernel"
of SURVEY §7.2 phase 7, expressed so the XLA compiler emits it directly.

Numerics match ``pna_tpu.ops.segment`` exactly (EPS placement, relu clamps,
empty-segment -> 0); tests/test_ell.py cross-checks every aggregator.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

EPS = 1e-5


@struct.dataclass
class EllCtx:
    """Precomputed shared terms for a bank of ELL aggregations."""
    g: jnp.ndarray          # [N, D, F] gathered (masked) messages
    m: jnp.ndarray          # [N, D, 1] float mask
    cnt: jnp.ndarray        # [N, 1] float degree (clamped >= 1 for divisions)
    raw_cnt: jnp.ndarray    # [N, 1] true degree
    mean: jnp.ndarray       # [N, F]
    self_msg: Optional[jnp.ndarray] = None
    senders_ell: Optional[jnp.ndarray] = None  # [N, D] sender ids (for nmean)
    out_deg: Optional[jnp.ndarray] = None      # [N] sender out-degrees

    @classmethod
    def create(cls, msg, nbr_edge_ids, nbr_mask, self_msg=None,
               senders=None, out_deg=None):
        g = msg[nbr_edge_ids]                        # [N, D, F]
        m = nbr_mask[..., None].astype(msg.dtype)    # [N, D, 1]
        g = g * m
        raw_cnt = jnp.sum(m, axis=1)                 # [N, 1]
        cnt = jnp.maximum(raw_cnt, 1.0)
        mean = jnp.sum(g, axis=1) / cnt
        senders_ell = None
        if senders is not None:
            senders_ell = senders[nbr_edge_ids]
        return cls(g=g, m=m, cnt=cnt, raw_cnt=raw_cnt, mean=mean,
                   self_msg=self_msg, senders_ell=senders_ell, out_deg=out_deg)


def ell_sum(ctx: EllCtx):
    return jnp.sum(ctx.g, axis=1)


def ell_mean(ctx: EllCtx):
    return ctx.mean


def ell_max(ctx: EllCtx):
    big = jnp.where(ctx.m > 0, ctx.g, -jnp.inf)
    out = jnp.max(big, axis=1)
    return jnp.where(ctx.raw_cnt > 0, out, 0.0)


def ell_min(ctx: EllCtx):
    big = jnp.where(ctx.m > 0, ctx.g, jnp.inf)
    out = jnp.min(big, axis=1)
    return jnp.where(ctx.raw_cnt > 0, out, 0.0)


def ell_var(ctx: EllCtx):
    mean_sq = jnp.sum(ctx.g * ctx.g, axis=1) / ctx.cnt
    return jax.nn.relu(mean_sq - ctx.mean * ctx.mean)


def ell_std(ctx: EllCtx):
    return jnp.sqrt(ell_var(ctx) + EPS)


def ell_identity(ctx: EllCtx):
    if ctx.self_msg is None:
        raise ValueError("identity aggregator requires self_msg")
    return ctx.self_msg


def ell_moment(ctx: EllCtx, n=3):
    centered = (ctx.g - ctx.mean[:, None, :]) * ctx.m
    m_n = jnp.sum(centered ** n, axis=1) / ctx.cnt
    return jnp.sign(m_n) * jnp.power(jnp.abs(m_n) + EPS, 1.0 / n)


def ell_softmax(ctx: EllCtx):
    mx = jnp.max(jnp.where(ctx.m > 0, ctx.g, -jnp.inf), axis=1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    w = jnp.exp(ctx.g - mx) * ctx.m
    # empty neighbourhoods: denom 1 (not tiny) — the division VJP squares the
    # denominator, and tiny**2 underflows to 0 giving NaN gradients
    denom = jnp.where(ctx.raw_cnt > 0, jnp.sum(w, axis=1), 1.0)
    return jnp.sum(w * ctx.g, axis=1) / denom


def ell_softmin(ctx: EllCtx):
    neg = ctx.replace(g=-ctx.g, mean=-ctx.mean)
    return -ell_softmax(neg)


def ell_normalised_mean(ctx: EllCtx):
    if ctx.senders_ell is None or ctx.out_deg is None:
        raise ValueError("normalised_mean requires senders_ell/out_deg")
    r_in = jax.lax.rsqrt(jnp.maximum(ctx.raw_cnt, 1e-30))       # [N, 1]
    r_out = jax.lax.rsqrt(jnp.maximum(ctx.out_deg, 1e-30))       # [N]
    w = r_out[ctx.senders_ell][..., None] * ctx.m                # [N, D, 1]
    return jnp.sum(ctx.g * w, axis=1) * r_in


ELL_AGGREGATORS: Dict[str, Callable] = {
    'mean': ell_mean,
    'sum': ell_sum,
    'max': ell_max,
    'min': ell_min,
    'identity': ell_identity,
    'std': ell_std,
    'var': ell_var,
    'normalised_mean': ell_normalised_mean,
    'softmax': ell_softmax,
    'softmin': ell_softmin,
    'moment3': lambda c: ell_moment(c, 3),
    'moment4': lambda c: ell_moment(c, 4),
    'moment5': lambda c: ell_moment(c, 5),
}
