"""Segment reduction primitives — the TPU-native replacement for DGL's
degree-bucketed mailbox engine (``models/dgl/pna_layer.py:61-64``) and
``torch_scatter.scatter`` (``models/pytorch_geometric/aggregators.py:9-32``).

These are the XLA-path implementations (``jax.ops.segment_*`` lower to
scatter/reduce-window).  The fused Pallas kernel in ``pna_tpu.ops.fused`` provides
an optimized path behind the same semantics; these functions double as its test
oracle.

All functions take an explicit static ``num_segments`` (XLA needs static shapes)
and an optional ``mask`` over the data rows.  Empty segments yield 0 (matching
DGL 0.4.2 which leaves zero-degree nodes untouched/zero and the PyG deg==0
guards at ``models/pytorch_geometric/scalers.py:18,28``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1e-5  # models/pytorch/pna/aggregators.py:4, models/dgl/aggregators.py:3


def _apply_mask(data: jnp.ndarray, mask: Optional[jnp.ndarray], fill: float) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, jnp.asarray(fill, dtype=data.dtype))


def segment_sum(data, segment_ids, num_segments, mask=None):
    data = _apply_mask(data, mask, 0.0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids, num_segments, mask=None, dtype=jnp.float32):
    ones = jnp.ones(segment_ids.shape, dtype=dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, mask=None, count=None):
    s = segment_sum(data, segment_ids, num_segments, mask)
    if count is None:
        count = segment_count(segment_ids, num_segments, mask, dtype=data.dtype)
    denom = jnp.maximum(count, 1.0)
    return s / denom.reshape(denom.shape + (1,) * (s.ndim - denom.ndim))


def segment_max(data, segment_ids, num_segments, mask=None):
    """Max over segments; empty segments -> 0 (not -inf).

    Reference dense path masks non-edges to -inf before max
    (``models/pytorch/pna/aggregators.py:30-38``); with no isolated nodes the
    results agree.
    """
    masked = _apply_mask(data, mask, -jnp.inf)
    out = jax.ops.segment_max(masked, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_min(data, segment_ids, num_segments, mask=None):
    masked = _apply_mask(data, mask, jnp.inf)
    out = jax.ops.segment_min(masked, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_var(data, segment_ids, num_segments, mask=None, count=None,
                relu_clamp: bool = True):
    """relu(E[X^2] - E[X]^2) per segment.

    ``relu_clamp=True`` matches the dense/DGL banks
    (``models/pytorch/pna/aggregators.py:61-73``, ``models/dgl/aggregators.py:22-26``);
    PyG's var has no clamp (``models/pytorch_geometric/aggregators.py:25-28``).
    """
    if count is None:
        count = segment_count(segment_ids, num_segments, mask, dtype=data.dtype)
    mean = segment_mean(data, segment_ids, num_segments, mask, count)
    mean_sq = segment_mean(data * data, segment_ids, num_segments, mask, count)
    var = mean_sq - mean * mean
    if relu_clamp:
        var = jax.nn.relu(var)
    return var


def segment_std(data, segment_ids, num_segments, mask=None, count=None,
                eps_inside: bool = True):
    """sqrt(var + EPS).

    ``eps_inside=True``: EPS added inside sqrt (dense ``aggregators.py:55-58``,
    DGL ``aggregators.py:18-19``, and PyG ``aggregators.py:31-32`` all do
    sqrt(relu(var) + 1e-5)).
    """
    var = segment_var(data, segment_ids, num_segments, mask, count, relu_clamp=True)
    return jnp.sqrt(var + EPS)


def segment_softmax_weights(logits, segment_ids, num_segments, mask=None,
                            stable: bool = True):
    """Per-segment softmax weights over the data rows ([E, ...] -> [E, ...]).

    Used for GAT edge attention (dense reference masks with -9e15 then softmax
    over source nodes, ``models/pytorch/gat/layer.py:30-36``).
    """
    if stable:
        seg_max = jax.ops.segment_max(_apply_mask(logits, mask, -jnp.inf),
                                      segment_ids, num_segments=num_segments)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        logits = logits - seg_max[segment_ids]
    ex = jnp.exp(logits)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (ex.ndim - mask.ndim))
        ex = jnp.where(m, ex, 0.0)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, jnp.finfo(ex.dtype).tiny)
    return ex / denom[segment_ids]


def segment_moment(data, segment_ids, num_segments, n: int, mask=None, count=None):
    """sign(m_n) * (|m_n| + EPS)^(1/n) with m_n = E[(X - E[X])^n] per segment.

    Dense reference: ``models/pytorch/pna/aggregators.py:121-131``.
    """
    if count is None:
        count = segment_count(segment_ids, num_segments, mask, dtype=data.dtype)
    mean = segment_mean(data, segment_ids, num_segments, mask, count)
    centered = data - mean[segment_ids]
    m_n = segment_mean(centered ** n, segment_ids, num_segments, mask, count)
    return jnp.sign(m_n) * jnp.power(jnp.abs(m_n) + EPS, 1.0 / n)
