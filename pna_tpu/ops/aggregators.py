"""Aggregator banks.

Two families, both pure functions:

* **Dense** aggregators on ``X`` [B, N, N, D] with ``adj`` [B, N, N] — exact
  semantic match of ``models/pytorch/pna/aggregators.py:10-152`` (13 aggregators,
  EPS placement included).  Dense is the fast path on TPU for small graphs
  (N <= ~128): every reduction is a masked elementwise + reduce that XLA fuses,
  and the surrounding matmuls hit the MXU.
* **Segment** aggregators on edge messages ``msg`` [E, D] with receiver ids —
  the sparse path replacing DGL mailboxes / torch_scatter
  (``models/dgl/aggregators.py``, ``models/pytorch_geometric/aggregators.py``).

Signatures:
  dense:   f(X, adj, self_loop=False) -> [B, N, D]
  segment: f(ctx: SegmentCtx) -> [N, D]   where ctx precomputes shared terms
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pna_tpu.ops import segment as seg

EPS = 1e-5  # models/pytorch/pna/aggregators.py:4


# ---------------------------------------------------------------------------
# Dense aggregators (B x N x N x D -> B x N x D)
# ---------------------------------------------------------------------------

def _with_self_loop(adj):
    n = adj.shape[-1]
    return adj + jnp.eye(n, dtype=adj.dtype)[None]


def dense_degree(adj, keepdims=True):
    return jnp.sum(adj, axis=-1, keepdims=keepdims)


def aggregate_identity(X, adj, self_loop=False):
    # diagonal of X (models/pytorch/pna/aggregators.py:10-14)
    n = X.shape[1]
    eye = jnp.eye(n, dtype=X.dtype).reshape(1, n, n, 1)
    return jnp.sum(X * eye, axis=2)


def aggregate_mean(X, adj, self_loop=False):
    # D^{-1} A X (aggregators.py:17-26); divides by zero on isolated nodes,
    # exactly like the reference.
    if self_loop:
        adj = _with_self_loop(adj)
    D = dense_degree(adj)
    X_sum = jnp.sum(X * adj[..., None], axis=2)
    return X_sum / D


def aggregate_max(X, adj, self_loop=False):
    # masked max (aggregators.py:29-38).
    # QUIRK (faithfully reproduced): the reference reduces over dim -3 (the
    # *first* node axis) while mean/sum reduce over dim 2 — so max/min aggregate
    # the transposed messages X[j, i] instead of X[i, j].  With the symmetric
    # adjacencies of all reference workloads the neighbour sets coincide but the
    # message values differ.  The segment bank uses the consistent direction;
    # tests/test_aggregators.py covers the transposition explicitly.
    if self_loop:
        adj = _with_self_loop(adj)
    M = jnp.where(adj[..., None] > 0.0, X, -jnp.inf)
    return jnp.max(M, axis=-3)


def aggregate_min(X, adj, self_loop=False):
    # masked min (aggregators.py:41-50)
    if self_loop:
        adj = _with_self_loop(adj)
    M = jnp.where(adj[..., None] > 0.0, X, jnp.inf)
    return jnp.min(M, axis=-3)


def aggregate_var(X, adj, self_loop=False):
    # relu(E[X^2] - E[X]^2) (aggregators.py:61-73)
    if self_loop:
        adj = _with_self_loop(adj)
    D = dense_degree(adj)
    X_sum_squares = jnp.sum(X * X * adj[..., None], axis=2)
    X_mean_squares = X_sum_squares / D
    X_mean = aggregate_mean(X, adj)
    return jax.nn.relu(X_mean_squares - X_mean * X_mean)


def aggregate_std(X, adj, self_loop=False):
    # sqrt(var + EPS) (aggregators.py:53-58)
    return jnp.sqrt(aggregate_var(X, adj, self_loop) + EPS)


def aggregate_sum(X, adj, self_loop=False):
    # A X (aggregators.py:76-83)
    if self_loop:
        adj = _with_self_loop(adj)
    return jnp.sum(X * adj[..., None], axis=2)


def aggregate_normalised_mean(X, adj, self_loop=False):
    # D^{-1/2} A D^{-1/2} X (aggregators.py:86-98)
    if self_loop:
        adj = _with_self_loop(adj)
    d = jnp.sum(adj, axis=-1)  # [B, N]
    r = jnp.power(d, -0.5)
    norm_adj = adj * r[:, :, None] * r[:, None, :]
    return jnp.sum(X * norm_adj[..., None], axis=2)


def aggregate_softmax(X, adj, self_loop=False):
    # sum_i x_i * exp(x_i) / sum_j exp(x_j) over the neighbourhood
    # (aggregators.py:101-114; note: raw exp, no max-subtraction — parity).
    if self_loop:
        adj = _with_self_loop(adj)
    X_exp = jnp.exp(X) * adj[..., None]
    X_sum = jnp.sum(X_exp, axis=2, keepdims=True)
    return jnp.sum((X_exp / X_sum) * X, axis=2)


def aggregate_softmin(X, adj, self_loop=False):
    # aggregators.py:117-119
    return -aggregate_softmax(-X, adj, self_loop)


def aggregate_moment(X, adj, self_loop=False, n=3):
    # sign(m_n)*(|m_n|+EPS)^(1/n), m_n = E[(X-E[X])^n] (aggregators.py:122-133)
    if self_loop:
        adj = _with_self_loop(adj)
    D = dense_degree(adj)
    X_mean = aggregate_mean(X, adj)
    X_n = jnp.sum(((X - X_mean[:, :, None, :]) ** n) * adj[..., None], axis=2) / D
    return jnp.sign(X_n) * jnp.power(jnp.abs(X_n) + EPS, 1.0 / n)


DENSE_AGGREGATORS: Dict[str, Callable] = {
    'mean': aggregate_mean,
    'sum': aggregate_sum,
    'max': aggregate_max,
    'min': aggregate_min,
    'identity': aggregate_identity,
    'std': aggregate_std,
    'var': aggregate_var,
    'normalised_mean': aggregate_normalised_mean,
    'softmax': aggregate_softmax,
    'softmin': aggregate_softmin,
    'moment3': functools.partial(aggregate_moment, n=3),
    'moment4': functools.partial(aggregate_moment, n=4),
    'moment5': functools.partial(aggregate_moment, n=5),
}


# ---------------------------------------------------------------------------
# Segment aggregators (edge messages -> node features)
# ---------------------------------------------------------------------------

@struct.dataclass
class SegmentCtx:
    """Shared context for a bank of segment aggregations over one edge set.

    Precomputes the degree/count once so the bank of aggregators reuses it —
    the function-bank equivalent of the fused kernel's single pass.
    """
    msg: jnp.ndarray            # [E, D] edge messages
    receivers: jnp.ndarray      # [E] int32
    num_nodes: int = struct.field(pytree_node=False)
    mask: Optional[jnp.ndarray] = None       # [E] bool
    count: Optional[jnp.ndarray] = None      # [N] float (in-degree)
    senders: Optional[jnp.ndarray] = None    # [E] (needed by normalised_mean)
    self_msg: Optional[jnp.ndarray] = None   # [N, D] (needed by identity)

    @classmethod
    def create(cls, msg, receivers, num_nodes, mask=None, senders=None,
               self_msg=None):
        count = seg.segment_count(receivers, num_nodes, mask, dtype=msg.dtype)
        return cls(msg=msg, receivers=receivers, num_nodes=num_nodes, mask=mask,
                   count=count, senders=senders, self_msg=self_msg)


def seg_mean(ctx: SegmentCtx):
    return seg.segment_mean(ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask, ctx.count)


def seg_sum(ctx: SegmentCtx):
    return seg.segment_sum(ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask)


def seg_max(ctx: SegmentCtx):
    return seg.segment_max(ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask)


def seg_min(ctx: SegmentCtx):
    return seg.segment_min(ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask)


def seg_var(ctx: SegmentCtx):
    return seg.segment_var(ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask, ctx.count)


def seg_std(ctx: SegmentCtx):
    return seg.segment_std(ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask, ctx.count)


def seg_identity(ctx: SegmentCtx):
    # Dense 'identity' picks the diagonal message m_ii (aggregators.py:10-14);
    # in edge-list form that is the node's message to itself, supplied by the
    # layer as ctx.self_msg.
    if ctx.self_msg is None:
        raise ValueError("identity aggregator requires ctx.self_msg")
    return ctx.self_msg


def seg_normalised_mean(ctx: SegmentCtx):
    # sum_j adj_ij / sqrt(D_i D_j) * m_ij (dense aggregators.py:86-98)
    if ctx.senders is None:
        raise ValueError("normalised_mean requires ctx.senders")
    out_deg = seg.segment_count(ctx.senders, ctx.num_nodes, ctx.mask, dtype=ctx.msg.dtype)
    # dense uses row-sum degree for both factors (D from sum over axis -1)
    r = jax.lax.rsqrt(jnp.maximum(ctx.count, 1e-30))
    r_out = jax.lax.rsqrt(jnp.maximum(out_deg, 1e-30))
    w = r[ctx.receivers] * r_out[ctx.senders]
    return seg.segment_sum(ctx.msg * w[:, None], ctx.receivers, ctx.num_nodes, ctx.mask)


def seg_softmax(ctx: SegmentCtx):
    # sum_i x_i * exp(x_i)/sum_j exp(x_j), per feature (dense aggregators.py:101-114)
    w = seg.segment_softmax_weights(ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask,
                                    stable=True)
    return seg.segment_sum(w * ctx.msg, ctx.receivers, ctx.num_nodes, ctx.mask)


def seg_softmin(ctx: SegmentCtx):
    neg = ctx.replace(msg=-ctx.msg)
    return -seg_softmax(neg)


def seg_moment(ctx: SegmentCtx, n=3):
    return seg.segment_moment(ctx.msg, ctx.receivers, ctx.num_nodes, n,
                              ctx.mask, ctx.count)


SEGMENT_AGGREGATORS: Dict[str, Callable] = {
    'mean': seg_mean,
    'sum': seg_sum,
    'max': seg_max,
    'min': seg_min,
    'identity': seg_identity,
    'std': seg_std,
    'var': seg_var,
    'normalised_mean': seg_normalised_mean,
    'softmax': seg_softmax,
    'softmin': seg_softmin,
    'moment3': functools.partial(seg_moment, n=3),
    'moment4': functools.partial(seg_moment, n=4),
    'moment5': functools.partial(seg_moment, n=5),
}
