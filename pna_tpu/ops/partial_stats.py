"""Partial moment statistics — decomposable aggregation for comm/compute
overlap in the edge-partitioned distributed path.

The PNA aggregator bank over {mean, sum, max, min, var, std} factors through
the commutative-monoid sketch (sum, sum-of-squares, count, max, min): partial
sketches computed over *disjoint edge subsets* combine exactly.  The
distributed step exploits this by aggregating LOCAL-sender edges (no
dependence on the halo ``all_to_all``) and BOUNDARY edges (senders arrive in
the halo buffer) separately, then combining — so XLA's latency-hiding
scheduler can overlap the local partial with the collective
(``pna_tpu.parallel.partition.SplitEdges``).

Numerics match the segment bank (`pna_tpu.ops.segment`): empty segments -> 0
for max/min, EPS inside the std sqrt, relu var clamp
(models/pytorch/pna/aggregators.py:55-73 formula family).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

EPS = 1e-5
BIG = 3.0e38

SUPPORTED = ('mean', 'sum', 'max', 'min', 'var', 'std')


def supports(aggregators: Sequence[str]) -> bool:
    return all(a in SUPPORTED for a in aggregators)


class MomentSketch(NamedTuple):
    s: jnp.ndarray      # [N, F] sum
    sq: jnp.ndarray     # [N, F] sum of squares
    cnt: jnp.ndarray    # [N]    edge count
    mx: jnp.ndarray     # [N, F] running max (-BIG when empty)
    mn: jnp.ndarray     # [N, F] running min (+BIG when empty)


def partial_sketch(msg: jnp.ndarray, receivers: jnp.ndarray,
                   num_segments: int, mask=None) -> MomentSketch:
    """Moment sketch of one edge subset: msg [E, F] -> per-node partials."""
    msg = msg.astype(jnp.float32)
    if mask is not None:
        m = mask[:, None]
        s_in = jnp.where(m, msg, 0.0)
        mx_in = jnp.where(m, msg, -BIG)
        mn_in = jnp.where(m, msg, BIG)
        ones = mask.astype(jnp.float32)
    else:
        s_in, mx_in, mn_in = msg, msg, msg
        ones = jnp.ones(msg.shape[:1], jnp.float32)
    s = jax.ops.segment_sum(s_in, receivers, num_segments=num_segments)
    sq = jax.ops.segment_sum(s_in * msg, receivers,
                             num_segments=num_segments)
    cnt = jax.ops.segment_sum(ones, receivers, num_segments=num_segments)
    mx = jax.ops.segment_max(mx_in, receivers, num_segments=num_segments)
    mn = jax.ops.segment_min(mn_in, receivers, num_segments=num_segments)
    # segment_max of an empty segment yields the dtype min — normalize to -BIG
    mx = jnp.maximum(mx, -BIG)
    mn = jnp.minimum(mn, BIG)
    return MomentSketch(s, sq, cnt, mx, mn)


def combine(a: MomentSketch, b: MomentSketch) -> MomentSketch:
    return MomentSketch(a.s + b.s, a.sq + b.sq, a.cnt + b.cnt,
                        jnp.maximum(a.mx, b.mx), jnp.minimum(a.mn, b.mn))


def finalize_bank(sk: MomentSketch,
                  aggregators: Sequence[str]) -> jnp.ndarray:
    """Sketch -> Z [N, A, F] with the reference bank's semantics."""
    cnt1 = jnp.maximum(sk.cnt, 1.0)[:, None]
    nonempty = (sk.cnt > 0)[:, None]
    mean = sk.s / cnt1
    table = {}

    def get(name):
        if name in table:
            return table[name]
        if name == 'sum':
            v = sk.s
        elif name == 'mean':
            v = mean
        elif name == 'max':
            v = jnp.where(nonempty, sk.mx, 0.0)
        elif name == 'min':
            v = jnp.where(nonempty, sk.mn, 0.0)
        elif name == 'var':
            v = jax.nn.relu(sk.sq / cnt1 - mean * mean)
        elif name == 'std':
            v = jnp.sqrt(get('var') + EPS)
        else:
            raise ValueError(name)
        table[name] = v
        return v

    return jnp.stack([get(a) for a in aggregators], axis=1)
