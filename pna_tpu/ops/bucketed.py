"""Degree-bucketed aggregation — the gather/scatter-free TPU aggregation path.

With the batcher's degree-bucketed layout (``pna_tpu.graph.batch_graphs(
bucket_by_degree=True)``), bucket (d, c) owns a dense, contiguous
``[c, d, F]`` view of the edge-message array whose row k holds exactly the d
in-edges of node ``node_off + k``.  Every PNA aggregator then reduces over a
*static* axis — plain VPU reductions XLA fuses into one pass:

* no neighbour gather (the ELL path's [N, D_max, F] materialization),
* no scatter anywhere (forward or backward — the VJP of an axis reduction
  is a broadcast, and of max/min an equality select),
* the receiver-side gather ``h[receivers]`` degenerates to a broadcast
  (``expand_to_edges``), as does the backward of the aggregation.

This is the static-shape redesign of DGL's *runtime* degree bucketing
(``models/dgl/pna_layer.py:45-50`` buckets mailboxes per forward pass in
C++); here the bucketing happens once at batch construction and the compiled
program is fully dense.  Dummy bucket slots are masked nodes whose results
are discarded downstream, so no masks appear in the compute at all.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5
BIG = 3.0e38          # finite +-inf stand-in (reduce identities)

# aggregators the fused custom-VJP bank covers (benchmark configs)
FUSED = ('mean', 'sum', 'max', 'min', 'var', 'std')

# aggregators computable per dense [c, d, F] bucket view
SUPPORTED = ('mean', 'sum', 'max', 'min', 'var', 'std',
             'moment3', 'moment4', 'moment5', 'softmax', 'softmin')


def supports(aggregators: Sequence[str]) -> bool:
    return all(a in SUPPORTED for a in aggregators)


def degrees(spec: Tuple[Tuple[int, int], ...]) -> np.ndarray:
    """Static per-node in-degree vector implied by the bucket spec."""
    return np.concatenate([np.full(c, d, np.float32) for d, c in spec])


def expand_to_edges(x: jnp.ndarray,
                    spec: Tuple[Tuple[int, int], ...]) -> jnp.ndarray:
    """Broadcast per-node rows to their in-edges: [N, ...] -> [E, ...].
    The bucketed equivalent of ``x[graph.receivers]`` — no gather."""
    parts = []
    off = 0
    for d, c in spec:
        if d > 0:
            seg = x[off:off + c]
            parts.append(jnp.broadcast_to(seg[:, None], (c, d) + x.shape[1:])
                         .reshape((c * d,) + x.shape[1:]))
        off += c
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def reduce_from_edges(y: jnp.ndarray, spec: Tuple[Tuple[int, int], ...],
                      reduce: str = 'sum') -> jnp.ndarray:
    """Per-node reduction over in-edges: [E, ...] -> [N, ...] (the transpose
    of :func:`expand_to_edges`)."""
    parts = []
    eoff = 0
    for d, c in spec:
        if d == 0:
            parts.append(jnp.zeros((c,) + y.shape[1:], y.dtype))
        else:
            seg = y[eoff:eoff + c * d].reshape((c, d) + y.shape[1:])
            parts.append(getattr(jnp, reduce)(seg, axis=1))
            eoff += c * d
    return jnp.concatenate(parts, axis=0)


def raw_bank(msg: jnp.ndarray, spec: Tuple[Tuple[int, int], ...],
             aggregators: Sequence[str],
             in_deg: jnp.ndarray = None) -> jnp.ndarray:
    """Aggregator bank over bucketed edge messages -> Z [N, A, F] (f32).

    ``in_deg`` [N] gives the true in-degree when bucket classes are wider
    than a node's degree (dummy slots are masked via an iota compare — no
    mask tensor in memory).  Matches the reference formulas exactly: EPS
    inside the std sqrt (models/pytorch/pna/aggregators.py:57), var relu
    clamp (:72), moment_n root with EPS (:96-147), softmax/softmin weighting
    (:107-127); empty neighbourhoods (degree 0) produce 0.
    """
    F = msg.shape[-1]
    out = []
    eoff = noff = 0
    for d, c in spec:
        if d == 0:
            out.append(jnp.zeros((c, len(aggregators), F), jnp.float32))
            noff += c
            continue
        seg = msg[eoff:eoff + c * d].reshape(c, d, F).astype(jnp.float32)
        eoff += c * d
        if in_deg is None:
            cnt = jnp.full((c, 1), float(d), jnp.float32)
            m = None
        else:
            cnt = in_deg[noff:noff + c].astype(jnp.float32)[:, None]  # [c,1]
            m = (jax.lax.broadcasted_iota(jnp.float32, (1, d, 1), 1)
                 < cnt[:, :, None])                                # [c,d,1]
        noff += c
        cnt1 = jnp.maximum(cnt, 1.0)
        nonempty = cnt > 0
        stats: Dict[str, jnp.ndarray] = {}

        def masked(x, fill=0.0):
            return x if m is None else jnp.where(m, x, fill)

        def get(name):
            if name in stats:
                return stats[name]
            if name == 'sum':
                v = jnp.sum(masked(seg), axis=1)
            elif name == 'mean':
                v = get('sum') / cnt1
            elif name == 'max':
                v = jnp.max(masked(seg, -jnp.inf), axis=1)
                v = jnp.where(nonempty, v, 0.0)
            elif name == 'min':
                v = jnp.min(masked(seg, jnp.inf), axis=1)
                v = jnp.where(nonempty, v, 0.0)
            elif name == 'var':
                v = jax.nn.relu(jnp.sum(masked(seg * seg), axis=1) / cnt1
                                - get('mean') ** 2)
            elif name == 'std':
                v = jnp.sqrt(get('var') + EPS)
            elif name.startswith('moment'):
                n = int(name[len('moment'):])
                ctr = masked(seg - get('mean')[:, None])
                mom = jnp.sum(ctr ** n, axis=1) / cnt1
                # n-th root preserving sign, EPS inside the root
                # (models/pytorch/pna/aggregators.py:96-147)
                v = (jnp.sign(mom)
                     * jnp.power(jnp.abs(mom) + EPS, 1.0 / n))
            elif name in ('softmax', 'softmin'):
                sgn = 1.0 if name == 'softmax' else -1.0
                z = sgn * seg
                zmax = jnp.max(masked(z, -jnp.inf), axis=1, keepdims=True)
                zmax = jnp.where(jnp.isfinite(zmax), zmax, 0.0)
                ex = masked(jnp.exp(z - zmax))
                denom = jnp.where(cnt > 0, jnp.sum(ex, axis=1), 1.0)
                v = jnp.sum(ex * seg, axis=1) / denom
            else:
                raise ValueError(name)
            stats[name] = v
            return v

        out.append(jnp.stack([get(a) for a in aggregators], axis=1))
    return jnp.concatenate(out, axis=0)        # [N, A, F]


def moment_stats(msg: jnp.ndarray, spec: Tuple[Tuple[int, int], ...],
                 in_deg: jnp.ndarray = None):
    """Per-node moment sketch over bucketed edge messages — the UNSTACKED
    sibling of :func:`raw_bank` for the {mean,sum,max,min,var,std} family.

    Returns ``(s, sq, mx, mn, cnt1, d0)``: sum, sum-of-squares, max, min
    (each [N, F] f32; empty neighbourhoods -> 0), clamped count [N, 1], and
    the static [N] bool mask of degree-0 bucket slots (whose aggregator
    outputs are defined as exactly 0, matching raw_bank).

    Why: stacking A aggregator outputs into Z [N, A, F] forces XLA to
    materialize and re-lay-out a wide 3-D tensor between the bank and the
    posttrans matmul (measured: 2 x 44 MB copy+reshape per layer plus a
    [N, A*F] relayout on the flagship step, benchmarks/byte_audit.py).  The
    caller instead derives each aggregator elementwise from these moments
    and contracts it immediately against its posttrans weight slice — the
    stacked tensor never exists.
    """
    F = msg.shape[-1]
    ss, sqs, mxs, mns, cnts = [], [], [], [], []
    d0 = np.zeros(sum(c for _, c in spec), bool)
    noff0 = 0
    for d, c in spec:
        if d == 0:
            d0[noff0:noff0 + c] = True
        noff0 += c
    for d, c, seg, cnt, m, noff in _bucket_views(msg, spec, in_deg):
        if seg is None:
            z = jnp.zeros((c, F), jnp.float32)
            ss.append(z), sqs.append(z), mxs.append(z), mns.append(z)
            cnts.append(jnp.ones((c, 1), jnp.float32))
            continue
        s = jnp.sum(seg if m is None else jnp.where(m, seg, 0.0), axis=1)
        sq = jnp.sum(seg * seg if m is None
                     else jnp.where(m, seg * seg, 0.0), axis=1)
        mx = jnp.max(seg if m is None else jnp.where(m, seg, -jnp.inf),
                     axis=1)
        mn = jnp.min(seg if m is None else jnp.where(m, seg, jnp.inf),
                     axis=1)
        nonempty = cnt > 0
        mx = jnp.where(nonempty, mx, 0.0)
        mn = jnp.where(nonempty, mn, 0.0)
        ss.append(s), sqs.append(sq), mxs.append(mx), mns.append(mn)
        cnts.append(jnp.maximum(cnt, 1.0))
    cat = lambda xs: jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
    return cat(ss), cat(sqs), cat(mxs), cat(mns), cat(cnts), d0


def derive_aggregator(name: str, s, sq, mx, mn, cnt1, d0):
    """One aggregator [N, F] from the moment sketch — formulas identical to
    :func:`raw_bank` (EPS inside the std sqrt, var relu clamp, degree-0
    bucket slots exactly 0)."""
    if name == 'sum':
        return s
    if name == 'mean':
        return s / cnt1
    if name == 'max':
        return mx
    if name == 'min':
        return mn
    mean = s / cnt1
    var = jax.nn.relu(sq / cnt1 - mean * mean)
    if name == 'var':
        return var
    if name == 'std':
        std = jnp.sqrt(var + EPS)
        if d0.any():
            std = jnp.where(jnp.asarray(d0)[:, None], 0.0, std)
        return std
    raise ValueError(name)


MOMENT_DERIVABLE = ('mean', 'sum', 'max', 'min', 'var', 'std')


# ---------------------------------------------------------------------------
# fused bank: one variadic reduce per bucket + hand-written VJP
# ---------------------------------------------------------------------------

def _bucket_views(msg, spec, in_deg):
    """Yield (seg [c,d,F] f32, cnt [c,1], mask [c,d,1] or None, node_off)."""
    F = msg.shape[-1]
    eoff = noff = 0
    for d, c in spec:
        if d == 0:
            yield d, c, None, None, None, noff
            noff += c
            continue
        seg = msg[eoff:eoff + c * d].reshape(c, d, F).astype(jnp.float32)
        eoff += c * d
        if in_deg is None:
            cnt, m = jnp.full((c, 1), float(d), jnp.float32), None
        else:
            cnt = in_deg[noff:noff + c].astype(jnp.float32)[:, None]
            m = (jax.lax.broadcasted_iota(jnp.float32, (1, d, 1), 1)
                 < cnt[:, :, None])
        yield d, c, seg, cnt, m, noff
        noff += c


def _variadic_stats(seg, m):
    """(sum, sumsq, max, min) of one bucket in a single reduce pass."""
    s_in = seg if m is None else jnp.where(m, seg, 0.0)
    sq_in = s_in * seg
    mx_in = seg if m is None else jnp.where(m, seg, -BIG)
    mn_in = seg if m is None else jnp.where(m, seg, BIG)
    zero = jnp.zeros((), jnp.float32)
    return jax.lax.reduce(
        (s_in, sq_in, mx_in, mn_in),
        (zero, zero, jnp.float32(-BIG), jnp.float32(BIG)),
        lambda a, b: (a[0] + b[0], a[1] + b[1],
                      jnp.maximum(a[2], b[2]), jnp.minimum(a[3], b[3])),
        (1,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_raw_bank(msg, in_deg, spec, aggregators):
    """Custom-VJP bucketed bank for aggregators in FUSED: forward is one
    variadic reduce (+ one tie-count reduce) per bucket; backward is pure
    broadcasts/elementwise — no gather, no scatter, ~4x fewer XLA ops than
    autodiff of the naive per-aggregator reductions."""
    Z, _ = _fwd_impl(msg, in_deg, spec, aggregators, with_ties=False)
    return Z


def _fwd_impl(msg, in_deg, spec, aggregators, with_ties):
    F = msg.shape[-1]
    A = len(aggregators)
    outs, res_mean, res_vraw, res_std, res_mx, res_mn = [], [], [], [], [], []
    res_tmx, res_tmn, res_cnt = [], [], []
    for d, c, seg, cnt, m, noff in _bucket_views(msg, spec, in_deg):
        if seg is None:
            outs.append(jnp.zeros((c, A, F), jnp.float32))
            for r in (res_mean, res_vraw, res_mx, res_mn):
                r.append(jnp.zeros((c, F), jnp.float32))
            res_std.append(jnp.full((c, F), np.sqrt(EPS), jnp.float32))
            res_tmx.append(jnp.ones((c, F), jnp.float32))
            res_tmn.append(jnp.ones((c, F), jnp.float32))
            res_cnt.append(jnp.ones((c,), jnp.float32))
            continue
        s, sq, mx, mn = _variadic_stats(seg, m)
        nonempty = cnt > 0
        mx = jnp.where(nonempty, mx, 0.0)
        mn = jnp.where(nonempty, mn, 0.0)
        cnt1 = jnp.maximum(cnt, 1.0)
        mean = s / cnt1
        var_raw = sq / cnt1 - mean * mean
        var = jax.nn.relu(var_raw)
        std = jnp.sqrt(var + EPS)
        table = {'mean': mean, 'sum': s, 'max': mx, 'min': mn,
                 'var': var, 'std': std}
        outs.append(jnp.stack([table[a] for a in aggregators], axis=1))
        if with_ties:
            eq_mx = (seg == mx[:, None]).astype(jnp.float32)
            eq_mn = (seg == mn[:, None]).astype(jnp.float32)
            if m is not None:
                eq_mx = jnp.where(m, eq_mx, 0.0)
                eq_mn = jnp.where(m, eq_mn, 0.0)
            zero = jnp.zeros((), jnp.float32)
            tmx, tmn = jax.lax.reduce(
                (eq_mx, eq_mn), (zero, zero),
                lambda a, b: (a[0] + b[0], a[1] + b[1]), (1,))
            res_tmx.append(jnp.maximum(tmx, 1.0))
            res_tmn.append(jnp.maximum(tmn, 1.0))
        res_mean.append(mean)
        res_vraw.append(var_raw)
        res_std.append(std)
        res_mx.append(mx)
        res_mn.append(mn)
        res_cnt.append(cnt1[:, 0])
    Z = jnp.concatenate(outs, axis=0)
    if not with_ties:
        return Z, None
    res = tuple(jnp.concatenate(r, axis=0) for r in
                (res_mean, res_vraw, res_std, res_mx, res_mn,
                 res_tmx, res_tmn, res_cnt))
    return Z, res


def _fwd(msg, in_deg, spec, aggregators):
    Z, res = _fwd_impl(msg, in_deg, spec, aggregators, with_ties=True)
    return Z, (msg, in_deg) + res


def _bwd(spec, aggregators, residuals, d_Z):
    (msg, in_deg, mean, var_raw, std, mx, mn, tmx, tmn, cnt1) = residuals
    N, F = mean.shape
    g_lin = jnp.zeros((N, F), jnp.float32)
    g_quad = jnp.zeros((N, F), jnp.float32)
    g_max = jnp.zeros((N, F), jnp.float32)
    g_min = jnp.zeros((N, F), jnp.float32)
    inv_cnt = (1.0 / cnt1)[:, None]
    for i, a in enumerate(aggregators):
        dv = d_Z[:, i, :].astype(jnp.float32)
        if a == 'sum':
            g_lin = g_lin + dv
        elif a == 'mean':
            g_lin = g_lin + dv * inv_cnt
        elif a == 'max':
            g_max = g_max + dv
        elif a == 'min':
            g_min = g_min + dv
        elif a in ('var', 'std'):
            if a == 'std':
                dv = dv * (0.5 / std)
            dv = dv * (var_raw > 0).astype(jnp.float32)
            g_quad = g_quad + dv * inv_cnt
            g_lin = g_lin - dv * 2.0 * mean * inv_cnt
        else:
            raise ValueError(a)
    g_max = g_max / tmx
    g_min = g_min / tmn

    parts = []
    for d, c, seg, cnt, m, noff in _bucket_views(msg, spec, in_deg):
        if seg is None:
            continue
        sl = slice(noff, noff + c)
        dm = (g_lin[sl][:, None] + 2.0 * seg * g_quad[sl][:, None]
              + (seg == mx[sl][:, None]).astype(jnp.float32)
              * g_max[sl][:, None]
              + (seg == mn[sl][:, None]).astype(jnp.float32)
              * g_min[sl][:, None])
        if m is not None:
            dm = jnp.where(m, dm, 0.0)
        parts.append(dm.reshape(c * d, F))
    d_msg = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return d_msg.astype(msg.dtype), None


fused_raw_bank.defvjp(_fwd, _bwd)
