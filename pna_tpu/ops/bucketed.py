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

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5

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
             aggregators: Sequence[str]) -> jnp.ndarray:
    """Aggregator bank over bucketed edge messages -> Z [N, A, F] (f32).

    Matches the reference formulas exactly: EPS inside the std sqrt
    (models/pytorch/pna/aggregators.py:57), var relu clamp (:72), moment_n
    root with EPS (:96-147), softmax/softmin weighting (:107-127); empty
    neighbourhoods (d = 0) produce 0.
    """
    F = msg.shape[-1]
    out = []
    eoff = 0
    for d, c in spec:
        if d == 0:
            out.append(jnp.zeros((c, len(aggregators), F), jnp.float32))
            continue
        seg = msg[eoff:eoff + c * d].reshape(c, d, F).astype(jnp.float32)
        eoff += c * d
        stats: Dict[str, jnp.ndarray] = {}

        def get(name):
            if name in stats:
                return stats[name]
            if name == 'sum':
                v = jnp.sum(seg, axis=1)
            elif name == 'mean':
                v = get('sum') / d
            elif name == 'max':
                v = jnp.max(seg, axis=1)
            elif name == 'min':
                v = jnp.min(seg, axis=1)
            elif name == 'var':
                v = jax.nn.relu(jnp.sum(seg * seg, axis=1) / d
                                - get('mean') ** 2)
            elif name == 'std':
                v = jnp.sqrt(get('var') + EPS)
            elif name.startswith('moment'):
                n = int(name[len('moment'):])
                ctr = seg - get('mean')[:, None]
                mom = jnp.sum(ctr ** n, axis=1) / d
                # n-th root preserving sign, EPS inside the root
                # (models/pytorch/pna/aggregators.py:96-147)
                v = (jnp.sign(mom)
                     * jnp.power(jnp.abs(mom) + EPS, 1.0 / n))
            elif name in ('softmax', 'softmin'):
                sgn = 1.0 if name == 'softmax' else -1.0
                w = jax.nn.softmax(sgn * seg, axis=1)
                v = jnp.sum(w * seg, axis=1)
            else:
                raise ValueError(name)
            stats[name] = v
            return v

        out.append(jnp.stack([get(a) for a in aggregators], axis=1))
    return jnp.concatenate(out, axis=0)        # [N, A, F]
