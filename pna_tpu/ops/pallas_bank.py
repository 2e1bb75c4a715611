"""Custom-VJP aggregation bank on the Pallas sorted-edge moment sketch.

This wires ``pna_tpu.ops.pallas_kernels.sorted_moment_sketch`` (the
hand-written fused kernel: zero gathers, zero scatters, sequential DMA over
the receiver-sorted edge list) into the layer API as a drop-in sibling of
``fused_vjp.make_raw_bank`` (ELL) and ``bucketed.raw_bank``:

* forward: one kernel launch produces {sum, sumsq, max, min}; mean/var/std
  are derived elementwise (reference formulas: EPS inside sqrt at
  models/pytorch/pna/aggregators.py:57, relu clamp :72);
* backward: the same scatter-free node-partials math as the ELL bank — the
  kernel's second pass supplies the max/min tie counts, so the backward is a
  single wide gather of per-node fields through ``receivers`` plus pure
  elementwise ops (no re-aggregation, no scatter).

Layout contract: edges sorted by receiver with CSR ``edge_ptr`` (built by
``pna_tpu.graph.batch_graphs(sort_edges=True)``).  Padded edges all target
the trailing pad node; when the caller supplies ``edge_mask`` the row
pointers are clamped to the real-edge count so pad messages (which carry
pretrans bias, not zeros) never enter any node's statistics.

Replaces the DGL ``update_all`` degree-bucketed reduce the reference
delegates to (models/dgl/pna_layer.py:61-64).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from pna_tpu.ops.fused_vjp import EPS, _AGGS, _SCALERS
from pna_tpu.ops.pallas_kernels import sorted_dmsg, sorted_moment_sketch

# backward gather strategy threshold: below this many bytes the six node
# fields are concatenated and gathered once ([E, 6F], fastest at molecular
# scale); above it they are gathered per-field so peak memory stays at one
# [E, F] term (large graphs; see BENCH_kernels.json / RESULTS_largegraph)
WIDE_GATHER_BYTES_LIMIT = 2 ** 31


def supports(aggregators: Sequence[str]) -> bool:
    return all(a in _AGGS for a in aggregators)


def _assemble(aggregators, s, sq, mx, mn, cnt):
    mean = s / cnt[:, None]
    var_raw = sq / cnt[:, None] - mean * mean
    var = jax.nn.relu(var_raw)
    std = jnp.sqrt(var + EPS)
    table = {'mean': mean, 'sum': s, 'max': mx, 'min': mn, 'var': var,
             'std': std}
    agg = jnp.stack([table[a] for a in aggregators], axis=1)    # [N, A, F]
    return agg, (mean, var_raw, std)


def _zero_ct(x):
    """Cotangent of a non-differentiated layout input (float0 for int/bool)."""
    import numpy as np
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


# edge count above which the streaming backward sweep (sorted_dmsg) is used
# by default: at 65k edges it ties the XLA wide gather (PALLAS_TPU_CHECK
# dmsg 1.36 vs 1.31 ms); at 2.5M edges it wins the whole train step 2.53x
# (RESULTS_largegraph_250k.json, measured back-to-back 2026-08-21)
BWD_KERNEL_EDGE_THRESHOLD = 256_000


def make_pallas_raw_bank(receivers: jnp.ndarray,
                         edge_mask: Optional[jnp.ndarray],
                         edge_ptr: jnp.ndarray,
                         max_degree: int = 0,
                         interpret: bool = False,
                         bwd_kernel: Optional[bool] = None):
    """Bind the graph layout; returns ``raw(msg, aggregators) -> Z [N, A, F]``
    (f32, aggregators in caller order) with a full custom VJP.

    ``max_degree``: static in-degree bound (caps the kernel's segmented-scan
    depth); 0 = unknown.  ``interpret`` runs the kernel in interpreter mode
    (CPU tests).

    ``bwd_kernel``: True = streaming Pallas backward sweep (sorted_dmsg),
    False = XLA gather backward, None (default) = pick by edge count
    (BWD_KERNEL_EDGE_THRESHOLD — the measured tie point).

    The layout arrays ride through the custom-VJP boundary as explicit
    arguments (zero cotangents), NOT closure — inside ``shard_map`` they are
    tracers, and ``custom_vjp`` does not support closed-over tracers (this is
    what lets ``kernel='pallas'`` run in the distributed step)."""
    if bwd_kernel is None:
        bwd_kernel = receivers.shape[0] >= BWD_KERNEL_EDGE_THRESHOLD
    if edge_mask is not None:
        n_real = jnp.sum(edge_mask.astype(jnp.int32))
        ptr = jnp.minimum(edge_ptr, n_real).astype(jnp.int32)
    else:
        ptr = edge_ptr.astype(jnp.int32)
    if max_degree:
        # Validate the trust-the-caller depth hint when the layout is
        # concrete (the usual case: layouts are bound outside jit).  A hint
        # below the true in-degree silently under-reduces max/min (ADVICE r2).
        import numpy as np
        try:
            true_max = int(np.max(np.diff(np.asarray(ptr))))
        except Exception:   # traced layout: cannot check at bind time
            true_max = None
        if true_max is not None and true_max > max_degree:
            raise ValueError(
                f"max_degree hint {max_degree} < true max in-degree "
                f"{true_max}: the segmented scan would under-reduce max/min")
    deg = (ptr[1:] - ptr[:-1]).astype(jnp.float32)              # [N]
    cnt = jnp.maximum(deg, 1.0)
    em = (edge_mask if edge_mask is not None
          else jnp.ones(receivers.shape, bool))

    def raw(msg, aggregators):
        return _pallas_raw(tuple(aggregators), max_degree, interpret,
                           bwd_kernel, msg, ptr, cnt, receivers, em)
    return raw


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _pallas_raw(aggregators, max_degree, interpret, bwd_kernel, msg, ptr,
                cnt, receivers, edge_mask):
    s, sq, mx, mn = sorted_moment_sketch(
        msg.astype(jnp.float32), ptr, with_ties=False,
        max_degree=max_degree, interpret=interpret)
    out, _ = _assemble(aggregators, s, sq, mx, mn, cnt)
    return out


def _pallas_raw_fwd(aggregators, max_degree, interpret, bwd_kernel, msg, ptr,
                    cnt, receivers, edge_mask):
    s, sq, mx, mn, ties_mx, ties_mn = sorted_moment_sketch(
        msg.astype(jnp.float32), ptr, with_ties=True,
        max_degree=max_degree, interpret=interpret)
    out, (mean, var_raw, std) = _assemble(aggregators, s, sq, mx, mn, cnt)
    return out, (msg, mean, var_raw, std, mx, mn, ties_mx, ties_mn,
                 ptr, cnt, receivers, edge_mask)


def _pallas_raw_bwd(aggregators, max_degree, interpret, bwd_kernel, res,
                    d_agg):
    (msg, mean, var_raw, std, mx, mn, ties_mx, ties_mn,
     ptr, cnt, receivers, edge_mask) = res
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

    E = receivers.shape[0]
    if bwd_kernel:
        # streaming Pallas sweep: the node fields are expanded to edges with
        # one-hot MXU matmuls over the receiver-sorted layout — no [E, 6F]
        # gather tensor, no gather at all (pallas_kernels.sorted_dmsg)
        d_msg = sorted_dmsg(msg32, ptr, g_lin, g_quad, g_max, g_min, mx, mn,
                            interpret=interpret)
    elif E * 6 * F * 4 <= WIDE_GATHER_BYTES_LIMIT:
        # one wide gather of the six node fields through receivers (TPU
        # gather cost is per-row, flat in width)
        fields = jnp.concatenate([g_lin, g_quad, g_max, g_min, mx, mn],
                                 axis=-1)                   # [N, 6F]
        fe = fields[receivers]                              # [E, 6F]
        d_msg = (fe[:, :F] + 2.0 * msg32 * fe[:, F:2 * F]
                 + (msg32 == fe[:, 4 * F:5 * F]).astype(jnp.float32)
                 * fe[:, 2 * F:3 * F]
                 + (msg32 == fe[:, 5 * F:]).astype(jnp.float32)
                 * fe[:, 3 * F:4 * F])
    else:
        # large-graph path: the [E, 6F] concat would be GBs; accumulate
        # narrow per-field gathers instead (XLA fuses each gather into
        # its consumer, peak extra memory stays at one [E, F] term)
        d_msg = (g_lin[receivers] + 2.0 * msg32 * g_quad[receivers]
                 + (msg32 == mx[receivers]).astype(jnp.float32)
                 * g_max[receivers]
                 + (msg32 == mn[receivers]).astype(jnp.float32)
                 * g_min[receivers])
    d_msg = jnp.where(edge_mask[:, None], d_msg, 0.0)
    return (d_msg.astype(msg.dtype), _zero_ct(ptr), jnp.zeros_like(cnt),
            _zero_ct(receivers), _zero_ct(edge_mask))


_pallas_raw.defvjp(_pallas_raw_fwd, _pallas_raw_bwd)
