"""Fully-fused PNA layer aggregation: pretrans + moment sketch in ONE Pallas
kernel per pass — the [E, F] edge-message tensor never exists in HBM.

This is the per-layer fused kernel VERDICT r4 scoped (item 2): the forward is
``pna_tpu.ops.pallas_kernels.sorted_pretrans_sketch`` (messages formed in
VMEM: sender-row gather from a resident u tile + one-hot receiver matmul +
edge-feature matmul, then {sum, sumsq, max, min, ties} accumulated in the
same sweep); the backward is ``sorted_pretrans_dmsg`` (same sweep structure,
recomputing the message with bit-identical arithmetic so the max/min tie
membership test is exact, then expanding the node gradient fields to edges
and emitting d_msg + the receiver gradient d_v).  Outside the kernels only
node-level [N, F] math and the sender scatter-add remain.

Replaces the DGL ``update_all`` engine the reference delegates to
(/root/reference/models/dgl/pna_layer.py:61-64) for the layer's entire
message path.  Layout contract: receiver-sorted edges with CSR ``edge_ptr``
(``batch_graphs(sort_edges=True)``), u feature tile resident in VMEM
(``pretrans_fits_vmem``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pna_tpu.ops.fused_vjp import _AGGS
from pna_tpu.ops.pallas_bank import _assemble, _zero_ct
from pna_tpu.ops.pallas_kernels import (pretrans_fits_vmem,
                                        sorted_pretrans_dmsg,
                                        sorted_pretrans_sketch)


def supports(aggregators) -> bool:
    return all(a in _AGGS for a in aggregators)


def make_fused_pretrans_bank(senders: jnp.ndarray,
                             receivers: jnp.ndarray,
                             edge_mask: Optional[jnp.ndarray],
                             edge_ptr: jnp.ndarray,
                             max_degree: int = 0,
                             interpret: bool = False):
    """Bind the sorted-edge layout; returns
    ``fused(u, v, ef, ke, aggregators) -> Z [N, A, F]`` with a full custom
    VJP over (u, v, ef, ke).

    u [N, F]: sender-side pretransformed features (h @ W_src, compute dtype)
    v [N, F]: receiver-side term incl. bias (h @ W_dst + b0)
    ef [E, Fe] / ke [Fe, F]: optional raw edge features + pretrans weight
      (pass None, None when the layer has no edge features)

    The layout arrays ride through the custom-VJP boundary as explicit
    arguments (zero cotangents) so the bank works inside shard_map."""
    if edge_mask is not None:
        n_real = jnp.sum(edge_mask.astype(jnp.int32))
        ptr = jnp.minimum(edge_ptr, n_real).astype(jnp.int32)
    else:
        ptr = edge_ptr.astype(jnp.int32)
    deg = (ptr[1:] - ptr[:-1]).astype(jnp.float32)
    cnt = jnp.maximum(deg, 1.0)
    em = (edge_mask if edge_mask is not None
          else jnp.ones(receivers.shape, bool))

    def fused(u, v, ef, ke, aggregators):
        if ef is None:
            return _fused_noe(tuple(aggregators), max_degree, interpret,
                              u, v, ptr, cnt, senders, em)
        return _fused_e(tuple(aggregators), max_degree, interpret,
                        u, v, ef, ke, ptr, cnt, senders, em)
    return fused


def _fwd_common(aggregators, max_degree, interpret, u, v, ptr, cnt, senders,
                ef=None, ke=None):
    s, sq, mx, mn, tmx, tmn = sorted_pretrans_sketch(
        u, v, senders, ptr, e_feats=ef, ke=ke, with_ties=True,
        max_degree=max_degree, interpret=interpret)
    out, (mean, var_raw, std) = _assemble(aggregators, s, sq, mx, mn, cnt)
    return out, (mean, var_raw, std, mx, mn, tmx, tmn)


def _node_fields(aggregators, res_stats, cnt, d_agg):
    """Collapse d_agg [N, A, F] into the six node gradient fields the
    backward sweep expands (same math as pallas_bank._pallas_raw_bwd)."""
    mean, var_raw, std, mx, mn, tmx, tmn = res_stats
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
    g_max = g_max / tmx
    g_min = g_min / tmn
    return g_lin, g_quad, g_max, g_min, mx, mn


# ---------------- no-edge-feature variant ----------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_noe(aggregators, max_degree, interpret, u, v, ptr, cnt, senders,
               edge_mask):
    out, _ = _fwd_common(aggregators, max_degree, interpret, u, v, ptr, cnt,
                         senders)
    return out


def _fused_noe_fwd(aggregators, max_degree, interpret, u, v, ptr, cnt,
                   senders, edge_mask):
    out, stats = _fwd_common(aggregators, max_degree, interpret, u, v, ptr,
                             cnt, senders)
    return out, (u, v, ptr, cnt, senders, edge_mask, stats)


def _fused_noe_bwd(aggregators, max_degree, interpret, res, d_agg):
    u, v, ptr, cnt, senders, edge_mask, stats = res
    fields = _node_fields(aggregators, stats, cnt, d_agg)
    d_msg, d_v = sorted_pretrans_dmsg(u, v, senders, ptr, *fields,
                                      interpret=interpret)
    d_msg = jnp.where(edge_mask[:, None], d_msg, 0)
    d_u = jax.ops.segment_sum(d_msg, senders, num_segments=u.shape[0])
    return (d_u.astype(u.dtype), d_v.astype(v.dtype), _zero_ct(ptr),
            jnp.zeros_like(cnt), _zero_ct(senders), _zero_ct(edge_mask))


_fused_noe.defvjp(_fused_noe_fwd, _fused_noe_bwd)


# ---------------- edge-feature variant ----------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_e(aggregators, max_degree, interpret, u, v, ef, ke, ptr, cnt,
             senders, edge_mask):
    out, _ = _fwd_common(aggregators, max_degree, interpret, u, v, ptr, cnt,
                         senders, ef=ef, ke=ke)
    return out


def _fused_e_fwd(aggregators, max_degree, interpret, u, v, ef, ke, ptr, cnt,
                 senders, edge_mask):
    out, stats = _fwd_common(aggregators, max_degree, interpret, u, v, ptr,
                             cnt, senders, ef=ef, ke=ke)
    return out, (u, v, ef, ke, ptr, cnt, senders, edge_mask, stats)


def _fused_e_bwd(aggregators, max_degree, interpret, res, d_agg):
    u, v, ef, ke, ptr, cnt, senders, edge_mask, stats = res
    fields = _node_fields(aggregators, stats, cnt, d_agg)
    d_msg, d_v = sorted_pretrans_dmsg(u, v, senders, ptr, *fields,
                                      e_feats=ef, ke=ke, interpret=interpret)
    d_msg = jnp.where(edge_mask[:, None], d_msg, 0)
    d_u = jax.ops.segment_sum(d_msg, senders, num_segments=u.shape[0])
    d_ke = jnp.dot(ef.T.astype(jnp.float32), d_msg.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    d_ef = jnp.dot(d_msg.astype(jnp.float32), ke.T.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return (d_u.astype(u.dtype), d_v.astype(v.dtype), d_ef.astype(ef.dtype),
            d_ke.astype(ke.dtype), _zero_ct(ptr), jnp.zeros_like(cnt),
            _zero_ct(senders), _zero_ct(edge_mask))


_fused_e.defvjp(_fused_e_fwd, _fused_e_bwd)
