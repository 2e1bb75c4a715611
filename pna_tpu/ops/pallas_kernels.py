"""Pallas TPU kernel: fused multi-aggregator segment reduction over a
receiver-sorted edge list.

This is the hand-written core op of the framework (SURVEY §7.2 phase 7): one
sequential sweep over the edge-message array produces the complete moment
sketch per node — {sum, sum-of-squares, max, min} plus the max/min tie counts
the custom VJP needs — with **zero gathers and zero scatters**.  It replaces
the ELL formulation (gather [N, D_max, F] then masked reductions), whose
gather materializes D_max/avg_deg x the message bytes through HBM and whose
row-at-a-time addressing is the dominant cost of the XLA lowering.

Layout contract (provided by ``pna_tpu.graph.batch_graphs(sort_edges=True)``):
edges are sorted by receiver, so node ``n`` owns the contiguous edge range
``[ptr[n], ptr[n+1])`` — every memory access in the kernel is a sequential
chunk DMA.

Design (one program per (node-tile, feature-tile)):
  * the per-node ranges arrive in SMEM (loop bounds) and VMEM in both row
    [1, TILE_N] and column [TILE_N, 1] orientations, so every mask is built
    by a broadcast compare against an iota in the orientation it is used —
    no in-kernel transposes;
  * one pass streams the node tile's chunk-aligned edge window: sum and
    sum-of-squares ride the MXU as one-hot [TILE_N, TILE_E] matmuls; max and
    min ride the VPU as a segmented Hillis–Steele scan over the edge sublanes
    (log2 TILE_E steps of ``pltpu.roll`` + compare) followed by a one-hot
    row-select matmul of each segment's last (= running) value;
  * max/min **tie counts** (needed by the custom VJP to split the gradient
    across tied edges) fold into the same scan: the combine op is lifted from
    ``max`` to the associative semigroup on (value, count) pairs —
    ``(a,ca)*(b,cb) = (a,ca) if a>b else (b,cb) if b>a else (a,ca+cb)`` — so
    ties cost extra VPU selects but NO second pass over the edge window (the
    original two-phase design re-streamed every message byte from HBM just to
    count ties).  Selections through one-hot f32 matmuls are exact, so the
    sketch is bit-comparable to a sequential implementation up to sum
    association.

Oracle/fallback: the ELL and segment paths in ``pna_tpu.ops`` (tests compare
against both); CPU tests run this kernel in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128    # nodes per program
TILE_E = 256    # edges per DMA chunk
TILE_F = 128    # feature lanes
NEG = -3.0e38   # finite -inf stand-in: one-hot matmuls of +-inf produce NaN
_LOG2_TILE_E = 8
assert (1 << _LOG2_TILE_E) == TILE_E


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sketch_kernel(with_ties, scan_steps,
                   lo_s, hi_s,            # SMEM  [1, TILE_N]
                   lo_r, hi_r,            # VMEM  [1, TILE_N]
                   lo_c, hi_c,            # VMEM  [TILE_N, 1]
                   msg_hbm,               # ANY   [E_pad, F_pad]
                   *refs):
    if with_ties:
        (s_ref, sq_ref, mx_ref, mn_ref, tmx_ref, tmn_ref,
         msg_buf, sem) = refs
    else:
        s_ref, sq_ref, mx_ref, mn_ref, msg_buf, sem = refs
    j = pl.program_id(1)

    e_start = lo_s[0, 0, 0]
    e_end = hi_s[0, 0, TILE_N - 1]
    c0 = e_start // TILE_E
    c1 = pl.cdiv(e_end, TILE_E)

    lo_col = lo_c[0]                       # [TILE_N, 1] int32
    hi_col = hi_c[0]
    lo_row = lo_r[0]                       # [1, TILE_N] int32
    hi_row = hi_r[0]
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_E), 1)
    sub_e = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, 1), 0)
    subrow = sub_e                          # row index within chunk

    def dma_chunk(c):
        e0 = pl.multiple_of(c * TILE_E, TILE_E)
        cp = pltpu.make_async_copy(
            msg_hbm.at[pl.ds(e0, TILE_E), pl.ds(j * TILE_F, TILE_F)],
            msg_buf, sem)
        cp.start()
        cp.wait()
        return e0

    def sweep(c, accs):
        if with_ties:
            s_acc, sq_acc, mx_acc, mn_acc, tmx_acc, tmn_acc = accs
        else:
            s_acc, sq_acc, mx_acc, mn_acc = accs
        e0 = dma_chunk(c)
        m = msg_buf[:]                                    # [TILE_E, TILE_F]
        abs_e = lane_e + e0                               # [1, TILE_E]

        onehot = ((abs_e >= lo_col) & (abs_e < hi_col)).astype(jnp.float32)
        s_acc = s_acc + jnp.dot(onehot, m,
                                preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        sq_acc = sq_acc + jnp.dot(onehot, m * m,
                                  preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

        # segmented max/min scan over the chunk's sublanes.  Segment ids per
        # edge row: count of segment starts at or before the edge (column
        # orientation, [TILE_E, TILE_N] compare against a ones matmul).
        abs_e_col = sub_e + e0                            # [TILE_E, 1]
        started = ((abs_e_col >= lo_row) & (lo_row < hi_row)) \
            .astype(jnp.float32)                          # [TILE_E, TILE_N]
        seg = jnp.sum(started, axis=1, keepdims=True)     # [TILE_E, 1]
        within = (abs_e_col >= e_start) & (abs_e_col < e_end)  # [TILE_E, 1]

        x_mx = jnp.where(within, m, NEG)
        x_mn = jnp.where(within, m, -NEG)
        if with_ties:
            # scan over (value, tie-count) pairs — associative combine:
            # larger value wins and keeps its count; equal values add counts
            c_mx = jnp.where(within, jnp.ones_like(m), 0.0)
            c_mn = c_mx
        for k in range(scan_steps):
            sh = 1 << k
            ok = (subrow >= sh) & (pltpu.roll(seg, sh, 0) == seg)
            p_mx = jnp.where(ok, pltpu.roll(x_mx, sh, 0), NEG)
            p_mn = jnp.where(ok, pltpu.roll(x_mn, sh, 0), -NEG)
            if with_ties:
                pc_mx = jnp.where(ok, pltpu.roll(c_mx, sh, 0), 0.0)
                pc_mn = jnp.where(ok, pltpu.roll(c_mn, sh, 0), 0.0)
                c_mx = jnp.where(x_mx > p_mx, c_mx,
                                 jnp.where(x_mx < p_mx, pc_mx, c_mx + pc_mx))
                c_mn = jnp.where(x_mn < p_mn, c_mn,
                                 jnp.where(x_mn > p_mn, pc_mn, c_mn + pc_mn))
            x_mx = jnp.maximum(x_mx, p_mx)
            x_mn = jnp.minimum(x_mn, p_mn)

        # per node: running value at its last edge row inside this chunk
        last = jnp.minimum(hi_col, e0 + TILE_E) - 1 - e0  # [TILE_N, 1]
        has = ((jnp.minimum(hi_col, e0 + TILE_E)
                > jnp.maximum(lo_col, e0)) & (lo_col < hi_col))
        sel = ((lane_e == last) & has).astype(jnp.float32)  # [TILE_N, TILE_E]
        part_mx = jnp.dot(sel, x_mx, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        part_mn = jnp.dot(sel, x_mn, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        part_mx = jnp.where(has, part_mx, NEG)
        part_mn = jnp.where(has, part_mn, -NEG)
        if with_ties:
            part_tmx = jnp.dot(sel, c_mx, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            part_tmn = jnp.dot(sel, c_mn, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            # cross-chunk (value, count) combine with the running accumulator
            tmx_acc = jnp.where(part_mx > mx_acc, part_tmx,
                                jnp.where(part_mx < mx_acc, tmx_acc,
                                          tmx_acc + part_tmx))
            tmn_acc = jnp.where(part_mn < mn_acc, part_tmn,
                                jnp.where(part_mn > mn_acc, tmn_acc,
                                          tmn_acc + part_tmn))
        mx_acc = jnp.maximum(mx_acc, part_mx)
        mn_acc = jnp.minimum(mn_acc, part_mn)
        if with_ties:
            return s_acc, sq_acc, mx_acc, mn_acc, tmx_acc, tmn_acc
        return s_acc, sq_acc, mx_acc, mn_acc

    zeros = jnp.zeros((TILE_N, TILE_F), jnp.float32)
    init = (zeros, zeros, jnp.full_like(zeros, NEG),
            jnp.full_like(zeros, -NEG))
    if with_ties:
        init = init + (zeros, zeros)
        (s_acc, sq_acc, mx_acc, mn_acc, tmx_acc,
         tmn_acc) = jax.lax.fori_loop(c0, c1, sweep, init)
    else:
        s_acc, sq_acc, mx_acc, mn_acc = jax.lax.fori_loop(c0, c1, sweep,
                                                          init)

    s_ref[:] = s_acc
    sq_ref[:] = sq_acc
    empty_mx = mx_acc <= NEG * 0.5
    empty_mn = mn_acc >= -NEG * 0.5
    mx_ref[:] = jnp.where(empty_mx, 0.0, mx_acc)
    mn_ref[:] = jnp.where(empty_mn, 0.0, mn_acc)
    if with_ties:
        tmx_ref[:] = jnp.maximum(tmx_acc, 1.0)
        tmn_ref[:] = jnp.maximum(tmn_acc, 1.0)


def sorted_moment_sketch(msg: jnp.ndarray, edge_ptr: jnp.ndarray,
                         with_ties: bool = False,
                         max_degree: int = 0,
                         interpret: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Fused moment sketch over a receiver-sorted edge message array.

    msg        [E, F]    edge messages, sorted by receiver
    edge_ptr   [N + 1]   CSR row pointers (node n owns [ptr[n], ptr[n+1]))
    max_degree           static upper bound on the in-degree (0 = unknown);
                         caps the segmented-scan depth at ceil(log2(deg))

    Returns (sum, sumsq, max, min) each [N, F] f32 — plus (ties_max,
    ties_min) when ``with_ties`` — with empty segments mapping to 0 for
    max/min (pna_tpu.ops.segment semantics) and tie counts clamped to >= 1.
    """
    E, F = msg.shape
    N = edge_ptr.shape[0] - 1
    n_tiles = -(-N // TILE_N)
    n_pad = n_tiles * TILE_N
    f_tiles = -(-F // TILE_F)
    f_pad = f_tiles * TILE_F
    e_pad = max(_round_up(E, TILE_E), TILE_E)
    if F != f_pad or E != e_pad:
        msg = jnp.pad(msg, ((0, e_pad - E), (0, f_pad - F)))

    lo = edge_ptr[:-1]
    hi = edge_ptr[1:]
    if n_pad != N:
        tail = jnp.full((n_pad - N,), edge_ptr[-1], jnp.int32)
        lo = jnp.concatenate([lo, tail])
        hi = jnp.concatenate([hi, tail])
    lo_rows = lo.reshape(n_tiles, 1, TILE_N)
    hi_rows = hi.reshape(n_tiles, 1, TILE_N)
    lo_cols = lo.reshape(n_tiles, TILE_N, 1)
    hi_cols = hi.reshape(n_tiles, TILE_N, 1)

    n_out = 6 if with_ties else 4
    # outputs vary over the same mesh axes as the inputs (shard_map vma
    # checking requires this to be explicit on pallas_call out_shapes)
    vma = frozenset().union(*[getattr(jax.typeof(x), 'vma', frozenset())
                              for x in (msg, edge_ptr)])
    out_shape = [jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32, vma=vma)
                 for _ in range(n_out)]
    row_spec = pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, TILE_N, 1), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scan_steps = _LOG2_TILE_E
    if max_degree and max_degree < TILE_E:
        scan_steps = max(1, int(np.ceil(np.log2(max(max_degree, 2)))))
    outs = pl.pallas_call(
        functools.partial(_sketch_kernel, with_ties, scan_steps),
        grid=(n_tiles, f_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec, col_spec, col_spec,
            pl.BlockSpec(memory_space=pl.ANY),   # msg stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, TILE_F), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TILE_E, TILE_F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lo_rows, hi_rows, lo_rows, hi_rows, lo_cols, hi_cols, msg)

    if n_pad != N or f_pad != F:
        outs = tuple(o[:N, :F] for o in outs)
    return tuple(outs)


# ------------------------------------------------------------------
# pretrans-fused variant: messages are computed inside the sweep
# ------------------------------------------------------------------

def _pretrans_sketch_kernel(with_ties, scan_steps, has_e, fe_pad,
                            lo_s, hi_s,          # SMEM [1, TILE_N]
                            lo_r, hi_r,          # VMEM [1, TILE_N]
                            lo_c, hi_c,          # VMEM [TILE_N, 1]
                            u_hbm,               # ANY  [N_pad, F_pad]
                            v_vmem,              # VMEM [TILE_N, TILE_F]
                            snd_hbm,             # ANY  [E_pad, 1] int32
                            *refs):
    """One sweep over the node tile's edge window computing the pretrans
    message IN VMEM — msg = u[sender] + v[receiver] (+ e @ Ke) — then the
    same {sum, sumsq, max, min(, ties)} accumulation as ``_sketch_kernel``.

    The sender-row gather reads the u table (kept resident in VMEM via a
    double-buffered whole-table DMA at grid entry), one sublane row per edge;
    the receiver term is segment-constant, applied with a one-hot MXU matmul
    against the v tile; the edge-feature term is an in-kernel matmul on the
    raw e chunk.  The [E, T*Ft] message tensor of the XLA lowering never
    exists in HBM (VERDICT r2 item 3)."""
    if has_e:
        e_hbm, ke = refs[0], refs[1]
        refs = refs[2:]
    if with_ties:
        (s_ref, sq_ref, mx_ref, mn_ref, tmx_ref, tmn_ref, u_buf, msg_buf,
         snd_buf, e_buf, sem, snd_sem, e_sem, u_sem) = refs
    else:
        (s_ref, sq_ref, mx_ref, mn_ref, u_buf, msg_buf, snd_buf, e_buf,
         sem, snd_sem, e_sem, u_sem) = refs
    # grid is (f_tiles, n_tiles): the node tile iterates innermost so the
    # staged u feature-tile stays valid for a whole column of node tiles
    j = pl.program_id(0)
    i = pl.program_id(1)

    # stage the full u feature-tile into VMEM once per f-tile (i == 0)
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(j * TILE_F, TILE_F)], u_buf, u_sem)
        cp.start()
        cp.wait()

    e_start = lo_s[0, 0, 0]
    e_end = hi_s[0, 0, TILE_N - 1]
    c0 = e_start // TILE_E
    c1 = pl.cdiv(e_end, TILE_E)

    lo_col = lo_c[0]
    hi_col = hi_c[0]
    lo_row = lo_r[0]
    hi_row = hi_r[0]
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_E), 1)
    sub_e = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, 1), 0)
    subrow = sub_e

    def sweep(c, accs):
        if with_ties:
            s_acc, sq_acc, mx_acc, mn_acc, tmx_acc, tmn_acc = accs
        else:
            s_acc, sq_acc, mx_acc, mn_acc = accs
        e0 = pl.multiple_of(c * TILE_E, TILE_E)
        # sender-id rows are (8,128)-tiled even in HBM: DMA the aligned
        # 8-row group containing chunk c (8 KB, re-fetched per chunk)
        g0 = pl.multiple_of((c // 8) * 8, 8)
        snd_cp = pltpu.make_async_copy(
            snd_hbm.at[pl.ds(g0, 8), :], snd_buf, snd_sem)
        snd_cp.start()
        if has_e:
            e_cp = pltpu.make_async_copy(
                e_hbm.at[pl.ds(e0, TILE_E), :], e_buf, e_sem)
            e_cp.start()
        abs_e = lane_e + e0                                # [1, TILE_E]
        abs_e_col = sub_e + e0                             # [TILE_E, 1]

        # receiver term: one-hot [TILE_E, TILE_N] x v tile (MXU)
        onehot_col = ((abs_e_col >= lo_row)
                      & (abs_e_col < hi_row)).astype(jnp.float32)
        dst = jnp.dot(onehot_col, v_vmem[:].astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

        snd_cp.wait()

        # sender gather from the resident u tile, one row per edge
        row = c - g0

        def gather(r, _):
            idx = snd_buf[row, r]
            msg_buf[pl.ds(r, 1), :] = u_buf[pl.ds(idx, 1), :]
            return 0
        jax.lax.fori_loop(0, TILE_E, gather, 0, unroll=TILE_E)

        m = msg_buf[:].astype(jnp.float32) + dst
        if has_e:
            e_cp.wait()
            m = m + jnp.dot(e_buf[:].astype(jnp.float32),
                            ke[:].astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)

        onehot = ((abs_e >= lo_col) & (abs_e < hi_col)).astype(jnp.float32)
        s_acc = s_acc + jnp.dot(onehot, m,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        sq_acc = sq_acc + jnp.dot(onehot, m * m,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

        started = ((abs_e_col >= lo_row) & (lo_row < hi_row)) \
            .astype(jnp.float32)
        seg = jnp.sum(started, axis=1, keepdims=True)
        within = (abs_e_col >= e_start) & (abs_e_col < e_end)

        x_mx = jnp.where(within, m, NEG)
        x_mn = jnp.where(within, m, -NEG)
        if with_ties:
            c_mx = jnp.where(within, jnp.ones_like(m), 0.0)
            c_mn = c_mx
        for k in range(scan_steps):
            sh = 1 << k
            ok = (subrow >= sh) & (pltpu.roll(seg, sh, 0) == seg)
            p_mx = jnp.where(ok, pltpu.roll(x_mx, sh, 0), NEG)
            p_mn = jnp.where(ok, pltpu.roll(x_mn, sh, 0), -NEG)
            if with_ties:
                pc_mx = jnp.where(ok, pltpu.roll(c_mx, sh, 0), 0.0)
                pc_mn = jnp.where(ok, pltpu.roll(c_mn, sh, 0), 0.0)
                c_mx = jnp.where(x_mx > p_mx, c_mx,
                                 jnp.where(x_mx < p_mx, pc_mx, c_mx + pc_mx))
                c_mn = jnp.where(x_mn < p_mn, c_mn,
                                 jnp.where(x_mn > p_mn, pc_mn, c_mn + pc_mn))
            x_mx = jnp.maximum(x_mx, p_mx)
            x_mn = jnp.minimum(x_mn, p_mn)

        last = jnp.minimum(hi_col, e0 + TILE_E) - 1 - e0
        has = ((jnp.minimum(hi_col, e0 + TILE_E)
                > jnp.maximum(lo_col, e0)) & (lo_col < hi_col))
        sel = ((lane_e == last) & has).astype(jnp.float32)
        part_mx = jnp.dot(sel, x_mx, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        part_mn = jnp.dot(sel, x_mn, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        part_mx = jnp.where(has, part_mx, NEG)
        part_mn = jnp.where(has, part_mn, -NEG)
        if with_ties:
            part_tmx = jnp.dot(sel, c_mx, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            part_tmn = jnp.dot(sel, c_mn, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            tmx_acc = jnp.where(part_mx > mx_acc, part_tmx,
                                jnp.where(part_mx < mx_acc, tmx_acc,
                                          tmx_acc + part_tmx))
            tmn_acc = jnp.where(part_mn < mn_acc, part_tmn,
                                jnp.where(part_mn > mn_acc, tmn_acc,
                                          tmn_acc + part_tmn))
        mx_acc = jnp.maximum(mx_acc, part_mx)
        mn_acc = jnp.minimum(mn_acc, part_mn)
        if with_ties:
            return s_acc, sq_acc, mx_acc, mn_acc, tmx_acc, tmn_acc
        return s_acc, sq_acc, mx_acc, mn_acc

    zeros = jnp.zeros((TILE_N, TILE_F), jnp.float32)
    init = (zeros, zeros, jnp.full_like(zeros, NEG),
            jnp.full_like(zeros, -NEG))
    if with_ties:
        init = init + (zeros, zeros)
        (s_acc, sq_acc, mx_acc, mn_acc, tmx_acc,
         tmn_acc) = jax.lax.fori_loop(c0, c1, sweep, init)
    else:
        s_acc, sq_acc, mx_acc, mn_acc = jax.lax.fori_loop(c0, c1, sweep,
                                                          init)

    s_ref[:] = s_acc
    sq_ref[:] = sq_acc
    empty_mx = mx_acc <= NEG * 0.5
    empty_mn = mn_acc >= -NEG * 0.5
    mx_ref[:] = jnp.where(empty_mx, 0.0, mx_acc)
    mn_ref[:] = jnp.where(empty_mn, 0.0, mn_acc)
    if with_ties:
        tmx_ref[:] = jnp.maximum(tmx_acc, 1.0)
        tmn_ref[:] = jnp.maximum(tmn_acc, 1.0)


@functools.partial(jax.jit, static_argnames=('with_ties', 'max_degree',
                                             'interpret'))
def sorted_pretrans_sketch(u: jnp.ndarray, v: jnp.ndarray,
                           senders: jnp.ndarray, edge_ptr: jnp.ndarray,
                           e_feats: Optional[jnp.ndarray] = None,
                           ke: Optional[jnp.ndarray] = None,
                           with_ties: bool = False,
                           max_degree: int = 0,
                           interpret: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Fused pretrans + moment sketch over a receiver-sorted edge list.

    u         [N, M]   sender-side pretransformed features (h @ W_src)
    v         [N, M]   receiver-side term incl. bias (h @ W_dst + b0)
    senders   [E]      sender node index per edge (receiver-sorted order)
    edge_ptr  [N + 1]  CSR row pointers (clamped to real edges by caller)
    e_feats   [E, Fe]  optional raw edge features
    ke        [Fe, M]  optional edge-feature pretrans weight

    The per-edge message u[senders[e]] + v[recv(e)] (+ e_feats[e] @ ke) is
    formed in VMEM only.  Returns the same outputs as
    ``sorted_moment_sketch``.  Requires the u feature tile [Nu_pad, 128] to
    fit in VMEM (~Nu <= 45k in bf16) — caller must check ``fits_vmem``.
    u may have MORE rows than v (distributed ghost table: local + halo
    sender features); ``senders`` indexes u, ``edge_ptr`` spans v's nodes.
    """
    # the resident u table must be f32: the per-edge row gather loads one
    # sublane row at an arbitrary offset, which Mosaic can only lower for
    # 4-byte elements ("index in dimension 0 is a multiple of 8" for bf16)
    u = u.astype(jnp.float32)
    Nu, M = u.shape
    N = v.shape[0]
    assert v.shape[1] == M
    if not pretrans_fits_vmem(Nu, u.dtype.itemsize):
        raise ValueError(
            f"sorted_pretrans_sketch: resident u tile for N={Nu} "
            f"({u.dtype}) exceeds the VMEM budget; use the unfused "
            "sorted_moment_sketch path instead (check pretrans_fits_vmem "
            "before calling)")
    E = senders.shape[0]
    has_e = e_feats is not None
    n_tiles = -(-N // TILE_N)
    n_pad = n_tiles * TILE_N
    nu_pad = max(_round_up(Nu, 8), 8)
    f_tiles = -(-M // TILE_F)
    f_pad = f_tiles * TILE_F
    e_pad = max(_round_up(E, TILE_E), TILE_E)
    if u.shape != (nu_pad, f_pad):
        u = jnp.pad(u, ((0, nu_pad - Nu), (0, f_pad - M)))
    if v.shape != (n_pad, f_pad):
        v = jnp.pad(v, ((0, n_pad - N), (0, f_pad - M)))
    n_chunks = _round_up(e_pad // TILE_E, 8)
    snd = jnp.pad(senders.astype(jnp.int32),
                  (0, n_chunks * TILE_E - E)).reshape(n_chunks, TILE_E)
    fe_pad = 0
    if has_e:
        Fe = e_feats.shape[1]
        fe_pad = max(_round_up(Fe, 128), 128)
        e_feats = jnp.pad(e_feats, ((0, e_pad - E), (0, fe_pad - Fe)))
        ke = jnp.pad(ke, ((0, fe_pad - Fe), (0, f_pad - M)))

    lo = edge_ptr[:-1]
    hi = edge_ptr[1:]
    if n_pad != N:
        tail = jnp.full((n_pad - N,), edge_ptr[-1], jnp.int32)
        lo = jnp.concatenate([lo, tail])
        hi = jnp.concatenate([hi, tail])
    lo_rows = lo.reshape(n_tiles, 1, TILE_N)
    hi_rows = hi.reshape(n_tiles, 1, TILE_N)
    lo_cols = lo.reshape(n_tiles, TILE_N, 1)
    hi_cols = hi.reshape(n_tiles, TILE_N, 1)

    n_out = 6 if with_ties else 4
    vma = frozenset().union(*[getattr(jax.typeof(x), 'vma', frozenset())
                              for x in (u, v, senders, edge_ptr)])
    out_shape = [jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32, vma=vma)
                 for _ in range(n_out)]
    row_spec = pl.BlockSpec((1, 1, TILE_N), lambda j, i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, TILE_N, 1), lambda j, i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scan_steps = _LOG2_TILE_E
    if max_degree and max_degree < TILE_E:
        scan_steps = max(1, int(np.ceil(np.log2(max(max_degree, 2)))))

    in_specs = [
        pl.BlockSpec((1, 1, TILE_N), lambda j, i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, TILE_N), lambda j, i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        row_spec, row_spec, col_spec, col_spec,
        pl.BlockSpec(memory_space=pl.ANY),            # u stays in HBM; the
        # kernel stages the [N_pad, TILE_F] tile into a VMEM scratch once
        pl.BlockSpec((TILE_N, TILE_F), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),        # v tile
        pl.BlockSpec(memory_space=pltpu.HBM),         # senders (row DMA)
    ]
    inputs = [lo_rows, hi_rows, lo_rows, hi_rows, lo_cols, hi_cols,
              u, v, snd]
    if has_e:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # e_feats
                     pl.BlockSpec((fe_pad, TILE_F), lambda j, i: (0, j),
                                  memory_space=pltpu.VMEM)]
        inputs += [e_feats, ke]

    outs = pl.pallas_call(
        functools.partial(_pretrans_sketch_kernel, with_ties, scan_steps,
                          has_e, fe_pad),
        grid=(f_tiles, n_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TILE_N, TILE_F), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nu_pad, TILE_F), u.dtype),    # resident u tile
            pltpu.VMEM((TILE_E, TILE_F), u.dtype),    # gathered msg chunk
            pltpu.SMEM((8, TILE_E), jnp.int32),       # sender id chunks
            pltpu.VMEM((TILE_E, max(fe_pad, 128)),
                       e_feats.dtype if has_e else jnp.float32),  # e chunk
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*inputs)

    if n_pad != N or f_pad != M:
        outs = tuple(o[:N, :M] for o in outs)
    return tuple(outs)


# ------------------------------------------------------------------
# backward sweep: node gradient fields -> per-edge message gradient
# ------------------------------------------------------------------

def _dmsg_kernel(lo_s, hi_s,              # SMEM [1, 1, TILE_N]
                 lo_r, hi_r,              # VMEM [1, 1, TILE_N]
                 g_lin, g_quad, g_max, g_min, mx, mn,   # VMEM [TILE_N, TILE_F]
                 msg_hbm,                 # ANY  [E_pad, F_pad]
                 out_hbm,                 # ANY  [E_pad, F_pad]  (output)
                 d_buf, old_buf, sem_r, sem_o, sem_w):
    """Per (node tile, feature tile): stream the tile's edge window and write

        d_msg[e] = g_lin[r] + 2 msg[e] g_quad[r]
                   + (msg[e]==mx[r]) g_max[r] + (msg[e]==mn[r]) g_min[r]

    for every edge e with receiver r in this tile.  The node->edge expansion
    is a one-hot [TILE_E, TILE_N] MXU matmul per field (receivers are sorted,
    so each node's edges are one contiguous segment) — the [E, 6F]
    wide-gather tensor of the XLA backward never exists.

    Boundary chunks are shared between consecutive node tiles: each program
    zero-fills foreign rows and, when its window starts mid-chunk, merges
    over the previous program's write (read-modify-write; the TPU grid runs
    sequentially on the core, so the read observes the completed write)."""
    j = pl.program_id(1)

    e_start = lo_s[0, 0, 0]
    e_end = hi_s[0, 0, TILE_N - 1]
    c0 = e_start // TILE_E
    c1 = pl.cdiv(e_end, TILE_E)
    misaligned = e_start % TILE_E != 0

    lo_row = lo_r[0]                       # [1, TILE_N] int32
    hi_row = hi_r[0]
    sub_e = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, 1), 0)

    gl = g_lin[:]
    gq = g_quad[:]
    gx = g_max[:]
    gn = g_min[:]
    vx = mx[:]
    vn = mn[:]

    def sweep(c, _):
        e0 = pl.multiple_of(c * TILE_E, TILE_E)
        rd = pltpu.make_async_copy(
            msg_hbm.at[pl.ds(e0, TILE_E), pl.ds(j * TILE_F, TILE_F)],
            d_buf, sem_r)
        rd.start()

        abs_e_col = sub_e + e0                             # [TILE_E, 1]
        onehot = ((abs_e_col >= lo_row)
                  & (abs_e_col < hi_row)).astype(jnp.float32)
        # one-hot expansions are exact (one unit row element per edge)
        ex_lin = jnp.dot(onehot, gl, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        ex_quad = jnp.dot(onehot, gq, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        ex_gmax = jnp.dot(onehot, gx, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        ex_gmin = jnp.dot(onehot, gn, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        ex_mx = jnp.dot(onehot, vx, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        ex_mn = jnp.dot(onehot, vn, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

        rd.wait()
        m = d_buf[:]
        within = (abs_e_col >= e_start) & (abs_e_col < e_end)
        d = (ex_lin + 2.0 * m * ex_quad
             + (m == ex_mx).astype(jnp.float32) * ex_gmax
             + (m == ex_mn).astype(jnp.float32) * ex_gmin)
        d = jnp.where(within, d, 0.0)

        # merge over the previous tile's write when our window starts
        # mid-chunk (sequential grid: that write has completed)
        @pl.when((c == c0) & misaligned)
        def _():
            rd_old = pltpu.make_async_copy(
                out_hbm.at[pl.ds(e0, TILE_E), pl.ds(j * TILE_F, TILE_F)],
                old_buf, sem_o)
            rd_old.start()
            rd_old.wait()
            d_buf[:] = jnp.where(within, d, old_buf[:])

        @pl.when(jnp.logical_not((c == c0) & misaligned))
        def _():
            d_buf[:] = d

        wr = pltpu.make_async_copy(
            d_buf,
            out_hbm.at[pl.ds(e0, TILE_E), pl.ds(j * TILE_F, TILE_F)], sem_w)
        wr.start()
        wr.wait()
        return 0

    jax.lax.fori_loop(c0, c1, sweep, 0)


def sorted_dmsg(msg: jnp.ndarray, edge_ptr: jnp.ndarray,
                g_lin: jnp.ndarray, g_quad: jnp.ndarray,
                g_max: jnp.ndarray, g_min: jnp.ndarray,
                mx: jnp.ndarray, mn: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """Backward of the moment sketch: expand the per-node gradient fields to
    edges in one streaming sweep over the receiver-sorted edge list.

    msg       [E, F]   the forward's edge messages (f32, receiver-sorted)
    edge_ptr  [N + 1]  CSR row pointers (clamped to real edges by caller)
    g_lin, g_quad, g_max, g_min, mx, mn   [N, F]  node gradient fields
              (g_max/g_min pre-divided by tie counts; mx/mn the forward's
              per-node max/min values, for the tie membership test)

    Returns d_msg [E, F] f32.  Rows outside every node's range (padding) are
    NOT written — callers must mask with the edge mask.  Replaces the
    [E, 6F] wide gather of ``pallas_bank._pallas_raw_bwd`` with sequential
    chunk DMA + one-hot MXU expansion (zero gathers, zero scatters).
    """
    E, F = msg.shape
    N = edge_ptr.shape[0] - 1
    n_tiles = -(-N // TILE_N)
    n_pad = n_tiles * TILE_N
    f_tiles = -(-F // TILE_F)
    f_pad = f_tiles * TILE_F
    e_pad = max(_round_up(E, TILE_E), TILE_E)
    if F != f_pad or E != e_pad:
        msg = jnp.pad(msg, ((0, e_pad - E), (0, f_pad - F)))
    fields = []
    for x in (g_lin, g_quad, g_max, g_min, mx, mn):
        if x.shape != (n_pad, f_pad):
            x = jnp.pad(x, ((0, n_pad - N), (0, f_pad - F)))
        fields.append(x.astype(jnp.float32))

    lo = edge_ptr[:-1]
    hi = edge_ptr[1:]
    if n_pad != N:
        tail = jnp.full((n_pad - N,), edge_ptr[-1], jnp.int32)
        lo = jnp.concatenate([lo, tail])
        hi = jnp.concatenate([hi, tail])
    lo_rows = lo.reshape(n_tiles, 1, TILE_N)
    hi_rows = hi.reshape(n_tiles, 1, TILE_N)

    vma = frozenset().union(*[getattr(jax.typeof(x), 'vma', frozenset())
                              for x in (msg, edge_ptr)])
    out_shape = jax.ShapeDtypeStruct((e_pad, f_pad), jnp.float32, vma=vma)
    row_spec = pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    field_spec = pl.BlockSpec((TILE_N, TILE_F), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _dmsg_kernel,
        grid=(n_tiles, f_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec,
            field_spec, field_spec, field_spec, field_spec,
            field_spec, field_spec,
            pl.BlockSpec(memory_space=pl.ANY),   # msg stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TILE_E, TILE_F), jnp.float32),
            pltpu.VMEM((TILE_E, TILE_F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lo_rows, hi_rows, lo_rows, hi_rows, *fields, msg)

    if e_pad != E or f_pad != F:
        out = out[:E, :F]
    return out


# ------------------------------------------------------------------
# fully-fused backward: recompute pretrans in-kernel, emit d_msg + d_v
# ------------------------------------------------------------------

def _fused_dmsg_kernel(has_e,
                       lo_s, hi_s,          # SMEM [1, 1, TILE_N]
                       lo_r, hi_r,          # VMEM [1, 1, TILE_N]
                       g_lin, g_quad, g_max, g_min, mx, mn,  # VMEM tiles
                       u_hbm,               # ANY  [N_pad, F_pad]
                       v_vmem,              # VMEM [TILE_N, TILE_F]
                       snd_hbm,             # ANY  [n_chunks, TILE_E] int32
                       *refs):
    """Backward half of the fused pretrans layer: recompute the edge message
    with EXACTLY the forward kernel's arithmetic (same gather, same one-hot
    receiver matmul, same edge-feature matmul — so the max/min tie membership
    test is bit-exact), then expand the node gradient fields and write

        d_msg[e] = g_lin[r] + 2 m[e] g_quad[r]
                   + (m[e]==mx[r]) g_max[r] + (m[e]==mn[r]) g_min[r]

    plus the receiver-side gradient d_v[n] = sum over the node's edges of
    d_msg (accumulated with the same one-hot MXU matmul, transposed).  The
    [E, F] message tensor exists in HBM in NEITHER pass; d_msg must be
    emitted (the sender scatter and the edge-feature matmul consume it)."""
    if has_e:
        e_hbm, ke = refs[0], refs[1]
        refs = refs[2:]
    (dmsg_hbm, dv_ref, u_buf, msg_buf, snd_buf, e_buf, old_buf,
     sem, snd_sem, e_sem, u_sem, old_sem, w_sem) = refs
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(j * TILE_F, TILE_F)], u_buf, u_sem)
        cp.start()
        cp.wait()

    e_start = lo_s[0, 0, 0]
    e_end = hi_s[0, 0, TILE_N - 1]
    c0 = e_start // TILE_E
    c1 = pl.cdiv(e_end, TILE_E)
    misaligned = e_start % TILE_E != 0

    lo_row = lo_r[0]
    hi_row = hi_r[0]
    sub_e = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, 1), 0)

    gl = g_lin[:]
    gq = g_quad[:]
    gx = g_max[:]
    gn = g_min[:]
    vx = mx[:]
    vn = mn[:]

    def sweep(c, dv_acc):
        e0 = pl.multiple_of(c * TILE_E, TILE_E)
        g0 = pl.multiple_of((c // 8) * 8, 8)
        snd_cp = pltpu.make_async_copy(
            snd_hbm.at[pl.ds(g0, 8), :], snd_buf, snd_sem)
        snd_cp.start()
        if has_e:
            e_cp = pltpu.make_async_copy(
                e_hbm.at[pl.ds(e0, TILE_E), :], e_buf, e_sem)
            e_cp.start()
        abs_e_col = sub_e + e0                             # [TILE_E, 1]

        # recompute the message: receiver term (one-hot MXU), sender gather,
        # edge-feature matmul — the forward kernel's exact op sequence
        onehot_col = ((abs_e_col >= lo_row)
                      & (abs_e_col < hi_row)).astype(jnp.float32)
        dst = jnp.dot(onehot_col, v_vmem[:].astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        snd_cp.wait()
        row = c - g0

        def gather(r, _):
            idx = snd_buf[row, r]
            msg_buf[pl.ds(r, 1), :] = u_buf[pl.ds(idx, 1), :]
            return 0
        jax.lax.fori_loop(0, TILE_E, gather, 0, unroll=TILE_E)

        m = msg_buf[:].astype(jnp.float32) + dst
        if has_e:
            e_cp.wait()
            m = m + jnp.dot(e_buf[:].astype(jnp.float32),
                            ke[:].astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)

        ex_lin = jnp.dot(onehot_col, gl, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        ex_quad = jnp.dot(onehot_col, gq, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        ex_gmax = jnp.dot(onehot_col, gx, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        ex_gmin = jnp.dot(onehot_col, gn, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        ex_mx = jnp.dot(onehot_col, vx, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        ex_mn = jnp.dot(onehot_col, vn, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

        within = (abs_e_col >= e_start) & (abs_e_col < e_end)
        d = (ex_lin + 2.0 * m * ex_quad
             + (m == ex_mx).astype(jnp.float32) * ex_gmax
             + (m == ex_mn).astype(jnp.float32) * ex_gmin)
        d = jnp.where(within, d, 0.0)

        # d_v accumulation: transpose of the expansion one-hot
        dv_acc = dv_acc + jnp.dot(onehot_col.T, d,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

        @pl.when((c == c0) & misaligned)
        def _():
            rd_old = pltpu.make_async_copy(
                dmsg_hbm.at[pl.ds(e0, TILE_E), pl.ds(j * TILE_F, TILE_F)],
                old_buf, old_sem)
            rd_old.start()
            rd_old.wait()
            msg_buf[:] = jnp.where(within, d, old_buf[:]).astype(u_buf.dtype)

        @pl.when(jnp.logical_not((c == c0) & misaligned))
        def _():
            msg_buf[:] = d.astype(u_buf.dtype)

        wr = pltpu.make_async_copy(
            msg_buf,
            dmsg_hbm.at[pl.ds(e0, TILE_E), pl.ds(j * TILE_F, TILE_F)], w_sem)
        wr.start()
        wr.wait()
        return dv_acc

    dv = jax.lax.fori_loop(c0, c1, sweep,
                           jnp.zeros((TILE_N, TILE_F), jnp.float32))
    dv_ref[:] = dv


@functools.partial(jax.jit, static_argnames=('interpret',))
def sorted_pretrans_dmsg(u: jnp.ndarray, v: jnp.ndarray,
                         senders: jnp.ndarray, edge_ptr: jnp.ndarray,
                         g_lin: jnp.ndarray, g_quad: jnp.ndarray,
                         g_max: jnp.ndarray, g_min: jnp.ndarray,
                         mx: jnp.ndarray, mn: jnp.ndarray,
                         e_feats: Optional[jnp.ndarray] = None,
                         ke: Optional[jnp.ndarray] = None,
                         interpret: bool = False):
    """Backward of :func:`sorted_pretrans_sketch`: one sweep recomputing the
    message and emitting ``(d_msg [E, F], d_v [N, F])``.

    WARNING (dtype contract): d_msg is written in u.dtype — callers that need
    f32 gradients must pass f32 u/v.  Rows outside every node's range are
    unwritten; mask with the edge mask before consuming.  Like the forward,
    u may have more rows than v (ghost sender table).
    """
    u = u.astype(jnp.float32)      # same Mosaic constraint as the forward
    Nu, M = u.shape
    N = v.shape[0]
    E = senders.shape[0]
    has_e = e_feats is not None
    n_tiles = -(-N // TILE_N)
    n_pad = n_tiles * TILE_N
    nu_pad = max(_round_up(Nu, 8), 8)
    f_tiles = -(-M // TILE_F)
    f_pad = f_tiles * TILE_F
    e_pad = max(_round_up(E, TILE_E), TILE_E)
    if u.shape != (nu_pad, f_pad):
        u = jnp.pad(u, ((0, nu_pad - Nu), (0, f_pad - M)))
    if v.shape != (n_pad, f_pad):
        v = jnp.pad(v, ((0, n_pad - N), (0, f_pad - M)))
    fields = []
    for x in (g_lin, g_quad, g_max, g_min, mx, mn):
        if x.shape != (n_pad, f_pad):
            x = jnp.pad(x, ((0, n_pad - N), (0, f_pad - M)))
        fields.append(x.astype(jnp.float32))
    n_chunks = _round_up(e_pad // TILE_E, 8)
    snd = jnp.pad(senders.astype(jnp.int32),
                  (0, n_chunks * TILE_E - E)).reshape(n_chunks, TILE_E)
    fe_pad = 0
    if has_e:
        Fe = e_feats.shape[1]
        fe_pad = max(_round_up(Fe, 128), 128)
        e_feats = jnp.pad(e_feats, ((0, e_pad - E), (0, fe_pad - Fe)))
        ke = jnp.pad(ke, ((0, fe_pad - Fe), (0, f_pad - M)))

    lo = edge_ptr[:-1]
    hi = edge_ptr[1:]
    if n_pad != N:
        tail = jnp.full((n_pad - N,), edge_ptr[-1], jnp.int32)
        lo = jnp.concatenate([lo, tail])
        hi = jnp.concatenate([hi, tail])
    lo_rows = lo.reshape(n_tiles, 1, TILE_N)
    hi_rows = hi.reshape(n_tiles, 1, TILE_N)

    vma = frozenset().union(*[getattr(jax.typeof(x), 'vma', frozenset())
                              for x in (u, v, senders, edge_ptr)])
    out_shape = [
        jax.ShapeDtypeStruct((e_pad, f_pad), u.dtype, vma=vma),   # d_msg
        jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32, vma=vma),  # d_v
    ]
    row_spec = pl.BlockSpec((1, 1, TILE_N), lambda j, i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    field_spec = pl.BlockSpec((TILE_N, TILE_F), lambda j, i: (i, j),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, TILE_N), lambda j, i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, TILE_N), lambda j, i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        row_spec, row_spec,
        field_spec, field_spec, field_spec, field_spec,
        field_spec, field_spec,
        pl.BlockSpec(memory_space=pl.ANY),            # u (staged per f-tile)
        pl.BlockSpec((TILE_N, TILE_F), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),        # v tile
        pl.BlockSpec(memory_space=pltpu.HBM),         # senders (row DMA)
    ]
    inputs = [lo_rows, hi_rows, lo_rows, hi_rows, *fields, u, v, snd]
    if has_e:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec((fe_pad, TILE_F), lambda j, i: (0, j),
                                  memory_space=pltpu.VMEM)]
        inputs += [e_feats, ke]

    d_msg, d_v = pl.pallas_call(
        functools.partial(_fused_dmsg_kernel, has_e),
        grid=(f_tiles, n_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TILE_N, TILE_F), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nu_pad, TILE_F), u.dtype),    # resident u tile
            pltpu.VMEM((TILE_E, TILE_F), u.dtype),    # msg / d staging
            pltpu.SMEM((8, TILE_E), jnp.int32),       # sender id chunks
            pltpu.VMEM((TILE_E, max(fe_pad, 128)),
                       e_feats.dtype if has_e else jnp.float32),  # e chunk
            pltpu.VMEM((TILE_E, TILE_F), u.dtype),    # old chunk (merge)
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*inputs)

    if e_pad != E or f_pad != M:
        d_msg = d_msg[:E, :M]
    if n_pad != N or f_pad != M:
        d_v = d_v[:N, :M]
    return d_msg, d_v


def pretrans_fits_vmem(n_nodes: int, dtype_bytes: int = 4,
                       budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Whether the resident u tile [N_pad, 128] fits the VMEM budget."""
    n_pad = -(-n_nodes // TILE_N) * TILE_N
    return n_pad * TILE_F * dtype_bytes <= budget_bytes


# ------------------------------------------------------------------
# host-side helper kept for building per-tile ranges in tests/tools
# ------------------------------------------------------------------

def build_node_ranges(receivers_sorted: np.ndarray, num_nodes: int,
                      tile_n: int = TILE_N
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-node edge ranges grouped by node tile: (lo, hi), each
    [num_tiles, tile_n] int32, where node (i, n) owns edges [lo, hi)."""
    num_tiles = -(-num_nodes // tile_n)
    n_pad = num_tiles * tile_n
    ptr = np.zeros(n_pad + 1, dtype=np.int64)
    ptr[1:] = np.searchsorted(receivers_sorted, np.arange(1, n_pad + 1),
                              side='left')
    lo = ptr[:-1].reshape(num_tiles, tile_n).astype(np.int32)
    hi = ptr[1:].reshape(num_tiles, tile_n).astype(np.int32)
    return lo, hi
