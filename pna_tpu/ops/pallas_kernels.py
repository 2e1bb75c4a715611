"""Pallas TPU kernel: fused multi-aggregator segment reduction over a
sorted edge list.

This is the hand-written version of the framework's core op (SURVEY §7.2
phase 7): one pass over edges sorted by receiver producing the moment sketch
{sum, sum-of-squares, max, min} per node — sum/sq ride the MXU via one-hot
matmuls, max/min ride the VPU via masked reductions.  Mean/std/scalers are
derived elementwise outside (XLA fuses those into the consumer).

Design (TPU/Mosaic friendly):
  * edges sorted by receiver => each node's edges are one contiguous range
    [ptr[n], ptr[n+1]); the per-node (start, end) offsets are passed as small
    SMEM blocks per node tile — no receiver-id DMA, and every mask is built
    from scalars with ``broadcasted_iota`` in the orientation it is used
    (no transposes, no 3-D vectors);
  * grid = (node_tiles, feature_tiles); each program DMAs its chunk-aligned
    edge window [TILE_E, TILE_F] from HBM and accumulates in registers;
  * sum / sum-of-squares: one-hot [TILE_N, TILE_E] matmul on the MXU;
  * max / min: per node row, a 2-D iota range mask + reduce on the VPU.

The XLA/ELL paths remain the oracle (tests/test_pallas_kernel.py) and the
fallback on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 8      # nodes per program (sublane width)
TILE_E = 256    # edges per DMA chunk
TILE_F = 128    # feature lanes


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


def _sketch_kernel(lo_ref, hi_ref,        # SMEM [1, TILE_N]
                   msg_hbm,               # HBM [E_pad, F_pad]
                   sum_ref, sq_ref, max_ref, min_ref,   # out [TILE_N, TILE_F]
                   msg_buf, sem_m):       # scratch
    j = pl.program_id(1)
    e_start = lo_ref[0, 0, 0]
    e_end = hi_ref[0, 0, TILE_N - 1]
    c_start = e_start // TILE_E
    c_end = pl.cdiv(e_end, TILE_E)

    sum_acc = jnp.zeros((TILE_N, TILE_F), jnp.float32)
    sq_acc = jnp.zeros((TILE_N, TILE_F), jnp.float32)
    max_acc = jnp.full((TILE_N, TILE_F), -jnp.inf, jnp.float32)
    min_acc = jnp.full((TILE_N, TILE_F), jnp.inf, jnp.float32)

    lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_E), 1)
    sub_e = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, TILE_F), 0)

    def body(c, accs):
        sum_acc, sq_acc, max_acc, min_acc = accs
        e0 = pl.multiple_of(c * TILE_E, TILE_E)
        dma_m = pltpu.make_async_copy(
            msg_hbm.at[pl.ds(e0, TILE_E), pl.ds(j * TILE_F, TILE_F)],
            msg_buf, sem_m)
        dma_m.start()
        dma_m.wait()
        m = msg_buf[:]                                    # [TILE_E, TILE_F]

        # one-hot rows from per-node scalar ranges (relative to e0)
        rows = []
        for n in range(TILE_N):
            lo_n = lo_ref[0, 0, n] - e0
            hi_n = hi_ref[0, 0, n] - e0
            cond = (lane_e >= lo_n) & (lane_e < hi_n)         # [1, TILE_E]
            rows.append(jnp.where(cond, 1.0, 0.0))
        onehot = jnp.concatenate(rows, axis=0)                # [TN, TE] f32

        sum_acc = sum_acc + jnp.dot(onehot, m,
                                    preferred_element_type=jnp.float32)
        sq_acc = sq_acc + jnp.dot(onehot, m * m,
                                  preferred_element_type=jnp.float32)

        # max/min per node row: 2-D sublane-range mask, reduce over edges
        new_max = []
        new_min = []
        for n in range(TILE_N):
            lo_n = lo_ref[0, 0, n] - e0
            hi_n = hi_ref[0, 0, n] - e0
            mask = (sub_e >= lo_n) & (sub_e < hi_n)           # [TILE_E, TILE_F]
            new_max.append(jnp.max(jnp.where(mask, m, -jnp.inf), axis=0,
                                   keepdims=True))
            new_min.append(jnp.min(jnp.where(mask, m, jnp.inf), axis=0,
                                   keepdims=True))
        max_acc = jnp.maximum(max_acc, jnp.concatenate(new_max, axis=0))
        min_acc = jnp.minimum(min_acc, jnp.concatenate(new_min, axis=0))
        return sum_acc, sq_acc, max_acc, min_acc

    sum_acc, sq_acc, max_acc, min_acc = jax.lax.fori_loop(
        c_start, c_end, body, (sum_acc, sq_acc, max_acc, min_acc))

    sum_ref[:] = sum_acc
    sq_ref[:] = sq_acc
    # empty segments -> 0 (matches pna_tpu.ops.segment semantics)
    max_ref[:] = jnp.where(jnp.isfinite(max_acc), max_acc, 0.0)
    min_ref[:] = jnp.where(jnp.isfinite(min_acc), min_acc, 0.0)


def sorted_moment_sketch(msg: jnp.ndarray, node_lo: jnp.ndarray,
                         node_hi: jnp.ndarray,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, ...]:
    """msg [E, F] (edges sorted by receiver) + per-node ranges
    (build_node_ranges) -> (sum, sumsq, max, min), each [N_pad, F_pad]."""
    E, F = msg.shape
    num_tiles = node_lo.shape[0]
    n_pad = num_tiles * TILE_N
    f_tiles = -(-F // TILE_F)
    f_pad = f_tiles * TILE_F
    if F != f_pad:
        msg = jnp.pad(msg, ((0, 0), (0, f_pad - F)))
    e_pad = max(-(-E // TILE_E) * TILE_E, TILE_E)
    if e_pad != E:
        msg = jnp.pad(msg, ((0, e_pad - E), (0, 0)))

    out_shape = [jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32)
                 for _ in range(4)]
    s, sq, mx, mn = pl.pallas_call(
        _sketch_kernel,
        grid=(num_tiles, f_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # msg stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, TILE_F), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TILE_E, TILE_F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(node_lo[:, None, :], node_hi[:, None, :], msg)
    return s, sq, mx, mn
