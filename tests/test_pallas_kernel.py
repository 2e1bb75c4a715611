"""Pallas sorted-edge moment-sketch kernel vs segment-op oracle
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pna_tpu.ops import segment as seg
from pna_tpu.ops.pallas_kernels import (TILE_N, build_node_ranges,
                                        sorted_moment_sketch)


@pytest.mark.parametrize("seed,num_nodes,num_edges,F", [
    (0, 24, 300, 16),
    (1, 40, 700, 130),   # F > TILE_F exercises feature tiling
    (2, 16, 5, 8),       # many empty nodes
])
def test_sorted_sketch_matches_segment(seed, num_nodes, num_edges, F):
    rng = np.random.RandomState(seed)
    recv = np.sort(rng.randint(0, num_nodes, num_edges)).astype(np.int32)
    msg = rng.randn(num_edges, F).astype(np.float32)

    lo, hi = build_node_ranges(recv, num_nodes)
    s, sq, mx, mn = sorted_moment_sketch(
        jnp.asarray(msg), jnp.asarray(lo), jnp.asarray(hi), interpret=True)

    n_pad = lo.shape[0] * TILE_N
    recv_j = jnp.asarray(recv)
    ref_s = seg.segment_sum(jnp.asarray(msg), recv_j, n_pad)
    ref_sq = seg.segment_sum(jnp.asarray(msg) ** 2, recv_j, n_pad)
    ref_mx = seg.segment_max(jnp.asarray(msg), recv_j, n_pad)
    ref_mn = seg.segment_min(jnp.asarray(msg), recv_j, n_pad)

    np.testing.assert_allclose(np.asarray(s)[:, :F], np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sq)[:, :F], np.asarray(ref_sq),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx)[:, :F], np.asarray(ref_mx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mn)[:, :F], np.asarray(ref_mn),
                               rtol=1e-5, atol=1e-5)
