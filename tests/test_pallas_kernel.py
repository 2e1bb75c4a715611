"""Pallas sorted-edge moment-sketch kernel vs segment-op oracle
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pna_tpu.ops import segment as seg
from pna_tpu.ops.pallas_kernels import sorted_moment_sketch


def _csr(recv, num_nodes):
    ptr = np.zeros(num_nodes + 1, np.int32)
    ptr[1:] = np.searchsorted(recv, np.arange(1, num_nodes + 1), side='left')
    return ptr


@pytest.mark.parametrize("seed,num_nodes,num_edges,F,max_deg", [
    (0, 24, 300, 16, 0),
    (1, 40, 700, 130, 0),   # F > TILE_F exercises feature tiling
    (2, 16, 5, 8, 0),       # many empty nodes
    (3, 200, 420, 16, 8),   # capped scan depth (bounded-degree graphs)
])
def test_sorted_sketch_matches_segment(seed, num_nodes, num_edges, F,
                                       max_deg):
    rng = np.random.RandomState(seed)
    if max_deg:
        deg = rng.randint(0, max_deg + 1, num_nodes)
        recv = np.repeat(np.arange(num_nodes), deg).astype(np.int32)
        num_edges = len(recv)
    else:
        recv = np.sort(rng.randint(0, num_nodes, num_edges)).astype(np.int32)
    msg = rng.randn(num_edges, F).astype(np.float32)
    msg[1] = msg[0]   # tie material

    ptr = _csr(recv, num_nodes)
    s, sq, mx, mn, tmx, tmn = sorted_moment_sketch(
        jnp.asarray(msg), jnp.asarray(ptr), with_ties=True,
        max_degree=max_deg, interpret=True)

    recv_j = jnp.asarray(recv)
    ref_s = seg.segment_sum(jnp.asarray(msg), recv_j, num_nodes)
    ref_sq = seg.segment_sum(jnp.asarray(msg) ** 2, recv_j, num_nodes)
    ref_mx = seg.segment_max(jnp.asarray(msg), recv_j, num_nodes)
    ref_mn = seg.segment_min(jnp.asarray(msg), recv_j, num_nodes)

    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(ref_sq),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(ref_mx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mn), np.asarray(ref_mn),
                               rtol=1e-5, atol=1e-5)

    # tie counts vs numpy
    ref_tmx = np.ones((num_nodes, F), np.float32)
    ref_tmn = np.ones((num_nodes, F), np.float32)
    for n in range(num_nodes):
        part = msg[ptr[n]:ptr[n + 1]]
        if len(part):
            ref_tmx[n] = (part == part.max(0)).sum(0)
            ref_tmn[n] = (part == part.min(0)).sum(0)
    np.testing.assert_allclose(np.asarray(tmx), ref_tmx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tmn), ref_tmn, atol=1e-6)


def test_pretrans_fused_sketch_matches_unfused():
    """sorted_pretrans_sketch (in-kernel msg = u[snd] + v[recv] + e@ke) must
    be bit-comparable to sorted_moment_sketch on the materialized messages.
    The variant is REJECTED for production at molecular scale
    (BENCH_kernels.json: pretrans_fused_experiment) but stays correct."""
    import jax
    import jax.numpy as jnp
    from pna_tpu.ops.pallas_kernels import (sorted_moment_sketch,
                                            sorted_pretrans_sketch)
    rng = np.random.RandomState(7)
    N, M, E, Fe = 300, 70, 2000, 12
    recv = np.sort(rng.randint(0, N, E))
    snd = rng.randint(0, N, E)
    ptr = np.zeros(N + 1, np.int32)
    ptr[1:] = np.searchsorted(recv, np.arange(1, N + 1))
    u = rng.randn(N, M).astype(np.float32)
    v = rng.randn(N, M).astype(np.float32)
    e = rng.randn(E, Fe).astype(np.float32)
    ke = rng.randn(Fe, M).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        msg = jnp.asarray(u)[jnp.asarray(snd)] + jnp.asarray(v)[
            jnp.asarray(recv)] + jnp.asarray(e) @ jnp.asarray(ke)
        ref = sorted_moment_sketch(msg, jnp.asarray(ptr), with_ties=True,
                                   interpret=True)
        got = sorted_pretrans_sketch(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(snd),
            jnp.asarray(ptr), jnp.asarray(e), jnp.asarray(ke),
            with_ties=True, interpret=True)
    for name, a, b in zip(('sum', 'sumsq', 'max', 'min', 'tmx', 'tmn'),
                          ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4, err_msg=name)
