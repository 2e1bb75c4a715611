"""Real-TPU (non-interpret) correctness + timing check of the Pallas
sorted-edge moment-sketch kernel (pna_tpu/ops/pallas_kernels.py).

The pytest suite runs the kernel in interpreter mode on CPU
(tests/test_pallas_kernel.py, tests/test_pallas_bank.py) because conftest
re-execs onto the CPU backend; this script is the compiled-on-hardware leg:
it verifies {sum, sumsq, max, min, ties} against a numpy oracle on the real
chip and times the kernel vs the XLA segment ops, writing
``PALLAS_TPU_CHECK.json`` at the repo root.

Run:  python benchmarks/pallas_tpu_check.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from pna_tpu.ops.pallas_kernels import sorted_moment_sketch

    backend = jax.default_backend()
    result = {"backend": backend,
              "device": jax.devices()[0].device_kind,
              "checks": {}, "timing": {}}

    rng = np.random.RandomState(0)
    N, E, F = 4096, 65536, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    ptr = np.zeros(N + 1, np.int32)
    ptr[1:] = np.searchsorted(recv, np.arange(1, N + 1))
    ptr[-1] = E
    # quantized values force max/min ties
    msg = (rng.randint(-8, 9, size=(E, F)) * 0.25).astype(np.float32)

    outs = sorted_moment_sketch(jnp.asarray(msg), jnp.asarray(ptr),
                                with_ties=True)
    outs = [np.asarray(o) for o in jax.block_until_ready(outs)]
    s, sq, mx, mn, tmx, tmn = outs

    # numpy oracle
    o_s = np.zeros((N, F)); np.add.at(o_s, recv, msg)
    o_sq = np.zeros((N, F)); np.add.at(o_sq, recv, msg * msg)
    o_mx = np.full((N, F), -np.inf); np.maximum.at(o_mx, recv, msg)
    o_mn = np.full((N, F), np.inf); np.minimum.at(o_mn, recv, msg)
    empty = ~np.isfinite(o_mx)
    o_mx[empty] = 0.0; o_mn[empty] = 0.0
    o_tmx = np.zeros((N, F)); np.add.at(o_tmx, recv, (msg == o_mx[recv]))
    o_tmn = np.zeros((N, F)); np.add.at(o_tmn, recv, (msg == o_mn[recv]))
    o_tmx = np.maximum(o_tmx, 1.0); o_tmn = np.maximum(o_tmn, 1.0)

    for name, got, want, tol in (("sum", s, o_s, 1e-3),
                                 ("sumsq", sq, o_sq, 1e-3),
                                 ("max", mx, o_mx, 0.0),
                                 ("min", mn, o_mn, 0.0),
                                 ("ties_max", tmx, o_tmx, 0.0),
                                 ("ties_min", tmn, o_tmn, 0.0)):
        ok = bool(np.allclose(got, want, atol=tol, rtol=1e-6))
        result["checks"][name] = ok
        if not ok:
            bad = np.unravel_index(np.argmax(np.abs(got - want)), got.shape)
            result["checks"][f"{name}_max_err"] = float(
                np.abs(got - want).max())
            print(f"FAIL {name} at {bad}: got {got[bad]} want {want[bad]}")

    # timing: kernel vs XLA segment ops producing the same six outputs
    msg_d = jax.device_put(jnp.asarray(msg))
    ptr_d = jax.device_put(jnp.asarray(ptr))
    recv_d = jax.device_put(jnp.asarray(recv))

    def time_fn(f, *a, iters=50):
        out = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def xla_sketch(m, r):
        s = jax.ops.segment_sum(m, r, num_segments=N)
        sq = jax.ops.segment_sum(m * m, r, num_segments=N)
        mx = jax.ops.segment_max(m, r, num_segments=N)
        mn = jax.ops.segment_min(m, r, num_segments=N)
        tmx = jax.ops.segment_sum((m == mx[r]).astype(m.dtype), r,
                                  num_segments=N)
        tmn = jax.ops.segment_sum((m == mn[r]).astype(m.dtype), r,
                                  num_segments=N)
        return s, sq, mx, mn, tmx, tmn

    kernel = jax.jit(lambda m, p: sorted_moment_sketch(m, p, with_ties=True))
    result["timing"]["pallas_ms"] = round(time_fn(kernel, msg_d, ptr_d), 4)
    result["timing"]["xla_segment_ms"] = round(
        time_fn(xla_sketch, msg_d, recv_d), 4)
    result["timing"]["shape"] = {"N": N, "E": E, "F": F}

    # ---- backward sweep kernel (sorted_dmsg) vs its formula in XLA ----
    from pna_tpu.ops.pallas_kernels import sorted_dmsg, sorted_pretrans_dmsg
    fields = [rng.randn(N, F).astype(np.float32) for _ in range(4)]
    g_lin, g_quad, g_max, g_min = fields
    dmsg = np.asarray(jax.block_until_ready(sorted_dmsg(
        jnp.asarray(msg), jnp.asarray(ptr), *map(jnp.asarray, fields),
        jnp.asarray(o_mx.astype(np.float32)),
        jnp.asarray(o_mn.astype(np.float32)))))
    o_d = (g_lin[recv] + 2.0 * msg * g_quad[recv]
           + (msg == o_mx[recv]) * g_max[recv]
           + (msg == o_mn[recv]) * g_min[recv])
    ok = bool(np.allclose(dmsg[:E], o_d, rtol=1e-5, atol=1e-4))
    result["checks"]["dmsg"] = ok
    if not ok:
        result["checks"]["dmsg_max_err"] = float(np.abs(dmsg[:E] - o_d).max())
    dk = jax.jit(lambda m, p, *f: sorted_dmsg(m, p, *f))
    result["timing"]["dmsg_pallas_ms"] = round(time_fn(
        dk, msg_d, ptr_d, *map(jnp.asarray, fields),
        jnp.asarray(o_mx.astype(np.float32)),
        jnp.asarray(o_mn.astype(np.float32))), 4)

    @jax.jit
    def xla_dmsg(m, r, gl, gq, gx, gn, vx, vn):
        fe = jnp.concatenate([gl, gq, gx, gn, vx, vn], axis=-1)[r]
        return (fe[:, :F] + 2.0 * m * fe[:, F:2 * F]
                + (m == fe[:, 4 * F:5 * F]) * fe[:, 2 * F:3 * F]
                + (m == fe[:, 5 * F:]) * fe[:, 3 * F:4 * F])
    result["timing"]["dmsg_xla_gather_ms"] = round(time_fn(
        xla_dmsg, msg_d, recv_d, *map(jnp.asarray, fields),
        jnp.asarray(o_mx.astype(np.float32)),
        jnp.asarray(o_mn.astype(np.float32))), 4)

    # ---- fused pretrans fwd + recompute bwd, compiled, vs XLA-formed msg --
    from pna_tpu.ops.pallas_kernels import sorted_pretrans_sketch
    snd = rng.randint(0, N, E).astype(np.int32)
    u = (rng.randint(-8, 9, size=(N, F)) * 0.25).astype(np.float32)
    v = (rng.randint(-8, 9, size=(N, F)) * 0.25).astype(np.float32)
    pmsg = u[snd] + v[recv]
    fouts = jax.block_until_ready(sorted_pretrans_sketch(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(snd), jnp.asarray(ptr),
        with_ties=True))
    xouts = jax.block_until_ready(sorted_moment_sketch(
        jnp.asarray(pmsg), jnp.asarray(ptr), with_ties=True))
    fus_ok = all(bool(np.allclose(np.asarray(a), np.asarray(b),
                                  rtol=1e-5, atol=1e-4))
                 for a, b in zip(fouts, xouts))
    result["checks"]["pretrans_sketch_fused"] = fus_ok
    f_mx, f_mn = np.asarray(fouts[2]), np.asarray(fouts[3])
    pd_msg, pd_v = jax.block_until_ready(sorted_pretrans_dmsg(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(snd), jnp.asarray(ptr),
        *map(jnp.asarray, fields), jnp.asarray(f_mx), jnp.asarray(f_mn)))
    o_pd = (g_lin[recv] + 2.0 * pmsg * g_quad[recv]
            + (pmsg == f_mx[recv]) * g_max[recv]
            + (pmsg == f_mn[recv]) * g_min[recv])
    ok = bool(np.allclose(np.asarray(pd_msg)[:E], o_pd, rtol=1e-5, atol=1e-4))
    result["checks"]["pretrans_dmsg"] = ok
    o_dv = np.zeros((N, F), np.float32)
    np.add.at(o_dv, recv, o_pd)
    ok = bool(np.allclose(np.asarray(pd_v), o_dv, rtol=1e-4, atol=1e-3))
    result["checks"]["pretrans_dv"] = ok
    fk = jax.jit(lambda *a: sorted_pretrans_sketch(*a, with_ties=True))
    result["timing"]["pretrans_sketch_ms"] = round(time_fn(
        fk, jnp.asarray(u), jnp.asarray(v), jnp.asarray(snd), ptr_d), 4)
    bk = jax.jit(lambda *a: sorted_pretrans_dmsg(*a))
    result["timing"]["pretrans_dmsg_ms"] = round(time_fn(
        bk, jnp.asarray(u), jnp.asarray(v), jnp.asarray(snd), ptr_d,
        *map(jnp.asarray, fields), jnp.asarray(f_mx), jnp.asarray(f_mn)), 4)

    ok = all(v for k, v in result["checks"].items() if isinstance(v, bool))
    result["ok"] = ok
    with open(os.path.join(REPO, "PALLAS_TPU_CHECK.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
