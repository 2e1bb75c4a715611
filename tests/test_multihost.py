"""Multi-process (multi-"host") distributed backend test.

Two OS processes x 4 virtual CPU devices each form a 2('data', over DCN) x
4('graph', over ICI) global mesh via jax.distributed +
mesh_utils.create_hybrid_device_mesh, and run one full edge-partitioned
train step of the flagship DistributedPNANet (halo exchange, cross-device
BatchNorm, readout psum, SGD update).  Both processes must report the same
finite loss/param fingerprint, and it must match a single-process run of the
identical 2x4 logical mesh — proving the collective backend is correct
across process (DCN) boundaries, not just inside one process.

The reference has no distributed backend at all (SURVEY §2.5); this is the
framework's `jax.distributed` story, exercised the way multi-host TPU code is
tested without a pod: one process per simulated host."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU plugin in children
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _parse(out: str):
    m = re.search(r"MH_LOSS ([-\d.]+) PSUM ([-\d.]+)", out)
    assert m, f"no MH_LOSS line in output:\n{out}"
    return float(m.group(1)), float(m.group(2))


def test_two_process_train_step_matches_single_process():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the single-process oracle")

    port = _free_port()
    env = _child_env()
    procs = [subprocess.Popen(
        [sys.executable, CHILD, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    losses_psums = [_parse(o) for o in outs]
    (l0, s0), (l1, s1) = losses_psums
    assert np.isfinite(l0)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)

    # single-process oracle on the same 2x4 logical mesh (parent's 8 devices)
    from tests._multihost_child import run
    o_loss, o_psum = run(0, 1, None)
    np.testing.assert_allclose(l0, o_loss, rtol=1e-5)
    np.testing.assert_allclose(s0, o_psum, rtol=1e-5)
