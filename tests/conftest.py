"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multichip path on a virtual mesh; bench.py uses the real chip).

The environment's sitecustomize registers the TPU PJRT plugin and imports jax
at interpreter start, *before* conftest runs — so setting env vars here is too
late.  When we detect that, we re-exec pytest once with a scrubbed environment
(no TPU plugin, JAX_PLATFORMS=cpu, 8 host devices), first suspending pytest's
fd-level capture so the child's output reaches the terminal."""

import os
import sys

_REEXEC_FLAG = "PNA_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_REEXEC_FLAG) == "1":
        return False
    # re-exec only when the TPU plugin hook is active
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def pytest_configure(config):
    if not _needs_reexec():
        import jax
        # Parity tests compare fp32 activations against torch; JAX's DEFAULT
        # matmul precision is reduced (bf16-ish passes) even on CPU.
        jax.config.update("jax_default_matmul_precision", "highest")
        return

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the TPU plugin hook
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
