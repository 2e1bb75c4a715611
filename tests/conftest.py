"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multichip path)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Parity tests compare fp32 activations against torch; JAX's DEFAULT matmul
# precision is reduced (bf16-ish passes) even on CPU.
import jax  # noqa: E402  (env vars above must be set first)

jax.config.update("jax_default_matmul_precision", "highest")
