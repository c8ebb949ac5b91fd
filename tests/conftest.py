"""Test env: force JAX onto CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver dry-runs the real
multi-chip path separately)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Some environments (the axon TPU tunnel) override JAX_PLATFORMS and would
# silently run "CPU" tests on the real chip; pin the default device to CPU
# explicitly as a belt-and-braces fallback.
import jax  # noqa: E402

if jax.default_backend() != "cpu":
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass
