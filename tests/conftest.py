"""Test env: force JAX onto CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver dry-runs the real
multi-chip path separately)."""

import os

# Hard-force CPU: environments that preset JAX_PLATFORMS (e.g. the axon
# TPU tunnel) would otherwise initialize a remote backend inside the
# test run — slow at best, a multi-minute hang when the tunnel is down.
# The tunnel's sitecustomize imports jax at interpreter start, so the
# env var is already baked into jax's config — override the CONFIG, not
# just the env.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# the wide-kernel sweep unroll is a pure perf lever (overshot trips are
# exact no-ops) but interpret mode EXECUTES every unrolled trip — at the
# production default (8) the CPU kernel parities run ~4-8x slower.  Pin
# 1 for tests; unroll parity itself is A/B'd on chip and was verified in
# interpret mode at 1/2/4/8 when the lever landed.
os.environ.setdefault("GS360X_WIDE3_UNROLL", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier (heavy interpret-mode kernel parities); "
             "also enabled by GS360X_RUN_SLOW=1")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy interpret-mode kernel parity (run with --runslow or "
        "GS360X_RUN_SLOW=1; the fast subset stays on by default)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    if config.getoption("--runslow") or os.environ.get("GS360X_RUN_SLOW"):
        return
    skip = _pytest.mark.skip(reason="slow tier: pass --runslow or set "
                                    "GS360X_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
