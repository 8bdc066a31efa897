"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding paths run everywhere (the JAX analog of a fake multi-node backend;
SURVEY.md §4).

Note: the environment's axon sitecustomize calls jax.config.update to pin
jax_platforms="axon,cpu" at interpreter start, so setting the env var is
not enough — we must update jax.config back after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    n = len(jax.devices())
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert n == 8, f"expected 8 virtual CPU devices, got {n}"
