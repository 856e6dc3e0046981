"""Test config: force CPU with 8 virtual devices.

This is the distributed-without-a-cluster strategy from SURVEY.md §5 item 4:
sharding/collective tests run on a fake 8-device CPU mesh, so CI never needs
real multi-chip hardware.

Note: this box's sitecustomize registers the axon TPU plugin and imports
jax at interpreter start, so env-var-only selection (JAX_PLATFORMS) is
too late here.  Backends initialize lazily, though — overriding
jax_platforms via jax.config before any computation still wins.  The
bench harness (bench.py) is what runs on the real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; got " + jax.default_backend())
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
