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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; got " + jax.default_backend())
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles hundreds of distinct XLA programs in one
    process; at ~60% through, the accumulated jit/LLVM state made the
    CPU compiler segfault DETERMINISTICALLY on the (large) pooled-NUTS
    sharded program (test_sharding.py::test_nuts_pooled_step_jitter,
    jaxlib backend_compile_and_load, 2/2 clean full-suite runs) while
    every module passes in isolation.  Dropping compiled programs
    between modules removes the state the crash depends on; tests
    don't share jitted callables across modules, so the only cost is
    an occasional recompile.
    """
    yield
    jax.clear_caches()
