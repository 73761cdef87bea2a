"""Test configuration: force a hermetic 8-device virtual CPU mesh.

All tests run on CPU (f32, deterministic) with 8 virtual devices so the
multi-chip sharding paths (SURVEY.md §4 "Distributed w/o cluster") are
exercised without TPU hardware. TPU-only tests are marked ``tpu`` and
skipped unless a real TPU backend is present; run them on a chip with

    DVSG_TEST_TPU=1 python -m pytest tests/ -q -m tpu

which keeps the process on the container's default (TPU) platform
instead of forcing the virtual CPU mesh.
"""

import os

_ON_TPU = os.environ.get("DVSG_TEST_TPU") == "1"

if not _ON_TPU:
    # Must be set before the first JAX backend initialization in this
    # process. XLA_FLAGS is read at backend init (lazy), so setting it
    # here is early enough even though sitecustomize may already have
    # imported jax machinery.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _ON_TPU:
    # The container's sitecustomize registers an out-of-process TPU
    # platform ("axon") and forces JAX_PLATFORMS=axon; the config API
    # overrides it.
    jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU backend (skipped on CPU runs)")


def pytest_collection_modifyitems(config, items):
    # The container's TPU platform registers as "axon" (an out-of-process
    # tunnel), not "tpu" — match bench.py's convention or DVSG_TEST_TPU=1
    # silently skips every tpu-marked test (ADVICE round-3).
    on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    skip = pytest.mark.skip(reason="no TPU backend in test process")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
