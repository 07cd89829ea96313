"""Test config: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding logic is
validated on a forced host-platform device mesh instead (the driver
separately dry-runs the multi-chip path via __graft_entry__).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image's sitecustomize imports jax at interpreter boot and registers
# the axon TPU backend, so env vars are too late here -- force the platform
# through the config API instead (effective as long as no backend has been
# initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


def pytest_collection_modifyitems(config, items):
    """The tpu tier needs real hardware and minutes of tunnel compiles;
    run it only when explicitly selected (pytest -m tpu)."""
    if "tpu" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="TPU hardware tier: run with -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def ref_data():
    return REFERENCE_DATA
