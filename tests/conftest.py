"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding tests run without TPU hardware, and enable x64 so float64
conformance checks against the reference's math are possible."""

import os

# Must be set before jax is imported anywhere. Tests run on a virtual
# 8-device CPU mesh by default (override with KP_TPU_TEST_PLATFORM=axon to
# run against real hardware).
os.environ["JAX_PLATFORMS"] = os.environ.get("KP_TPU_TEST_PLATFORM", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms to "axon,cpu"; override so tests run on the virtual CPU
# mesh regardless.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = Path("/root/reference/src/kikuchipy/data")

needs_reference_data = pytest.mark.skipif(
    not REFERENCE_DATA.exists(), reason="reference data files not available"
)


@pytest.fixture
def dummy_patterns() -> np.ndarray:
    """The reference test suite's hard-coded (3, 3) x (3, 3) uint8 scan
    (see /root/reference/conftest.py:166-188); used to compare our kernel
    outputs against the reference's hard-coded expected outputs."""
    # fmt: off
    data = np.array(
        [
            5, 6, 5, 7, 6, 5, 6, 1, 0, 9, 7, 8, 7, 0, 8, 8, 7, 6, 0, 3, 3, 5, 2,
            9, 3, 3, 9, 8, 1, 7, 6, 4, 8, 8, 2, 2, 4, 0, 9, 0, 1, 0, 2, 2, 5, 8,
            6, 0, 4, 7, 7, 7, 6, 0, 4, 1, 6, 3, 4, 0, 1, 1, 0, 5, 9, 8, 4, 6, 0,
            2, 9, 2, 9, 4, 3, 6, 5, 6, 2, 5, 9
        ],
        dtype=np.uint8,
    ).reshape((3, 3, 3, 3))
    # fmt: on
    return data


@pytest.fixture
def dummy_background() -> np.ndarray:
    """Static background for ``dummy_patterns``
    (see /root/reference/conftest.py:223-230)."""
    return np.array([5, 4, 5, 4, 3, 4, 4, 4, 3], dtype=np.uint8).reshape((3, 3))


@pytest.fixture
def nickel_ebsd_small_path() -> Path:
    p = REFERENCE_DATA / "kikuchipy_h5ebsd" / "patterns.h5"
    if not p.exists():
        pytest.skip("nickel_ebsd_small data not available")
    return p


@pytest.fixture
def nickel_master_pattern_path() -> Path:
    p = (
        REFERENCE_DATA
        / "emsoft_ebsd_master_pattern"
        / "ni_mc_mp_20kv_uint8_gzip_opts9.h5"
    )
    if not p.exists():
        pytest.skip("nickel master pattern data not available")
    return p
