"""Test harness: CPU backend with 8 virtual devices for mesh/sharding tests.

The reference repo has no tests (SURVEY.md §4); this suite is built per the
plan there: golden-value unit tests for the math, reference-module parity
oracles (importing /root/reference read-only), and a virtual CPU mesh for
distributed logic.
"""

import os
import sys

# Must happen before the CPU client initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


def _reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture(scope="session")
def reference_modeling():
    """Import the reference model read-only as a numerical parity oracle."""
    if not _reference_available():
        pytest.skip("reference checkout not present")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import mreserve.modeling as ref_modeling

    return ref_modeling


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
