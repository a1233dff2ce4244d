"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference gates GPU tests on hardware (SURVEY.md §4); we instead test
the multi-chip sharding logic on CPU via XLA's host-platform device-count
flag, as the build plan requires.  These env vars must be set before jax
is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_factors():
    from rcppml_tpu.utils.simulate import simulate_nmf
    return simulate_nmf(m=60, n=80, k=4, noise=0.02, seed=123)
