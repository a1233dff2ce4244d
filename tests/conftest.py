"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference gates GPU tests on hardware (SURVEY.md §4); we instead test
the multi-chip sharding logic on CPU via XLA's host-platform device-count
flag, as the build plan requires.  These env vars must be set before jax
is imported anywhere.
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the driver environment
# sets it to the TPU 'axon' tunnel; something in the image re-injects
# "axon,cpu" over the env var, so we must also override via jax.config).
#
# RCPPML_TPU_TESTS=1 keeps the ambient TPU backend instead — the analog of
# the reference's hardware-gated GPU suite (test_gpu_accuracy.R:24
# skip_if_not(gpu_available())); tests/test_tpu_kernels.py self-skips when
# the backend is not a TPU.  Run it alone: only ONE process may hold the
# axon TPU tunnel.
_ON_TPU = bool(os.environ.get("RCPPML_TPU_TESTS"))

import jax

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

import gc

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Free compiled XLA executables between test modules.

    Every compiled executable holds JIT code pages as live memory
    mappings; the full suite compiles thousands and crosses the kernel's
    vm.max_map_count (65530) mid-run, at which point mmap failures inside
    XLA's compiler segfault the process.  Clearing the jit caches per
    module keeps the mapping count bounded (measured: ~250 maps/test
    unbounded, segfault at ~450 tests; bounded with this fixture)."""
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def small_factors():
    from rcppml_tpu.utils.simulate import simulate_nmf
    return simulate_nmf(m=60, n=80, k=4, noise=0.02, seed=123)
