"""Test configuration.

Tests run on the CPU backend with 8 simulated devices so that sharding /
collective logic is exercised without TPU hardware (the TPU analogue of the
reference's CUDASIM CI setup, see /root/reference/.github/workflows/ci.yml:24,
but actually executing the real code path instead of a simulator).

Environment variables must be set before jax initializes its backends, which
is why this happens at conftest import time.
"""

import os

# NOTE: this environment pre-imports jax via a site hook (/root/.axon_site)
# and presets JAX_PLATFORMS=axon, so env vars alone cannot steer the
# platform — we must go through jax.config.update after import.  XLA_FLAGS
# is still read lazily at backend init, so setting it here works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from pathlib import Path  # noqa: E402

import jax  # noqa: E402

if os.environ.get("DVO_TEST_ON_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

# XLA compiles are slow in this environment (~0.3 s per executable) and
# eager mode compiles every primitive separately.  Framework code is fully
# jitted; the persistent cache makes repeated test runs fast.  The CPU
# cache is MACHINE-SCOPED (utils/cache.py): XLA:CPU AOT executables encode
# the host CPU's feature set but the cache key does not (jax 0.9), and a
# foreign entry can CHECK-abort the whole process mid-suite.
from dense_visual_odometry_tpu.utils.cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache("cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Bundled 10-frame TUM-style RGB-D set shipped with the reference repo
# (read-only mount).  Tests that need real frames use these fixtures and are
# skipped if the data is unavailable.
REFERENCE_TEST_DATA = Path(
    os.environ.get("DVO_TEST_DATA", "/root/reference/tests/test_data")
)


def _have_real_data() -> bool:
    return (REFERENCE_TEST_DATA / "ground_truth.json").exists()


@pytest.fixture(scope="module", autouse=True)
def _bound_executable_residency():
    """Drop compiled-executable references at every module boundary.

    A single ``pytest tests/`` process compiles/loads thousands of XLA:CPU
    executables (plus one giant uncacheable two-branch interpret-mode
    program); past a cumulative threshold the XLA:CPU JIT aborts the
    process on the next large compile or cache deserialize (observed as
    ``Fatal Python error: Aborted`` in ``backend_compile_and_load`` /
    ``get_executable_and_time``).  Clearing jit caches between modules
    bounds residency; the persistent cache makes reloads cheap.
    """
    yield
    jax.clear_caches()


requires_real_data = pytest.mark.skipif(
    not _have_real_data(), reason="bundled RGB-D test frames not available"
)


@pytest.fixture(scope="session")
def test_data_dir() -> Path:
    if not _have_real_data():
        pytest.skip("bundled RGB-D test frames not available")
    return REFERENCE_TEST_DATA


@pytest.fixture()
def rng() -> np.random.Generator:
    # Function-scoped: every test draws the same values regardless of which
    # other tests ran before it (a session-scoped generator made outcomes
    # depend on test ordering).
    return np.random.default_rng(1234)
