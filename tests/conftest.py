"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's host
platform device-count override (SURVEY §4: mesh tests through
``--xla_force_host_platform_device_count``).  The real-chip benchmark path
lives in ``bench.py``, not in tests.
"""

import os

# DEFL_TEST_TPU=1 keeps the real TPU backend so the @needs_tpu Mosaic
# matrix (tests/test_decode_pl.py) compiles on hardware; every other run
# is pinned to the virtual 8-device CPU mesh.
_TPU_RUN = os.environ.get("DEFL_TEST_TPU") == "1"

if not _TPU_RUN:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu"
# via jax.config at interpreter start, overriding the env var — undo that so
# tests run on the virtual 8-device CPU mesh as intended.
import jax

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")

import pytest

# Sanitizer runs (CI native-asan / native-tsan jobs, LD_PRELOAD=libasan/
# libtsan) exercise the C++ tier; jaxlib's nanobind bindings cannot throw
# C++ exceptions through the preloaded sanitizer's interceptors
# (AddressSanitizer CHECK: real___cxa_throw == 0 inside MLIR tracing), so
# jit/tracing tests are skipped there — mark them @pytest.mark.needs_jax.
_SANITIZER = any(s in os.environ.get("LD_PRELOAD", "")
                 for s in ("libasan", "libtsan", "libubsan"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "needs_jax: test traces/jits through jaxlib (auto-skipped under "
        "sanitizer LD_PRELOAD, which jaxlib exceptions cannot cross)")


def pytest_collection_modifyitems(config, items):
    if not _SANITIZER:
        return
    skip = pytest.mark.skip(
        reason="jaxlib tracing cannot run under sanitizer LD_PRELOAD")
    for item in items:
        if "needs_jax" in item.keywords:
            item.add_marker(skip)
