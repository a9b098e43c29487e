"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4.5: a single physical TPU chip is available in dev, so
multi-chip sharding is validated the standard JAX way — CPU backend with
``--xla_force_host_platform_device_count=8``.

Note: the axon sitecustomize imports jax at interpreter start with
``JAX_PLATFORMS=axon``, so the env-var route is too late here; we switch
platforms through ``jax.config`` (backends are not initialised yet at
conftest time, so the XLA_FLAGS fake-device knob still applies).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Exact-oracle tests compare against float64 scipy references; run the CPU
# test suite in x64.  (TPU float32 behaviour is covered by tolerance tests.)
jax.config.update("jax_enable_x64", True)

# SURVEY.md §5.2: trap NaNs at the primitive level throughout CI.  Any test
# that legitimately manufactures NaNs (e.g. cube sanitization) must scope
# them with the no_debug_nans fixture below.
jax.config.update("jax_debug_nans", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled programs between test modules.

    The full suite compiles thousands of XLA programs; with the 2026-08-21
    container stack the in-process CPU compiler segfaulted DETERMINISTICALLY
    near the 76% mark (test_sweep_sharded's first 8-device compile) once
    ~250 tests' programs were live, while the same file passes alone in
    90 s.  Bounding the live-program count per module keeps the suite
    green; the cost is re-compiling shared helpers per module (~minutes
    over the whole suite).
    """
    yield
    jax.clear_caches()
