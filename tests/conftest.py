"""Test fixtures. Tests run on a virtual 8-device CPU mesh so multi-chip
sharding paths execute without TPU hardware (strategy mirrored from the
reference's device fixture, /root/reference/tests/conftest.py:12-18, adapted
to JAX)."""

import os

# Must be set before jax initializes its backends. Force CPU: the test suite
# runs on a virtual 8-device CPU mesh even when a TPU is attached (the bench
# harness, not pytest, exercises real hardware).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu" at config level (overriding the env var), so pin
# the config back to cpu before any backend initializes.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the test session: score modules build fresh
# jit closures per instance, so identical HLO (e.g. the ELS k=3 scorer on
# the shared 8x8 fixtures) is otherwise re-compiled by every test that
# constructs a module. The cache dedupes those across tests (and across
# runs when CDT_TEST_CACHE pins a directory).
import tempfile

_cache_dir = os.environ.get("CDT_TEST_CACHE") or os.path.join(
    tempfile.gettempdir(), "cdt_test_jax_cache"
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without the knobs: compile as before
    pass

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(42)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(42)


@pytest.fixture
def batch_images():
    """Random NHWC image batch in [-1, 1]-ish range."""
    k = jax.random.PRNGKey(0)
    return jax.random.normal(k, (2, 32, 32, 3), jnp.float32)


@pytest.fixture
def batch_labels():
    return jnp.array([1, 7], jnp.int32)


def pytest_collection_modifyitems(items):
    """Auto-mark unit/integration by nodeid (reference conftest.py:156-162)."""
    for item in items:
        name = item.nodeid.lower()
        if any(s in name for s in ("end_to_end", "cli", "machine", "parity")):
            item.add_marker(pytest.mark.integration)
        else:
            item.add_marker(pytest.mark.unit)


@pytest.fixture
def tiny_dataset():
    """Small synthetic dataset: 16 images 8x8x1 in [-1,1], 4 classes."""
    rs = np.random.RandomState(123)
    images = rs.uniform(-1, 1, size=(16, 8, 8, 1)).astype(np.float32)
    labels = rs.randint(0, 4, size=(16,)).astype(np.int32)
    return images, labels
