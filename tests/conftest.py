import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; x64 is enabled so float64 reference checks are exact.
# force-set: the harness presets JAX_PLATFORMS (e.g. to a TPU tunnel); unit
# tests must run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc

import jax
import pytest

jax.config.update("jax_enable_x64", True)
# The axon boot hook (sitecustomize) pins jax_platforms="axon,cpu" through
# jax.config, which overrides the env var — override it back to CPU here,
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """The full suite keeps every compiled executable alive in one process
    (~157 tests x 8 virtual CPU devices); past ~140 tests the CPU client
    nondeterministically segfaults/aborts inside backend_compile (observed
    three times, each at a different test — cumulative, not test-specific:
    either half of the suite alone is green).  Dropping the executables
    between modules bounds the live-program count; the recompile cost is
    negligible because jit signatures are rarely shared across modules."""
    yield
    jax.clear_caches()
    gc.collect()
