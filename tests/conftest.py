"""Test configuration: CPU-simulated multi-device mesh.

Mirrors the reference's "distributed testing without a cluster" strategy
(oversubscribed mpiexec ranks, reference: .ci_tests.sh, TEST/pdtest.sh) using
XLA's virtual host devices: 8 CPU devices per process, so the 2D/3D mesh
logic runs exactly as on an 8-chip TPU slice.
"""

import os

# Tests always run on (virtual multi-device) CPU — override any ambient
# platform unless explicitly requested otherwise. jax may already be imported
# by a pytest plugin, but the backend initializes lazily, so config updates
# here still take effect as long as no device has been touched yet.
_platform = os.environ.get("SLU_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

jax.config.update("jax_compilation_cache_dir", "/tmp/slu_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
