"""Test configuration: force an 8-virtual-device CPU platform.

The reference has no automated tests at all (SURVEY.md §4); this suite is the
test strategy it lacked.  Multi-chip sharding is validated on a virtual CPU
mesh — the TPU-native substitute for a fake NCCL backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment ships an experimental 'axon' TPU plugin that ignores the
# JAX_PLATFORMS env var; the config update is honoured.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Opt-in persistent compile cache for repeat suite runs (the supernet/DARTS
# step compiles for minutes on CPU): RECONFIGISP_CACHE_CPU=1.  Off by
# default — this XLA build's CPU AOT loader warns of machine-feature
# mismatches when reloading cached executables (see utils/cache.py).
from reconfigisp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def bgr_batch(rng):
    """(2, 32, 32, 3) BGR images in [0, 1]."""
    return rng.uniform(0.05, 0.95, (2, 32, 32, 3)).astype(np.float32)


@pytest.fixture
def bayer_batch(rng):
    """(2, 32, 32, 1) RGGB mosaics in [0, 1]."""
    return rng.uniform(0.05, 0.95, (2, 32, 32, 1)).astype(np.float32)
