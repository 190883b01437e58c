"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on fake CPU devices (SURVEY.md §4.5);
the real-TPU path is exercised by bench.py / __graft_entry__.py.
"""

import os

# Force CPU even if the environment points at a real accelerator (the session
# may export JAX_PLATFORMS=axon); tests must be hermetic and exercise the
# virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Belt and braces: the env var must be in place before backends initialize,
# but jax may already have parsed its config from an earlier import.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs skip CPU re-compiles of the
# decode/sim graphs (the dominant suite cost after construction fixtures).
_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
