import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware.  Must be set before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported by a sitecustomize hook that captured
# JAX_PLATFORMS from the environment; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the suite: this box has ONE cpu core and
# XLA:CPU takes minutes to compile the big split-complex SoA programs
# (measured 296 s for one sap_smooth at 4^4); with a warm cache the full
# non-slow suite fits the 10-minute certification budget.  Same-machine CPU
# executable reuse is safe (the cross-machine SIGILL concern that keeps the
# package-level cache TPU-only does not apply to a local test cache).
_cache = os.path.expanduser("~/.cache/ddalphaamg_tpu/xla-cpu-tests")
os.makedirs(_cache, exist_ok=True)

# Pre-seed an empty cache from the committed warm-cache tarball
# (scripts/make_test_cache_seed.sh regenerates it): a cold ~/.cache pays
# multi-minute XLA:CPU compiles per big program and the suite cannot fit a
# 10-minute certification budget without it.  Stale entries are harmless
# (cache misses just recompile); the seed is machine-family-specific AOT
# code, regenerated whenever kernels change.
_seed = os.path.join(os.path.dirname(__file__), "cache_seed.tar.zst")
if not os.listdir(_cache) and os.path.exists(_seed):
    import subprocess
    subprocess.run(["tar", "--zstd", "-xf", _seed, "-C", _cache],
                   check=False)

jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


REFERENCE_CONF_4 = "/root/reference/conf/4x4x4x4b6.0000id3n1"
REFERENCE_CONF_8 = "/root/reference/conf/8x8x8x8b6.0000id3n1"


@pytest.fixture(scope="session")
def conf4():
    return REFERENCE_CONF_4


@pytest.fixture(scope="session")
def conf8():
    return REFERENCE_CONF_8
