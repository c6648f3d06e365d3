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

import pytest  # noqa: E402


REFERENCE_CONF_4 = "/root/reference/conf/4x4x4x4b6.0000id3n1"
REFERENCE_CONF_8 = "/root/reference/conf/8x8x8x8b6.0000id3n1"


@pytest.fixture(scope="session")
def conf4():
    return REFERENCE_CONF_4


@pytest.fixture(scope="session")
def conf8():
    return REFERENCE_CONF_8
