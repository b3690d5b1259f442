"""Test config: force CPU with an 8-device virtual mesh so sharding tests
run without TPU hardware. Must run before jax is imported anywhere."""
import os
import sys

# the session env pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on
# the virtual CPU mesh regardless
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms="axon,cpu" AFTER env vars are read — override it back so
# tests never claim the (single-client) TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/scenes"


@pytest.fixture(scope="session")
def ref_scenes():
    if not os.path.isdir(REFERENCE_SCENES):
        pytest.skip("reference scenes not available")
    return REFERENCE_SCENES
