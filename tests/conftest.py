"""Test configuration: CPU backend with 8 virtual devices for sharding tests."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from open_duck_playground_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import pytest  # noqa: E402


REFERENCE_XMLS = "/root/reference/playground/open_duck_mini_v2/xmls"
FLAT_SCENE = f"{REFERENCE_XMLS}/scene_flat_terrain.xml"
BACKLASH_SCENE = f"{REFERENCE_XMLS}/scene_flat_terrain_backlash.xml"
ROUGH_SCENE = f"{REFERENCE_XMLS}/scene_rough_terrain_backlash.xml"


@pytest.fixture(scope="session")
def flat_model():
    from open_duck_playground_tpu.mjcf import compile_mjcf

    return compile_mjcf(FLAT_SCENE, timestep=0.002)


@pytest.fixture(scope="session")
def backlash_model():
    from open_duck_playground_tpu.mjcf import compile_mjcf

    return compile_mjcf(BACKLASH_SCENE, timestep=0.002)
