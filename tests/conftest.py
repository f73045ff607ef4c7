"""Test environment: force CPU with 8 virtual devices (SURVEY.md §4).

Multi-chip sharding is validated without TPU hardware by a simulated CPU
mesh, exactly how the driver's dryrun validates it. Must run before any
jax import, hence env mutation at conftest import time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment may force-register a TPU plugin at interpreter start
# (sitecustomize) that overrides JAX_PLATFORMS; pin the platform via config
# before any backend initializes. Tests always run on the virtual 8-device
# CPU mesh (SURVEY.md §4).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_scene():
    from raytracingincuda_tpu.models.scene import build_scene

    return build_scene(2, pad_to_multiple=64)


@pytest.fixture(scope="session")
def default_camera():
    from raytracingincuda_tpu.models.camera import CameraConfig

    return CameraConfig.reference_default()
