"""Golden-image regression tests.

The reference verifies by golden-image diffing between its variants
(SURVEY.md §4); here committed goldens (rendered by the jnp oracle, CPU,
seed 1227) pin the tracer's semantics across refactors. Comparison is on
quantized PPM values with a 1-level tolerance (float reassociation across
jax/XLA versions may flip values sitting on a quantization boundary)."""
import os

import numpy as np
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_scene
from raytracingincuda_tpu.ops.tracer import render
from raytracingincuda_tpu.utils.ppm import quantize, read_ppm

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
W, H, S, B = 48, 30, 4, 8


@pytest.mark.parametrize("scene_id", [1, 2, 3])
def test_oracle_matches_golden(scene_id, default_camera):
    golden, maxval = read_ppm(
        os.path.join(GOLDEN_DIR, f"scene{scene_id}_48x30_4spp_8b.ppm")
    )
    assert maxval == 255
    img = np.asarray(render(build_scene(scene_id),
                            CameraConfig.reference_default(), W, H, S, B))
    q = quantize(img)
    diff = np.abs(q.astype(int) - golden.astype(int))
    assert diff.max() <= 1, (
        f"scene {scene_id}: {int((diff > 1).sum())} components drifted by "
        f"more than one quantization level (max {int(diff.max())})"
    )
    # the bulk must be exactly equal
    assert (diff == 0).mean() > 0.99


@pytest.mark.slow
def test_pallas_matches_golden(default_camera):
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas

    golden, _ = read_ppm(
        os.path.join(GOLDEN_DIR, "scene2_48x30_4spp_8b.ppm")
    )
    img = np.asarray(
        render_pallas(build_scene(2), CameraConfig.reference_default(),
                      W, H, S, B, ray_tile=256, interpret=True)
    )
    diff = np.abs(quantize(img).astype(int) - golden.astype(int))
    assert diff.max() <= 1
