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


PROD_W, PROD_H, PROD_S, PROD_B = 64, 40, 8, 6


def _production_order(scene, cam, kpl, rt):
    """The render_api production prepass, in interpret mode: difficulty
    segments -> bucket order -> extended to the main render's padding."""
    import jax.numpy as jnp

    from raytracingincuda_tpu.ops.pallas_kernel import (
        _round_up, difficulty_order, measure_difficulty,
    )

    pd, ps = min(8, PROD_B), min(6, PROD_S)
    seg = measure_difficulty(
        scene, cam, PROD_W, PROD_H, probe_depth=pd, probe_samples=ps,
        interpret=True,
    )
    order = difficulty_order(seg, pd, ps)
    padded = _round_up(PROD_W * PROD_H, kpl * rt)
    if order.shape[0] < padded:
        order = jnp.concatenate([
            order, jnp.arange(order.shape[0], padded, dtype=jnp.uint32),
        ])
    return order


@pytest.mark.slow
@pytest.mark.parametrize("scene_id", [1, 2, 3])
def test_production_stack_matches_golden(scene_id):
    """Pin the FULL production auto-stack bitwise (VERDICT r4 next #9):
    difficulty-sorted tiles + multi-pixel lanes (auto K8 at 8 spp) +
    auto ray_tile + rr2, through the Pallas kernel in interpret mode —
    the exact knob set render_api.make_renderer picks for this config
    on TPU. Catches auto-knob regressions (a changed K, tile, order, or
    rr wiring shifts sampling streams and the image) that the pairwise
    equality tests cannot see."""
    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas

    cfg = RenderConfig(scene_id=scene_id, width=PROD_W, height=PROD_H,
                       samples=PROD_S, bounces=PROD_B, rr_start=2)
    kpl, rt = cfg.effective_pixels_per_lane(), cfg.effective_ray_tile()
    assert (kpl, rt) == (8, 512), "production autos moved — regenerate " \
        "the prod goldens if intentional"
    scene = build_scene(scene_id)
    cam = CameraConfig.reference_default()
    order = _production_order(scene, cam, kpl, rt)
    img = np.asarray(render_pallas(
        scene, cam, PROD_W, PROD_H, PROD_S, PROD_B, rr_start=2,
        pixels_per_lane=kpl, ray_tile=rt, pixel_order=order,
        interpret=True,
    ))
    golden, maxval = read_ppm(os.path.join(
        GOLDEN_DIR,
        f"scene{scene_id}_prod_64x40_8spp_6b_rr2.ppm",
    ))
    assert maxval == 255
    diff = np.abs(quantize(img).astype(int) - golden.astype(int))
    assert diff.max() <= 1, (
        f"scene {scene_id}: production-stack image drifted "
        f"(max {int(diff.max())} levels, {int((diff > 1).sum())} comps)"
    )
    assert (diff == 0).mean() > 0.99


@pytest.mark.slow
def test_fused_full_park_matches_production_golden():
    """The fused full-park train step's IMAGE output (the auto training
    path) renders the same production stack — pin it to the same golden
    so the train-side autos can't silently drift from the render
    side's."""
    import jax.numpy as jnp

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    cfg = RenderConfig(scene_id=2, width=PROD_W, height=PROD_H,
                       samples=PROD_S, bounces=PROD_B, rr_start=2)
    kpl, rt = cfg.effective_pixels_per_lane(), cfg.effective_ray_tile()
    scene = build_scene(2)
    cam = CameraConfig.reference_default()
    order = _production_order(scene, cam, kpl, rt)
    target = jnp.zeros((PROD_H, PROD_W, 3), jnp.float32)
    _loss, img, *_grads = mse_train_pallas(
        scene, cam, target, PROD_W, PROD_H, PROD_S, PROD_B,
        rr_start=2, pixel_order=order, interpret=True,
        park_residuals="hbm", pixels_per_lane=kpl, ray_tile=rt,
    )
    golden, _ = read_ppm(os.path.join(
        GOLDEN_DIR, "scene2_prod_64x40_8spp_6b_rr2.ppm",
    ))
    diff = np.abs(quantize(np.asarray(img)).astype(int)
                  - golden.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99
