"""Incremental rendering / checkpoint-resume tests (SURVEY.md §5)."""
import numpy as np
import pytest

from raytracingincuda_tpu.config import RenderConfig
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.ops.tracer import render
from raytracingincuda_tpu.utils import checkpoint as ckpt

W, H = 32, 20


def cfg_for(samples):
    return RenderConfig(scene_id=2, width=W, height=H, samples=samples,
                        bounces=4)


def test_sample_offset_partitions_exactly(tiny_scene, default_camera):
    """sum of [0,2) and [2,6) sample accumulators == [0,6) accumulator."""
    full = np.asarray(
        render(tiny_scene, default_camera, W, H, 6, 4,
               accumulate_only=True)
    )
    a = np.asarray(
        render(tiny_scene, default_camera, W, H, 2, 4,
               accumulate_only=True)
    )
    b = np.asarray(
        render(tiny_scene, default_camera, W, H, 4, 4,
               sample_offset=2, accumulate_only=True)
    )
    np.testing.assert_allclose(a + b, full, rtol=1e-5, atol=1e-6)


def test_incremental_matches_oneshot(tiny_scene, default_camera, tmp_path):
    cfg = cfg_for(6)
    path = str(tmp_path / "ck.npz")
    img_inc = ckpt.render_incremental(
        tiny_scene, default_camera, cfg,
        checkpoint_path=path, samples_per_round=2,
    )
    img_one = np.asarray(
        render(tiny_scene, default_camera, W, H, 6, 4)
    )
    np.testing.assert_allclose(img_inc, img_one, atol=2e-5)


def test_resume_from_partial(tiny_scene, default_camera, tmp_path):
    cfg = cfg_for(6)
    path = str(tmp_path / "ck.npz")
    # simulate an interrupted run: 2 of 6 samples done
    part = np.asarray(
        render(tiny_scene, default_camera, W, H, 2, 4,
               accumulate_only=True)
    )
    ckpt.save_checkpoint(path, part, 2, cfg)
    img = ckpt.render_incremental(
        tiny_scene, default_camera, cfg,
        checkpoint_path=path, samples_per_round=4,
    )
    img_one = np.asarray(render(tiny_scene, default_camera, W, H, 6, 4))
    np.testing.assert_allclose(img, img_one, atol=2e-5)
    # checkpoint now records completion
    acc, done = ckpt.load_checkpoint(path, cfg)
    assert done == 6


def test_checkpoint_config_mismatch_rejected(tiny_scene, default_camera,
                                             tmp_path):
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, np.zeros((H, W, 3), np.float32), 2,
                         cfg_for(6))
    with pytest.raises(ValueError, match="different render config"):
        ckpt.load_checkpoint(path, cfg_for(8))
