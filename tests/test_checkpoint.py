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


def test_train_state_checkpoint_roundtrip(tmp_path, default_camera):
    """Round 5: TrainState save/load — resume a training run bit-exactly
    (params + optimizer moments + step), with the same config-token
    guard as the render checkpoint."""
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops import grad as gradlib
    from raytracingincuda_tpu.utils.checkpoint import (
        load_train_state, save_train_state,
    )

    W, H = 24, 16
    scene = build_scene(2, pad_to_multiple=8)
    target = jnp.zeros((H, W, 3), jnp.float32)
    init_fn, step_fn = gradlib.make_train_step(W, H, 1, 2,
                                               learning_rate=1e-2)
    step = jax.jit(step_fn)
    state = init_fn(scene.params)
    for _ in range(2):
        state, _loss = step(state, default_camera, scene.mat_type,
                            scene.active, target)

    path = str(tmp_path / "train.npz")
    save_train_state(path, state, token="cfg-v1")

    # restore into a FRESH init (the template) and compare bit-exactly
    restored = load_train_state(path, init_fn(scene.params),
                                token="cfg-v1")
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming produces the same next step as the uninterrupted run
    s1, l1 = step(state, default_camera, scene.mat_type, scene.active,
                  target)
    s2, l2 = step(restored, default_camera, scene.mat_type,
                  scene.active, target)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong token refuses
    with pytest.raises(ValueError, match="different run"):
        load_train_state(path, init_fn(scene.params), token="cfg-v2")
