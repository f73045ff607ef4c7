"""Multi-device tests on the simulated 8-device CPU mesh (SURVEY.md §4):
sharded render must be bit-identical to unsharded, and the sharded train
step must produce replicated, correct scene-parameter gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_scene
from raytracingincuda_tpu.ops import grad as gradlib
from raytracingincuda_tpu.ops.tracer import render
from raytracingincuda_tpu.parallel import mesh as meshlib

W, H = 64, 32


@pytest.fixture(scope="module")
def scene():
    return build_scene(2, pad_to_multiple=64)


@pytest.fixture(scope="module")
def cam():
    return CameraConfig.reference_default()


def test_eight_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices"
    )


def _assert_same_render(a, b):
    """Sharded and unsharded renders use bit-identical RNG streams; the
    remaining difference is XLA fusion/FMA reassociation between the two
    compiled programs. Require <= 1e-4 absolute (far below the 1/256 PPM
    quantization step) and identical quantized output up to 1 level."""
    from raytracingincuda_tpu.utils.ppm import quantize

    np.testing.assert_allclose(a, b, atol=1e-4)
    assert np.abs(quantize(a) - quantize(b)).max() <= 1


def test_sharded_render_matches_unsharded(scene, cam):
    base = np.asarray(render(scene, cam, W, H, 2, 4, chunk_pixels=2048))

    m = meshlib.make_mesh()
    sh = meshlib.pixel_sharding(m)
    f = jax.jit(
        lambda s, c: render(
            s, c, W, H, 2, 4, chunk_pixels=2048, pixel_sharding=sh
        )
    )
    sharded = np.asarray(f(scene, cam))
    _assert_same_render(base, sharded)


def test_sharded_render_2d_mesh(scene, cam):
    m = meshlib.make_mesh(axis_names=("dp", "sp"))
    assert m.devices.size == 8
    sh = meshlib.pixel_sharding(m)
    out = np.asarray(
        jax.jit(
            lambda s, c: render(
                s, c, W, H, 2, 4, chunk_pixels=2048, pixel_sharding=sh
            )
        )(scene, cam)
    )
    base = np.asarray(render(scene, cam, W, H, 2, 4, chunk_pixels=2048))
    _assert_same_render(base, out)


def test_sharded_grads_match_unsharded(scene, cam):
    target = jnp.zeros((H, W, 3))

    loss_u, (gp_u, _) = gradlib.render_grads(
        scene, cam, target, W, H, 1, 3, chunk_pixels=2048
    )

    m = meshlib.make_mesh()
    sh = meshlib.pixel_sharding(m)
    loss_s, (gp_s, _) = jax.jit(
        lambda s, c, t: gradlib.render_grads(
            s, c, t, W, H, 1, 3, chunk_pixels=2048, pixel_sharding=sh
        )
    )(scene, cam, target)

    np.testing.assert_allclose(float(loss_u), float(loss_s), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(gp_u), jax.tree_util.tree_leaves(gp_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_sharded_stream_matches_unsharded(cam):
    """Streaming-HBM kernel under shard_map (pixel tiles sharded over the
    8-device mesh) must reproduce the unsharded stream render — sharding
    only slices the lane->pixel assignment, never the per-pixel math."""
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )

    big = build_random_scene(600, pad_to_multiple=128, half_extent=10.0)
    stream = prepare_stream_scene(big, block=64)
    kw = dict(ray_tile=256, interpret=True)
    base = np.asarray(
        render_pallas_stream(stream, cam, W, H, 1, 4, **kw)
    )
    m = meshlib.make_mesh()
    sharded = np.asarray(
        render_pallas_stream(stream, cam, W, H, 1, 4, mesh=m, **kw)
    )
    _assert_same_render(base, sharded)


def test_sharded_stream_multi_pixel_lanes(cam):
    """Stream sharding composes with pixels_per_lane > 1 (the production
    stream config runs K=32) — same image as the unsharded K=1 render."""
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )

    big = build_random_scene(300, pad_to_multiple=128, half_extent=10.0)
    stream = prepare_stream_scene(big, block=64)
    base = np.asarray(
        render_pallas_stream(stream, cam, W, H, 2, 4,
                             ray_tile=128, interpret=True)
    )
    m = meshlib.make_mesh()
    sharded = np.asarray(
        render_pallas_stream(stream, cam, W, H, 2, 4, ray_tile=64,
                             pixels_per_lane=4, mesh=m, interpret=True)
    )
    _assert_same_render(base, sharded)


def test_sharded_adaptive_matches_unsharded(scene, cam):
    """Adaptive sampling's phase kernels under the 8-device mesh: the
    sharded schedule must produce the same image and the same per-pixel
    sample counts as the unsharded one (budgets derive from kernel
    accumulators that are bit-stable under resharding)."""
    from raytracingincuda_tpu.ops.adaptive import render_adaptive

    kw = dict(base_spp=4, max_spp=16, tol=0.1, ray_tile=64,
              interpret=True)
    base = render_adaptive(scene, cam, W, H, 4, **kw)
    m = meshlib.make_mesh()
    sharded = render_adaptive(scene, cam, W, H, 4, mesh=m, **kw)
    np.testing.assert_array_equal(
        np.asarray(base.spp_map), np.asarray(sharded.spp_map)
    )
    _assert_same_render(np.asarray(base.image), np.asarray(sharded.image))


def test_sharded_fused_train_step(scene, cam):
    """Fused MSE value-and-grad kernel (the production train step) under
    the mesh: losses must match the unsharded fused step."""
    target = jnp.zeros((H, W, 3))
    init_fn, step_u = gradlib.make_train_step(
        W, H, 1, 3, impl="fused", interpret=True
    )
    m = meshlib.make_mesh()
    _, step_s = gradlib.make_train_step(
        W, H, 1, 3, impl="fused", mesh=m, interpret=True
    )
    state_u = init_fn(scene.params)
    state_s = init_fn(scene.params)
    state_u, loss_u = step_u(state_u, cam, scene.mat_type, scene.active,
                             target)
    state_s, loss_s = step_s(state_s, cam, scene.mat_type, scene.active,
                             target)
    np.testing.assert_allclose(float(loss_u), float(loss_s), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_u.params),
        jax.tree_util.tree_leaves(state_s.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_sharded_train_step_runs(scene, cam):
    m = meshlib.make_mesh()
    sh = meshlib.pixel_sharding(m)
    init_fn, step_fn = gradlib.make_train_step(
        W, H, 1, 3, chunk_pixels=2048, pixel_sharding=sh
    )
    state = init_fn(scene.params)
    step_jit = jax.jit(step_fn)
    target = jnp.zeros((H, W, 3))
    state, loss = step_jit(state, cam, scene.mat_type, scene.active, target)
    state, loss2 = step_jit(state, cam, scene.mat_type, scene.active, target)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) <= float(loss) * 1.5  # sane progression


def test_fused_step_collective_profile(scene, cam):
    """Inspect the COMPILED HLO of the sharded fused train step for its
    communication profile (VERDICT r4 next #7).

    Asserted (the properties this layer controls):
      * the three cotangent psums (loss, d_scene_matrix, d_camera_row)
        COMBINE into exactly ONE all-reduce — one collective per step,
        not three serialized ones;
      * no stray all-gather / reduce-scatter in the step (the only
        other collectives are the collective-permutes assembling the
        pixel-sharded image output).

    Documented finding on the "overlapped with backward trace"
    north-star phrasing (BASELINE.json): async start/done splitting of
    collectives is a TPU-backend latency-hiding-scheduler pass and is
    NOT representable in CPU HLO (the virtual mesh lowers a synchronous
    all-reduce), so overlap cannot be asserted without >= 2 real chips.
    It is also immaterial at this payload: the scene is REPLICATED, so
    the all-reduced tuple is (1,1) + (n_slots,16) + (1,24) f32 — ~8 KB
    for scene 2 — microseconds on ICI against a multi-ms backward
    kernel. The property that matters for the north star is the single
    fused collective, which this test pins."""
    import re

    from raytracingincuda_tpu.models.scene import Scene
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    m = meshlib.make_mesh()
    W, H, S, B = 64, 32, 2, 4
    target = jnp.zeros((H, W, 3), jnp.float32)
    f = jax.jit(lambda p, c, t: mse_train_pallas(
        Scene(p, scene.mat_type, scene.active), c, t, W, H, S, B,
        mesh=m, interpret=True))
    txt = f.lower(scene.params, cam, target).compile().as_text()

    def count(op):
        return len(re.findall(rf"= [^=]*\b{op}\(", txt))

    n_allreduce = count("all-reduce")
    assert n_allreduce == 1, (
        f"expected the three cotangent psums to combine into ONE "
        f"all-reduce, found {n_allreduce}"
    )
    assert count("all-gather") == 0
    assert count("reduce-scatter") == 0
    # the single all-reduce carries the full cotangent tuple
    ar_line = next(line for line in txt.splitlines()
                   if re.search(r"= \([^)]*\) all-reduce\(", line))
    n_slots = scene.params.radius.shape[0]
    for shape in ("f32[1,1]", f"f32[{n_slots},16]", "f32[1,24]"):
        assert shape in ar_line, (shape, ar_line[:300])
