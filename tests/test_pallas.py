"""Pallas wavefront kernel vs jnp oracle (interpret mode on CPU).

The kernel consumes bit-identical Threefry streams to the oracle, so images
must agree to float-associativity precision (SURVEY.md §4 acceptance)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import LAMBERTIAN, build_scene
from raytracingincuda_tpu.ops.pallas_kernel import (
    pack_camera, pack_scene_matrix, render_pallas,
)
from raytracingincuda_tpu.ops.tracer import render
from raytracingincuda_tpu.models.camera import initialize
from helpers import empty_scene, scene_from_spheres

W, H = 40, 24


def run_both(scene, cam, samples=2, bounces=6, **kw):
    oracle = np.asarray(
        render(scene, cam, W, H, samples, bounces, chunk_pixels=512,
               **kw)
    )
    pallas = np.asarray(
        render_pallas(scene, cam, W, H, samples, bounces, ray_tile=256,
                      interpret=True, **kw)
    )
    return oracle, pallas


@pytest.mark.slow
def test_matches_oracle_scene2(tiny_scene, default_camera):
    o, p = run_both(tiny_scene, default_camera)
    np.testing.assert_allclose(o, p, atol=5e-5)


@pytest.mark.slow
def test_matches_oracle_empty_scene(default_camera):
    o, p = run_both(empty_scene(pad_to=128), default_camera)
    np.testing.assert_allclose(o, p, atol=5e-6)


@pytest.mark.slow
def test_matches_oracle_legacy_sky(tiny_scene, default_camera):
    o, p = run_both(tiny_scene, default_camera, legacy_sky=True)
    np.testing.assert_allclose(o, p, atol=5e-5)


@pytest.mark.slow
def test_single_sphere_no_gamma(default_camera):
    scene = scene_from_spheres(
        [dict(center=(0, 0, 0), radius=2.0, mat=LAMBERTIAN,
              albedo=(0.6, 0.4, 0.2))],
        pad_to=128,
    )
    o, p = run_both(scene, default_camera, gamma=False)
    np.testing.assert_allclose(o, p, atol=2e-5)


def test_pack_scene_matrix_layout(tiny_scene):
    m = np.asarray(pack_scene_matrix(tiny_scene))
    assert m.shape == (tiny_scene.num_slots, 16)
    np.testing.assert_allclose(m[:, 0], np.asarray(tiny_scene.params.center.x))
    np.testing.assert_allclose(m[:, 3], np.asarray(tiny_scene.params.radius))
    np.testing.assert_allclose(m[:, 10], np.asarray(tiny_scene.active))
    # no derived columns: |C|^2 - r^2 is computed in-kernel so hit
    # decisions are independent of host-side FMA fusion (_hit_select)
    assert (m[:, 11:] == 0).all()


def test_pack_camera_roundtrip(default_camera):
    cam = initialize(default_camera, W, H)
    row = np.asarray(pack_camera(cam))
    assert row.shape == (1, 24)
    np.testing.assert_allclose(row[0, 9], float(cam.center.x))
    assert row[0, 18] == 1.0  # defocus enabled in reference config


def test_float64_raises(tiny_scene, default_camera):
    with pytest.raises(NotImplementedError):
        render_pallas(tiny_scene, default_camera, W, H, 1, 2,
                      dtype=jnp.float64)


@pytest.mark.slow
def test_diff_render_grads_match_oracle(default_camera):
    """Pallas-forward/oracle-backward custom VJP: gradients must equal the
    pure-oracle gradients (same streams, same math)."""
    import jax
    from raytracingincuda_tpu.models.scene import Scene
    from raytracingincuda_tpu.ops.pallas_kernel import make_diff_render

    scene = scene_from_spheres(
        [dict(center=(0, 0, 0), radius=2.0, mat=LAMBERTIAN,
              albedo=(0.6, 0.4, 0.2))],
        pad_to=128,
    )
    f = make_diff_render(
        scene.mat_type, scene.active, W, H, 1, 3, gamma=False,
        ray_tile=256, interpret=True, oracle_chunk_pixels=512,
    )

    def loss_pallas(p):
        return jnp.mean(f(p, default_camera))

    def loss_oracle(p):
        return jnp.mean(
            render(Scene(p, scene.mat_type, scene.active), default_camera,
                   W, H, 1, 3, gamma=False, chunk_pixels=512)
        )

    vp, gp = jax.value_and_grad(loss_pallas)(scene.params)
    vo, go = jax.value_and_grad(loss_oracle)(scene.params)
    np.testing.assert_allclose(float(vp), float(vo), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-8)


@pytest.mark.slow
def test_pallas_mesh_sharded_matches(tiny_scene, default_camera):
    """Kernel under shard_map on the 8-device CPU mesh: exact match."""
    from raytracingincuda_tpu.parallel import mesh as meshlib

    m = meshlib.make_mesh()
    a = np.asarray(
        render_pallas(tiny_scene, default_camera, 64, 32, 2, 6,
                      ray_tile=256, interpret=True, mode="regen")
    )
    b = np.asarray(
        render_pallas(tiny_scene, default_camera, 64, 32, 2, 6,
                      ray_tile=256, interpret=True, mode="regen", mesh=m)
    )
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_pixel_order_roundtrip(tiny_scene, default_camera):
    """Difficulty prepass + ordered render == identity-order render."""
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty,
    )

    a = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 6, 8,
                      ray_tile=256, interpret=True, mode="regen")
    )
    seg = measure_difficulty(tiny_scene, default_camera, W, H, 8, 4,
                             ray_tile=256, interpret=True)
    order = difficulty_order(seg, 8, 4)
    b = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 6, 8,
                      ray_tile=256, interpret=True, mode="regen",
                      pixel_order=order)
    )
    np.testing.assert_array_equal(a, b)
    # the order is a permutation
    assert sorted(np.asarray(order).tolist()) == list(range(len(order)))


@pytest.mark.slow
def test_scene_layouts_identical(tiny_scene, default_camera):
    """vmem / hbm (whole-scene DMA) / packed (streamed-SoA fetch path)
    scene layouts: same image. The global/const/tex variant axis of the
    reference (SURVEY.md §2.1)."""
    base = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 2, 6,
                      ray_tile=256, interpret=True, mode="regen")
    )
    img_hbm = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 2, 6,
                      ray_tile=256, interpret=True, mode="regen",
                      layout="hbm")
    )
    np.testing.assert_array_equal(base, img_hbm)
    # packed routes to the streamed-SoA kernel (render_api handles it)
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )

    stream = prepare_stream_scene(tiny_scene, block=32)
    img_packed = np.asarray(
        render_pallas_stream(stream, default_camera, W, H, 2, 6,
                             ray_tile=256, interpret=True)
    )
    np.testing.assert_allclose(base, img_packed, atol=5e-5)


def test_packed_layout_rejected_and_routed(tiny_scene, default_camera):
    """render_pallas rejects layout='packed' (it is served by the stream
    kernel); make_renderer routes it there (the renderer grows the stream
    path's .prepare hook)."""
    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.render_api import make_renderer

    with pytest.raises(ValueError, match="packed"):
        render_pallas(tiny_scene, default_camera, W, H, 1, 2,
                      layout="packed", interpret=True)
    r = make_renderer(RenderConfig(scene_id=2, width=16, height=8,
                                   samples=1, bounces=2, impl="pallas",
                                   layout="packed"))
    assert hasattr(r, "prepare")

@pytest.mark.slow
def test_multi_pixel_lanes_match(tiny_scene, default_camera):
    """pixels_per_lane is pure bookkeeping: images are bit-identical for
    any K (RNG streams key on pixel id, not lane assignment)."""
    base = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 3, 6,
                      ray_tile=128, interpret=True)
    )
    for k in (2, 4):
        img = np.asarray(
            render_pallas(tiny_scene, default_camera, W, H, 3, 6,
                          ray_tile=128, interpret=True, pixels_per_lane=k)
        )
        np.testing.assert_array_equal(img, base)


@pytest.mark.slow
def test_hollow_glass_negative_radius(default_camera):
    """The book's hollow-glass bubble: a NEGATIVE inner radius flips the
    normal inward via the signed division (hittable.h:61). Kernel and
    oracle agree, and the bubble visibly changes the image vs solid
    glass (the unsigned-clamp bug rendered it as garbage normals)."""
    from raytracingincuda_tpu.models.scene import DIELECTRIC, METAL

    def glass_scene(inner_radius):
        spheres = [
            dict(center=(0, -1000, 0), radius=1000.0, mat=LAMBERTIAN,
                 albedo=(0.5, 0.5, 0.5)),
            dict(center=(0, 1, 0), radius=1.0, mat=DIELECTRIC, ior=1.5),
            dict(center=(2.2, 1, 0), radius=1.0, mat=METAL,
                 albedo=(0.8, 0.6, 0.2), fuzz=0.0),
        ]
        if inner_radius is not None:
            spheres.append(dict(center=(0, 1, 0), radius=inner_radius,
                                mat=DIELECTRIC, ior=1.5))
        return scene_from_spheres(spheres, pad_to=8)

    hollow = glass_scene(-0.85)
    o, p = run_both(hollow, default_camera, samples=4, bounces=8)
    assert np.isfinite(o).all() and np.isfinite(p).all()
    np.testing.assert_allclose(o, p, atol=5e-5)

    solid = np.asarray(render(glass_scene(None), default_camera, W, H,
                              4, 8, chunk_pixels=512))
    assert np.abs(o - solid).max() > 0.01  # the bubble is visible


@pytest.mark.slow
def test_matches_oracle_fuzzed_configs(default_camera):
    """Randomized shape/knob fuzz: the kernel must match the oracle for
    odd image sizes, ragged tile tails, any K, and either estimator —
    not just the round-number configs the other tests pin."""
    rng = np.random.default_rng(20260819)
    scene = build_scene(2)
    for trial in range(4):
        w = int(rng.integers(9, 70))
        h = int(rng.integers(7, 40))
        spp = int(rng.integers(1, 4))
        depth = int(rng.integers(2, 8))
        kpl = int(rng.choice([1, 2, 4, 8]))
        rr = None if rng.random() < 0.5 else 2
        oracle = np.asarray(render(
            scene, default_camera, w, h, spp, depth, chunk_pixels=256,
            rr_start=rr,
        ))
        pallas = np.asarray(render_pallas(
            scene, default_camera, w, h, spp, depth, ray_tile=128,
            pixels_per_lane=kpl, rr_start=rr, interpret=True,
        ))
        np.testing.assert_allclose(
            oracle, pallas, atol=5e-5,
            err_msg=f"trial {trial}: {w}x{h}x{spp}spp d{depth} "
                    f"K{kpl} rr={rr}",
        )
