"""Tracer semantics tests: analytic scenes, invariances, reference parity
properties (the reference itself has no tests — SURVEY.md §4 defines this
strategy: jnp oracle as the verification backbone)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig, initialize
from raytracingincuda_tpu.models.scene import (
    DIELECTRIC, LAMBERTIAN, METAL, build_scene,
)
from raytracingincuda_tpu.ops import rng as rtrng
from raytracingincuda_tpu.ops import vec
from raytracingincuda_tpu.ops.tracer import make_primary_rays, render
from helpers import empty_scene, scene_from_spheres

W, H = 40, 24


def no_blur_camera(**kw):
    base = CameraConfig.reference_default()
    return base._replace(defocus_angle=jnp.asarray(0.0, jnp.float32), **kw)


def test_empty_scene_is_exact_sky_gradient():
    """Miss on bounce 0 must produce exactly the background blend
    (camera.h:120-124) for the sampled primary direction."""
    scene = empty_scene()
    cfg = no_blur_camera()
    img = np.asarray(render(scene, cfg, W, H, 1, 4, gamma=False))

    cam = initialize(cfg, W, H)
    ids = jnp.arange(W * H, dtype=jnp.uint32)
    key = rtrng.key_from_seed(rtrng.DEFAULT_SEED)
    o, d = make_primary_rays(cam, ids, W, jnp.uint32(0), key)
    ud = vec.unit(d)
    a = 0.5 * (np.asarray(ud.y) + 1.0)
    expected = np.stack(
        [(1 - a) * 1.0 + a * 0.5, (1 - a) * 1.0 + a * 0.7, (1 - a) + a],
        axis=-1,
    ).reshape(H, W, 3)
    np.testing.assert_allclose(img, expected, atol=1e-6)


def test_sky_brighter_at_bottom():
    # pixel00 is the image top; the gradient blends toward white downward
    scene = empty_scene()
    img = np.asarray(render(scene, no_blur_camera(), W, H, 2, 4))
    assert img[-1].mean() > img[0].mean()


def test_max_depth_returns_black():
    """bounces=1: a hit lane survives the single bounce and must contribute
    black (camera.h:126-127), while miss lanes get sky."""
    scene = scene_from_spheres(
        [dict(center=(0, 0, 0), radius=2.0, mat=LAMBERTIAN, albedo=(1, 1, 1))]
    )
    img = np.asarray(render(scene, no_blur_camera(), W, H, 1, 1, gamma=False))
    cy, cx = H // 2, W // 2
    np.testing.assert_allclose(img[cy, cx], 0.0, atol=1e-7)
    assert img[0, 0].sum() > 0.5  # corner sees sky


def test_lambertian_sphere_darker_than_sky():
    scene = scene_from_spheres(
        [dict(center=(0, 0, 0), radius=2.0, mat=LAMBERTIAN,
              albedo=(0.1, 0.1, 0.1))]
    )
    img = np.asarray(render(scene, no_blur_camera(), W, H, 4, 8))
    cy, cx = H // 2, W // 2
    assert img[cy, cx].mean() < 0.5 * img[0, 0].mean()
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1.0).all()


def test_ior_one_dielectric_is_nearly_invisible():
    """eta=1 glass refracts straight through: away from grazing incidence
    the image matches the empty scene (end-to-end check of the far-root
    interval logic and refraction math). NOT exactly invisible: Schlick's
    approximation (material.h:62-66) keeps (1-cos)^5 reflectance even at
    eta=1 — same behavior as the reference — so the silhouette band may
    stochastically reflect; assert the mismatch stays a small fringe."""
    ghost = scene_from_spheres(
        [dict(center=(0, 0, 0), radius=2.0, mat=DIELECTRIC, ior=1.0)]
    )
    img_g = np.asarray(render(ghost, no_blur_camera(), W, H, 2, 8))
    img_e = np.asarray(render(empty_scene(), no_blur_camera(), W, H, 2, 8))
    diff = np.abs(img_g - img_e)
    assert (diff < 2e-5).mean() > 0.95   # bulk of the image identical
    assert diff.max() < 0.3              # fringe pixels still close
    assert diff.mean() < 0.005


def test_closest_hit_wins():
    """Two nested spheres: the nearer surface must own the hit."""
    near_black = scene_from_spheres(
        [
            dict(center=(0, 0, 0), radius=2.0, mat=LAMBERTIAN, albedo=(0, 0, 0)),
            dict(center=(0, 0, 0), radius=1.0, mat=LAMBERTIAN, albedo=(1, 0, 0)),
        ]
    )
    img = np.asarray(render(near_black, no_blur_camera(), W, H, 2, 4, gamma=False))
    cy, cx = H // 2, W // 2
    # outer black sphere absorbs everything: center pixel black
    np.testing.assert_allclose(img[cy, cx], 0.0, atol=1e-6)


def test_metal_mirror_reflects_sky_tint():
    """A huge fuzz-0 metal sphere behind the camera's view reflects sky;
    resulting color must be albedo-tinted (metal_scatter material.h:51-59)."""
    scene = scene_from_spheres(
        [dict(center=(0, 0, 0), radius=2.0, mat=METAL, albedo=(1.0, 0.2, 0.2),
              fuzz=0.0)]
    )
    img = np.asarray(render(scene, no_blur_camera(), W, H, 8, 8, gamma=False))
    cy, cx = H // 2, W // 2
    px = img[cy, cx]
    # red channel dominates after tinting sky (which is blue-ish)
    assert px[0] > 2.5 * px[1]


def test_chunk_and_sharding_invariance(tiny_scene, default_camera):
    a = np.asarray(render(tiny_scene, default_camera, W, H, 2, 6,
                          chunk_pixels=256))
    b = np.asarray(render(tiny_scene, default_camera, W, H, 2, 6,
                          chunk_pixels=1024))
    np.testing.assert_array_equal(a, b)


def test_render_jits_and_is_deterministic(tiny_scene, default_camera):
    f = jax.jit(
        lambda s, c: render(s, c, W, H, 2, 6, chunk_pixels=512)
    )
    a = np.asarray(f(tiny_scene, default_camera))
    b = np.asarray(f(tiny_scene, default_camera))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_seed_changes_noise(tiny_scene, default_camera):
    a = np.asarray(render(tiny_scene, default_camera, W, H, 1, 6, seed=1))
    b = np.asarray(render(tiny_scene, default_camera, W, H, 1, 6, seed=2))
    assert not np.array_equal(a, b)
    # but the underlying scene is the same: means stay close
    assert abs(a.mean() - b.mean()) < 0.05


def test_legacy_sky_quirk_flag(tiny_scene, default_camera):
    """legacy_sky reproduces camera.h:121 (sky from the primary ray)."""
    a = np.asarray(render(tiny_scene, default_camera, W, H, 1, 6))
    b = np.asarray(
        render(tiny_scene, default_camera, W, H, 1, 6, legacy_sky=True)
    )
    assert not np.array_equal(a, b)   # secondary-bounce sky differs
    # rays that never bounce are identical under both semantics
    e1 = np.asarray(render(empty_scene(), default_camera, W, H, 1, 6))
    e2 = np.asarray(
        render(empty_scene(), default_camera, W, H, 1, 6, legacy_sky=True)
    )
    np.testing.assert_array_equal(e1, e2)


def test_gamma_is_sqrt(tiny_scene, default_camera):
    lin = np.asarray(render(tiny_scene, default_camera, W, H, 1, 4,
                            gamma=False))
    gam = np.asarray(render(tiny_scene, default_camera, W, H, 1, 4))
    np.testing.assert_allclose(gam, np.sqrt(lin), atol=1e-6)


def test_defocus_blur_blurs():
    """With defocus on, an in-focus plane stays sharp but off-focus edges
    blur: variance across repeated-sample renders of an off-focus silhouette
    must exceed the pinhole one at the silhouette."""
    sph = [dict(center=(12.0, 2.0, 2.7), radius=0.05, mat=LAMBERTIAN,
                albedo=(0, 0, 0))]  # ~1 unit from camera, far off focus plane
    scene = scene_from_spheres(sph)
    blur_cfg = CameraConfig.reference_default()._replace(
        defocus_angle=jnp.asarray(10.0, jnp.float32)
    )
    img_pin = np.asarray(render(scene, no_blur_camera(), W, H, 16, 2))
    img_blr = np.asarray(render(scene, blur_cfg, W, H, 16, 2))
    # pinhole: crisp dark dot => some pixel much darker than blurred version
    assert img_pin.min() < img_blr.min() - 0.05


@pytest.mark.parametrize("scene_id", [1, 2, 3])
def test_full_scenes_render_finite(scene_id, default_camera):
    scene = build_scene(scene_id)
    img = np.asarray(render(scene, default_camera, 32, 20, 1, 4))
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1.0 + 1e-6).all()


def test_russian_roulette_unbiased(tiny_scene, default_camera):
    """RR is an unbiased estimator: high-sample mean matches plain."""
    plain = np.asarray(
        render(tiny_scene, default_camera, W, H, 16, 10, gamma=False)
    )
    rr = np.asarray(
        render(tiny_scene, default_camera, W, H, 16, 10, gamma=False,
               rr_start=2)
    )
    # same expectation; small-sample noise only
    assert abs(plain.mean() - rr.mean()) < 0.01
    assert np.isfinite(rr).all()
    # not identical (the estimator actually changed)
    assert not np.array_equal(plain, rr)
