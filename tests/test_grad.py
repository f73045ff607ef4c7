"""Differentiability tests: finite-difference checks with the detached
sampler (fixed RNG streams make FD well-defined away from discrete flips)."""
import numpy as np
import jax
import jax.numpy as jnp

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import LAMBERTIAN, Scene, build_scene
from raytracingincuda_tpu.ops import grad as gradlib
from raytracingincuda_tpu.ops.tracer import render
from helpers import scene_from_spheres

W, H = 24, 16


def _camera():
    return CameraConfig.reference_default()._replace(
        defocus_angle=jnp.asarray(0.0, jnp.float32)
    )


def _simple_scene():
    return scene_from_spheres(
        [dict(center=(0, 0, 0), radius=2.0, mat=LAMBERTIAN,
              albedo=(0.6, 0.4, 0.2))]
    )


def _loss(scene, cam):
    # smooth scalar objective: mean radiance (linear space)
    img = render(scene, cam, W, H, 2, 4, gamma=False)
    return jnp.mean(img)


def test_albedo_gradient_matches_finite_difference():
    scene = _simple_scene()
    cam = _camera()

    def f(albedo_x):
        p = scene.params._replace(
            albedo=scene.params.albedo._replace(x=albedo_x)
        )
        return _loss(Scene(p, scene.mat_type, scene.active), cam)

    g = jax.grad(f)(scene.params.albedo.x)
    eps = 1e-2
    e0 = np.zeros(scene.num_slots, np.float32)
    e0[0] = eps
    fd = (f(scene.params.albedo.x + e0) - f(scene.params.albedo.x - e0)) / (
        2 * eps
    )
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=5e-2, atol=1e-5)
    # inactive padding slots get zero gradient
    np.testing.assert_allclose(np.asarray(g[1:]), 0.0, atol=1e-8)


def test_radius_gradient_matches_finite_difference():
    """Geometry gradient: d(mean radiance)/d(radius). FD picks up silhouette
    pixels too, so compare loosely but require the sign and magnitude."""
    scene = _simple_scene()
    cam = _camera()

    def f(radius):
        p = scene.params._replace(radius=radius)
        return _loss(Scene(p, scene.mat_type, scene.active), cam)

    g = jax.grad(f)(scene.params.radius)
    assert np.isfinite(np.asarray(g)).all()
    # a bigger dark sphere covers more sky => mean radiance falls
    assert float(g[0]) < 0.0


def test_center_gradient_finite_and_nonzero():
    scene = _simple_scene()
    cam = _camera()

    def f(cz):
        c = scene.params.center._replace(z=cz)
        p = scene.params._replace(center=c)
        return _loss(Scene(p, scene.mat_type, scene.active), cam)

    g = jax.grad(f)(scene.params.center.z)
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(g[0])) > 0.0


def test_camera_gradients_finite():
    scene = _simple_scene()
    cam = _camera()

    def f(c):
        return _loss(scene, c)

    g = jax.grad(f)(cam)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # vfov changes the image: gradient must be nonzero
    assert abs(float(g.vfov)) > 0.0


def test_full_scene_grads_finite():
    """No NaN/Inf anywhere in scene-1 gradients (dead-lane hygiene)."""
    scene = build_scene(2, pad_to_multiple=64)
    cam = CameraConfig.reference_default()
    loss, (gp, gc) = gradlib.render_grads(
        scene, cam, jnp.zeros((H, W, 3)), W, H, 1, 4
    )
    assert np.isfinite(float(loss))
    for l in jax.tree_util.tree_leaves((gp, gc)):
        assert np.isfinite(np.asarray(l)).all()


def test_remat_matches_no_remat():
    scene = _simple_scene()
    cam = _camera()

    def f(remat):
        def inner(ax):
            p = scene.params._replace(
                albedo=scene.params.albedo._replace(x=ax)
            )
            img = render(Scene(p, scene.mat_type, scene.active), cam,
                         W, H, 2, 4, gamma=False, remat=remat)
            return jnp.mean(img)
        return jax.grad(inner)(scene.params.albedo.x)

    np.testing.assert_allclose(
        np.asarray(f(False)), np.asarray(f(True)), rtol=1e-6
    )


def test_train_step_reduces_loss():
    """Inverse rendering smoke: recover albedo toward a target image."""
    true_scene = _simple_scene()
    cam = _camera()
    target = render(true_scene, cam, W, H, 2, 4, gamma=False)

    # start from a wrong albedo
    wrong = true_scene.params._replace(
        albedo=true_scene.params.albedo._replace(
            x=true_scene.params.albedo.x * 0.2
        )
    )
    from raytracingincuda_tpu.models.scene import SceneParams
    from raytracingincuda_tpu.ops.vec import Vec3

    trainable = SceneParams(
        center=Vec3(False, False, False), radius=False,
        albedo=Vec3(True, True, True), fuzz=False, ior=False,
    )
    init_fn, step_fn = gradlib.make_train_step(
        W, H, 2, 4, learning_rate=5e-2, trainable=trainable
    )
    step_fn = jax.jit(step_fn)
    state = init_fn(wrong)
    losses = []
    for _ in range(15):
        state, loss = step_fn(
            state, cam, true_scene.mat_type, true_scene.active, target
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0]
    # the recovered albedo moved toward the target value (0.6 from 0.12)
    drift = float(jnp.abs(state.params.albedo.x[0] - 0.6))
    assert drift < abs(0.2 * 0.6 - 0.6)
    # frozen geometry unchanged
    np.testing.assert_array_equal(
        np.asarray(state.params.radius), np.asarray(wrong.radius)
    )


def test_loss_fn_family(default_camera):
    """make_loss_fn's loss family (shared formulas with the fused
    kernels, ops/grad.image_loss) — values match the inline formulas
    and gradients are finite for every member."""
    from raytracingincuda_tpu.ops import tracer

    small_scene = build_scene(2, pad_to_multiple=8)
    W, H, SPP, D = 16, 12, 1, 2
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    img = tracer.render(small_scene, default_camera, W, H, SPP, D,
                        gamma=False)
    d = img - target
    expected = {
        "mse": float(jnp.mean(d * d)),
        "l1": float(jnp.mean(jnp.abs(d))),
        "huber": float(jnp.mean(jnp.where(
            jnp.abs(d) <= 0.3, 0.5 * d * d,
            0.3 * (jnp.abs(d) - 0.15)))),
        "relmse": float(jnp.mean(d * d / (target * target + 1e-2))),
    }
    for kind, want in expected.items():
        loss_fn = gradlib.make_loss_fn(
            W, H, SPP, D, loss=kind, huber_delta=0.3)
        got, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            small_scene.params, default_camera, small_scene.mat_type,
            small_scene.active, target)
        np.testing.assert_allclose(float(got), want, rtol=1e-6,
                                   err_msg=kind)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all(), kind
