"""Fused MSE value-and-grad kernel (ops/pallas_backward.make_mse_train).

One Mosaic kernel computes the render, the MSE-vs-target loss, and the
scene/camera cotangents (three sweeps; see _fused_tile_kernel). Ground
truth is jax.value_and_grad through the jnp oracle — both consume the
same Threefry streams, so the image is bit-exact in interpret mode and
gradients agree to float-reassociation precision."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import (
    DIELECTRIC, LAMBERTIAN, METAL, Scene,
)
from raytracingincuda_tpu.ops import tracer
from raytracingincuda_tpu.ops.pallas_backward import make_mse_train
from helpers import scene_from_spheres

W, H = 24, 16
SPP, DEPTH = 2, 4


@pytest.fixture(scope="module")
def mixed_scene():
    return scene_from_spheres(
        [
            dict(center=(0, -1000, 0), radius=1000.0, mat=LAMBERTIAN,
                 albedo=(0.5, 0.5, 0.5)),
            dict(center=(0, 1, 0), radius=1.0, mat=DIELECTRIC, ior=1.5),
            dict(center=(-2, 1, 0), radius=1.0, mat=LAMBERTIAN,
                 albedo=(0.4, 0.2, 0.1)),
            dict(center=(2, 1, 0), radius=1.0, mat=METAL,
                 albedo=(0.7, 0.6, 0.5), fuzz=0.1),
        ],
        pad_to=8,
    )


@pytest.fixture(scope="module")
def target():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.uniform(0.0, 1.0, (H, W, 3)), jnp.float32)


def _fused(scene, cam, target, *, gamma=True, mesh=None, ray_tile=256):
    f = make_mse_train(
        scene.mat_type, scene.active, W, H, SPP, DEPTH,
        gamma=gamma, interpret=True, mesh=mesh, ray_tile=ray_tile,
    )
    return f(scene.params, cam, target)


def _oracle(scene, cam, target, *, gamma=True):
    def loss(p, c):
        img = tracer.render(
            Scene(p, scene.mat_type, scene.active), c, W, H, SPP, DEPTH,
            gamma=gamma,
        )
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss, argnums=(0, 1))(scene.params, cam)


def _assert_tree_close(a, b, rtol=5e-3, atol=5e-4):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for va, vb in zip(fa, fb):
        assert np.isfinite(np.asarray(va)).all()
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=rtol, atol=atol
        )


@pytest.mark.slow
def test_matches_oracle_value_and_grad(mixed_scene, default_camera, target):
    loss, img, grads = _fused(mixed_scene, default_camera, target)
    oloss, ograds = _oracle(mixed_scene, default_camera, target)
    np.testing.assert_allclose(float(loss), float(oloss), rtol=1e-6)
    # the fused forward sweep shares the oracle's math and streams exactly
    oimg = tracer.render(mixed_scene, default_camera, W, H, SPP, DEPTH,
                         gamma=True)
    assert float(jnp.abs(img - oimg).max()) == 0.0
    _assert_tree_close(grads, ograds)


@pytest.mark.slow
def test_linear_domain(mixed_scene, default_camera, target):
    """gamma=False: MSE in the linear radiance domain."""
    loss, img, grads = _fused(mixed_scene, default_camera, target,
                              gamma=False)
    oloss, ograds = _oracle(mixed_scene, default_camera, target,
                            gamma=False)
    np.testing.assert_allclose(float(loss), float(oloss), rtol=1e-6)
    _assert_tree_close(grads, ograds, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_ray_tile_invariance(mixed_scene, default_camera, target):
    """Padded lanes contribute exactly zero loss and gradient."""
    l1, _, g1 = _fused(mixed_scene, default_camera, target, ray_tile=128)
    l2, _, g2 = _fused(mixed_scene, default_camera, target, ray_tile=512)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    _assert_tree_close(g1, g2, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_sharded_matches_single(mixed_scene, default_camera, target):
    """Mesh path: pixel tiles sharded over 8 virtual devices; loss and
    cotangents psum'd inside shard_map."""
    from raytracingincuda_tpu.parallel import mesh as meshlib

    m = meshlib.make_mesh()
    lm, im_m, gm = _fused(mixed_scene, default_camera, target,
                          mesh=m, ray_tile=128)
    l1, im_1, g1 = _fused(mixed_scene, default_camera, target,
                          ray_tile=128)
    np.testing.assert_allclose(float(lm), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(im_m), np.asarray(im_1),
                               rtol=1e-6, atol=1e-7)
    _assert_tree_close(gm, g1, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_jittable_with_optimizer(mixed_scene, default_camera, target):
    """The whole train step — value, grads, AND an SGD update — in one
    jit (single Mosaic kernel; the property the two-program custom_vjp
    path cannot offer under the compile service's one-kernel limit)."""
    f = make_mse_train(
        mixed_scene.mat_type, mixed_scene.active, W, H, SPP, DEPTH,
        gamma=True, interpret=True,
    )

    @jax.jit
    def step(params, cam_cfg, tgt):
        loss, img, (dp, dc) = f(params, cam_cfg, tgt)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - 0.1 * g, params, dp
        )
        return loss, new_params

    l0, p1 = step(mixed_scene.params, default_camera, target)
    l1, _ = step(p1, default_camera, target)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    # one SGD step on a smooth MSE objective must reduce the loss
    assert float(l1) < float(l0)


@pytest.mark.slow
def test_fused_park_residuals_identical(tiny_scene, default_camera):
    """park_residuals (sweep 1 parks every sample's residuals; sweep 3
    reverse-only) computes bitwise the same loss/image/cotangents as the
    re-tracing fused kernel — parking only removes the second forward
    trace."""
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    W, H = 40, 24
    target = jax.random.uniform(jax.random.PRNGKey(3), (H, W, 3),
                                jnp.float32)
    # sweep='sample': parking removes the per-sample sweep's re-trace, so
    # bitwise identity holds against THAT sweep (the wave sweep accumulates
    # in wave order — reassociation; covered by
    # test_pallas_grad.test_fused_wave_sweep_matches_sample)
    kw = dict(ray_tile=128, interpret=True, gamma=False, sweep="sample")
    outs0 = mse_train_pallas(tiny_scene, default_camera, target, W, H,
                             2, 4, park_residuals=False, **kw)
    outs1 = mse_train_pallas(tiny_scene, default_camera, target, W, H,
                             2, 4, park_residuals=True, **kw)
    for a, b in zip(outs0, outs1):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_hbm_park_matches_wave(mixed_scene, default_camera):
    """Round-4 FULL-PARK mode: the render sweep parks every wave to an
    HBM buffer (ANY-space output + double-buffered DMA staging) and the
    grad sweep is reverse-only. Image and loss must be BIT-identical to
    the wave-sweep fused step (same render recurrence); gradients equal
    up to reassociation (the reverse visits the same waves in the same
    per-path order; only round boundaries differ)."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(5)
    target = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    # kpl=3: non-power-of-2 pixels-per-lane — the round-4 session-2
    # integer-fit auto picks K3 at the north-star shape (12.3 GB
    # buffer), so the odd-K path is production and stays pinned here
    for kpl in (1, 3, 4):
        base = mse_train_pallas(
            mixed_scene, default_camera, target, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True,
            park_residuals=False, sweep="wave", pixels_per_lane=kpl,
        )
        hbm = mse_train_pallas(
            mixed_scene, default_camera, target, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True,
            park_residuals="hbm", pixels_per_lane=kpl,
        )
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(hbm[1]))
        np.testing.assert_allclose(float(base[0]), float(hbm[0]),
                                   rtol=1e-7)
        for a, b in zip(base[2:], hbm[2:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=5e-7)

    # rr estimator through the hbm reverse (stream replay bitwise)
    base = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, park_residuals=False,
        sweep="wave", rr_start=2,
    )
    hbm = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, park_residuals="hbm", rr_start=2,
    )
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(hbm[1]))
    for a, b in zip(base[2:], hbm[2:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-7)


def test_fused_auto_selects_hbm_park(mixed_scene, default_camera):
    """The round-4 auto prefers the full-park mode whenever the
    true-bound buffer fits — the default train step must route there
    and produce finite grads + the bit-same image as explicit hbm."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(6)
    target = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    auto = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True,
    )
    explicit = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, park_residuals="hbm",
    )
    np.testing.assert_array_equal(np.asarray(auto[1]),
                                  np.asarray(explicit[1]))
    for a, b in zip(auto[2:], explicit[2:]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiled_fused_step_matches_single(mixed_scene, default_camera):
    """mse_train_pallas_tiled (static tile-range chunking — the
    >100 s-dispatch escape hatch for configs[4]-scale steps): chunk
    losses/cotangents are partial sums with global normalizations, so
    the assembly is exact — image BIT-identical, loss/grads equal up
    to cross-chunk summation order."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        mse_train_pallas, mse_train_pallas_tiled,
    )

    rng = np.random.default_rng(11)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    base = mse_train_pallas(
        mixed_scene, default_camera, tgt, W, H, SPP, DEPTH,
        ray_tile=64, pixels_per_lane=2, interpret=True,
        park_residuals="hbm",
    )
    got = mse_train_pallas_tiled(
        mixed_scene, default_camera, tgt, W, H, SPP, DEPTH,
        n_chunks=3, ray_tile=64, pixels_per_lane=2,
    )
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(got[1]))
    np.testing.assert_allclose(float(base[0]), float(got[0]), rtol=1e-6)
    for a, b in zip(base[2:], got[2:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_fused_hbm_park_shape_sweep(mixed_scene, default_camera):
    """Shape fuzz for the full-park mode: odd sizes (padding tiles),
    K x ray_tile combos, depth extremes — every case must reproduce
    the wave-sweep fused step's image bit-exactly with close grads."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(21)
    for (w, h, spp, depth, rt, k) in [
        (17, 11, 1, 1, 64, 1),       # tiny, heavy padding, depth 1
        (40, 24, 3, 7, 128, 2),      # odd spp/depth
        (33, 9, 2, 5, 64, 4),        # K > tiles-worth of pixels? no: 297px
        (24, 16, 5, 2, 256, 1),      # tile bigger than the image
    ]:
        tgt = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        base = mse_train_pallas(
            mixed_scene, default_camera, tgt, w, h, spp, depth,
            ray_tile=rt, pixels_per_lane=k, interpret=True,
            park_residuals=False, sweep="wave",
        )
        hbm = mse_train_pallas(
            mixed_scene, default_camera, tgt, w, h, spp, depth,
            ray_tile=rt, pixels_per_lane=k, interpret=True,
            park_residuals="hbm",
        )
        tag = f"{w}x{h}x{spp}/d{depth}/rt{rt}/K{k}"
        np.testing.assert_array_equal(
            np.asarray(base[1]), np.asarray(hbm[1]), err_msg=tag)
        np.testing.assert_allclose(float(base[0]), float(hbm[0]),
                                   rtol=1e-6, err_msg=tag)
        for a, b in zip(base[2:], hbm[2:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6,
                                       err_msg=tag)


def test_explicit_sweep_disables_hbm_auto(mixed_scene, default_camera):
    """An explicit sweep='sample' must actually run the per-sample
    re-trace, not be silently overridden by the full-park auto (which
    ignores sweep once parking is on) — ADVICE r4. Pinned by bitwise
    gradient equality with the explicitly forced non-park path (the
    full-park path is only reassociation-equal, so a silent override
    would break exact equality here)."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(31)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    for sweep in ("sample", "wave"):
        auto_park = mse_train_pallas(
            mixed_scene, default_camera, tgt, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, sweep=sweep,
        )
        forced = mse_train_pallas(
            mixed_scene, default_camera, tgt, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, sweep=sweep,
            park_residuals=False,
        )
        for a, b in zip(auto_park, forced):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"sweep={sweep}")


def test_explicit_hbm_park_oversize_raises(mixed_scene, default_camera):
    """Explicit park_residuals='hbm' with a buffer beyond the HBM
    budget must fail fast with ValueError, mirroring
    render_pallas_grads — not attempt a >12.5 GiB allocation at
    runtime (ADVICE r4)."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    tgt = jnp.zeros((H, W, 3), jnp.float32)
    with pytest.raises(ValueError, match="HBM"):
        # 16 * 4096 * 50 * 40-rows * 1024 * 4 B ≈ 537 GB
        mse_train_pallas(
            mixed_scene, default_camera, tgt, W, H, 4096, 50,
            ray_tile=1024, pixels_per_lane=16, interpret=True,
            park_residuals="hbm",
        )


@pytest.mark.parametrize("loss_kind", ["l1", "huber", "relmse"])
def test_loss_family_matches_oracle(mixed_scene, default_camera, target,
                                    loss_kind):
    """Round 5: the fused kernel's per-pixel loss family (l1 / huber /
    relmse) — values and gradients vs jax.value_and_grad through the
    jnp oracle with the same loss formula (identical Threefry streams,
    so images are bit-exact and grads reassociation-close)."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    def loss_formula(img):
        d = img - target
        if loss_kind == "l1":
            return jnp.mean(jnp.abs(d))
        if loss_kind == "huber":
            hd = 0.25
            a = jnp.abs(d)
            return jnp.mean(jnp.where(a <= hd, 0.5 * d * d,
                                      hd * (a - 0.5 * hd)))
        return jnp.mean(d * d / (target * target + 1e-2))

    got = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, loss=loss_kind, huber_delta=0.25,
    )

    def oracle_loss(p, c):
        img = tracer.render(
            Scene(p, mixed_scene.mat_type, mixed_scene.active), c,
            W, H, SPP, DEPTH, gamma=True,
        )
        return loss_formula(img)

    oloss, ograds = jax.value_and_grad(oracle_loss, argnums=(0, 1))(
        mixed_scene.params, default_camera)
    np.testing.assert_allclose(float(got[0]), float(oloss), rtol=1e-5)
    from raytracingincuda_tpu.ops.pallas_backward import chain_to_params
    d_params, d_cam = chain_to_params(
        got[2], got[3], mixed_scene.params, default_camera,
        mixed_scene.mat_type, mixed_scene.active, W, H,
    )
    _assert_tree_close((d_params, d_cam), ograds, rtol=7e-3, atol=7e-4)


def test_explicit_window_disables_park_autos(mixed_scene, default_camera):
    """An explicit window must run the WINDOWED sweep, not be silently
    overridden by a park auto (park ignores window) — round-5 review,
    same class as the explicit-sweep rule. Pinned bitwise against the
    forced non-park path."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(41)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    auto = mse_train_pallas(
        mixed_scene, default_camera, tgt, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, window=6,
    )
    forced = mse_train_pallas(
        mixed_scene, default_camera, tgt, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, window=6,
        park_residuals=False, sweep="wave",
    )
    for a, b in zip(auto, forced):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
