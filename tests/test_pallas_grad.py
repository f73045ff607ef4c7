"""Pallas backward kernel vs jax.grad through the jnp oracle.

The backward kernel (ops/pallas_backward.py) re-traces the bounce chain in
VMEM and transposes it with in-kernel jax.vjp; the oracle's autodiff is the
ground truth (itself FD-checked in test_grad.py). Both consume identical
Threefry streams, so gradients agree to float-reassociation precision."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import (
    DIELECTRIC, LAMBERTIAN, METAL, Scene,
)
from raytracingincuda_tpu.ops import tracer
from raytracingincuda_tpu.ops.pallas_kernel import make_diff_render
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


def _weight_image():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)


def _grads(scene, cam, *, gamma=False, backward="pallas", mesh=None,
           ray_tile=256):
    w = _weight_image()
    f = make_diff_render(
        scene.mat_type, scene.active, W, H, SPP, DEPTH,
        gamma=gamma, interpret=True, backward=backward, mesh=mesh,
        ray_tile=ray_tile, bwd_ray_tile=ray_tile,
    )

    def loss(p, c):
        return jnp.sum(w * f(p, c))

    return jax.grad(loss, argnums=(0, 1))(scene.params, cam)


def _oracle_grads(scene, cam, *, gamma=False):
    w = _weight_image()

    def loss(p, c):
        img = tracer.render(
            Scene(p, scene.mat_type, scene.active), c, W, H, SPP, DEPTH,
            gamma=gamma,
        )
        return jnp.sum(w * img)

    return jax.grad(loss, argnums=(0, 1))(scene.params, cam)


def _assert_tree_close(a, b, rtol=1e-3, atol=1e-5):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for va, vb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=rtol, atol=atol
        )


@pytest.mark.slow
def test_matches_oracle_linear(mixed_scene, default_camera):
    gp = _grads(mixed_scene, default_camera)
    go = _oracle_grads(mixed_scene, default_camera)
    for leaf in jax.tree_util.tree_leaves(gp):
        assert np.isfinite(np.asarray(leaf)).all()
    _assert_tree_close(gp, go)


@pytest.mark.slow
def test_matches_oracle_gamma(mixed_scene, default_camera):
    """Gamma chain: bwd divides by the saved primal image (0 at black)."""
    gp = _grads(mixed_scene, default_camera, gamma=True)
    go = _oracle_grads(mixed_scene, default_camera, gamma=True)
    for leaf in jax.tree_util.tree_leaves(gp):
        assert np.isfinite(np.asarray(leaf)).all()
    # oracle's sqrt-grad can blow up near zero; compare with a floor
    _assert_tree_close(gp, go, rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_ray_tile_invariance(mixed_scene, default_camera):
    """Padded pixels (384 px, tile 512 => 128 dead lanes) contribute
    exactly zero; tile size must not change gradients."""
    g256 = _grads(mixed_scene, default_camera, ray_tile=128)
    g512 = _grads(mixed_scene, default_camera, ray_tile=512)
    # atol floor: tile count changes the cross-tile accumulation order;
    # near-zero leaves (e.g. d vup.y ~ 3e-7) see one reassociation ulp
    _assert_tree_close(g256, g512, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_pixel_order_invariance(mixed_scene, default_camera):
    """A pixel permutation regroups lanes into tiles (for early-exit
    locality) but must not change gradients beyond tile-sum
    reassociation; per-pixel RNG streams make the per-lane math
    order-independent."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )

    g = _weight_image()
    rng = np.random.default_rng(7)
    perm = jnp.asarray(rng.permutation(W * H), jnp.uint32)
    base = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True,
    )
    permuted = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, SPP, DEPTH,
        ray_tile=128, pixel_order=perm, interpret=True,
    )
    _assert_tree_close(base, permuted, rtol=1e-4, atol=5e-7)


def test_scatter_split_exact():
    """The one-side bf16 hi/lo/lo2 split behind _scatter_matmul must
    reconstruct f32 cotangents to ~1 ulp over the full NORMAL f32 range
    and stay finite at the f32 extremes (the unclamped split rounds
    |v| > bf16_max to inf and poisons rem with NaN). On CPU the matmul
    itself is f32 either way — this pins the split, which is what
    protects real-TPU precision."""
    from raytracingincuda_tpu.ops.pallas_backward import _scatter_matmul

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.standard_normal(256) * 10.0 ** rng.integers(-30, 31, 256),
        np.zeros(8),
        [1.2e-38, -1.2e-38, 3.4e38, -3.4e38, 1e38, -1e38],
    ]).astype(np.float32)
    n = vals.shape[0]
    # identity one-hot: scatter returns the (clamp-protected) recon
    one_hot = jnp.eye(n, dtype=jnp.float32)
    recon = np.asarray(
        _scatter_matmul(one_hot, jnp.asarray(vals)[None, :])
    )[:, 0]
    assert np.isfinite(recon).all()
    # near-min-normal values lose their (subnormal) residual to FTZ —
    # absolute error <= ~1.2e-38; the relative bound applies above that
    denom = np.maximum(np.abs(vals), np.float32(1e-33))
    assert np.max(np.abs(recon - vals) / denom) < 2e-7


@pytest.mark.slow
def test_wave_sweep_matches_sample_sweep(mixed_scene, default_camera):
    """The regenerating wave-reversed sweep (default) must agree with the
    per-sample sweep to reassociation precision — identical per-path
    replay math and RNG streams, different accumulation order. Exercises
    the window-drain boundary with a tiny window (paths span rounds)."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )

    g = _weight_image()
    base = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, sweep="sample",
    )
    for window in (0, 3):
        wave = render_pallas_grads(
            mixed_scene, default_camera, g, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, sweep="wave", window=window,
        )
        for leaf in jax.tree_util.tree_leaves(wave):
            assert np.isfinite(np.asarray(leaf)).all()
        _assert_tree_close(base, wave, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_multi_pixel_lane_grads_match(mixed_scene, default_camera):
    """Multi-pixel lanes on the wave backward (round 3): K pixels per
    lane, worked sequentially, must reproduce K=1 gradients to
    reassociation (streams key on pixel id; assignment is bookkeeping).
    window=3 forces pixel pulls to span drain rounds; rr checks the
    replayed RR streams ride the parked pixel ids."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )

    g = _weight_image()
    base = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True,
    )
    for k, window in ((2, 0), (4, 3)):
        got = render_pallas_grads(
            mixed_scene, default_camera, g, W, H, SPP, DEPTH,
            ray_tile=64, interpret=True, pixels_per_lane=k,
            window=window,
        )
        for leaf in jax.tree_util.tree_leaves(got):
            assert np.isfinite(np.asarray(leaf)).all()
        _assert_tree_close(base, got, rtol=1e-4, atol=5e-7)

    base_rr = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, rr_start=1,
    )
    got_rr = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, SPP, DEPTH,
        ray_tile=64, interpret=True, pixels_per_lane=2, rr_start=1,
    )
    _assert_tree_close(base_rr, got_rr, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_rr_grads_match_oracle(mixed_scene, default_camera):
    """Russian-roulette estimator gradients (round 3): the backward
    replays the forward's DRAW_RR streams bitwise, so grads through the
    kernel must match jax.grad through the oracle with the same
    rr_start — and the wave sweep must match the per-sample sweep."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )

    w = _weight_image()
    f = make_diff_render(
        mixed_scene.mat_type, mixed_scene.active, W, H, SPP, DEPTH,
        gamma=False, interpret=True, backward="pallas",
        ray_tile=128, bwd_ray_tile=128, rr_start=1,
    )

    def loss(p, c):
        return jnp.sum(w * f(p, c))

    gp = jax.grad(loss, argnums=(0, 1))(
        mixed_scene.params, default_camera
    )

    def oloss(p, c):
        img = tracer.render(
            Scene(p, mixed_scene.mat_type, mixed_scene.active), c, W, H,
            SPP, DEPTH, gamma=False, rr_start=1,
        )
        return jnp.sum(w * img)

    go = jax.grad(oloss, argnums=(0, 1))(
        mixed_scene.params, default_camera
    )
    for leaf in jax.tree_util.tree_leaves(gp):
        assert np.isfinite(np.asarray(leaf)).all()
    _assert_tree_close(gp, go)

    # wave sweep == per-sample sweep under rr (reassociation only);
    # window=3 forces rr-shortened paths to span drain rounds
    base = render_pallas_grads(
        mixed_scene, default_camera, w, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, sweep="sample", rr_start=1,
    )
    wave = render_pallas_grads(
        mixed_scene, default_camera, w, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, sweep="wave", window=3, rr_start=1,
    )
    _assert_tree_close(base, wave, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_sample_chunked_grads(mixed_scene, default_camera):
    """Cotangents are sums over samples, so two sweeps over disjoint
    sample-id windows add up to the full-range sweep (counter RNG keys
    on global ids) — the >100s-dispatch chunking contract
    (UPSTREAM_ISSUES #10). Equal up to chunk-sum reassociation."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )

    g = _weight_image()
    full = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, 4, DEPTH, interpret=True,
    )
    lo = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, 2, DEPTH,
        sample_offset=0, interpret=True,
    )
    hi = render_pallas_grads(
        mixed_scene, default_camera, g, W, H, 2, DEPTH,
        sample_offset=2, interpret=True,
    )
    summed = jax.tree_util.tree_map(lambda a, b: a + b, lo, hi)
    _assert_tree_close(full, summed, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_fused_pixel_order_image_exact(mixed_scene, default_camera):
    """The fused step's IMAGE is bit-identical under any pixel order
    (per-pixel RNG streams; lanes only carry pixel ids); loss/grads agree
    to reassociation."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    perm = jnp.asarray(rng.permutation(W * H), jnp.uint32)
    l0, img0, d_sm0, d_cr0 = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True,
    )
    l1, img1, d_sm1, d_cr1 = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, pixel_order=perm, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    _assert_tree_close((d_sm0, d_cr0), (d_sm1, d_cr1),
                       rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_fused_wave_sweep_matches_sample(mixed_scene, default_camera):
    """The fused train kernel's wave-reversed grad sweep must agree with
    its per-sample sweep: sweep 1 (the render) is shared code, so loss
    and image are bit-identical; cotangents agree to reassociation.
    window=3 forces paths to span drain rounds."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(5)
    target = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    base = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, park_residuals=False,
        sweep="sample",
    )
    for window in (0, 3):
        wave = mse_train_pallas(
            mixed_scene, default_camera, target, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, park_residuals=False,
            sweep="wave", window=window,
        )
        for leaf in jax.tree_util.tree_leaves(wave):
            assert np.isfinite(np.asarray(leaf)).all()
        np.testing.assert_array_equal(
            np.asarray(base[1]), np.asarray(wave[1])
        )
        np.testing.assert_allclose(float(base[0]), float(wave[0]),
                                   rtol=1e-6)
        _assert_tree_close(base[2:], wave[2:], rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_fused_multi_pixel_lane(mixed_scene, default_camera):
    """Fused train step with multi-pixel lanes: the K-pixel regen
    render flushes complete-pixel sums (bit-identical image to K=1),
    and the grad sweep rides the shared K machinery (reassociation)."""
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas

    rng = np.random.default_rng(9)
    target = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    base = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, park_residuals=False,
        sweep="wave", pixels_per_lane=1,
    )
    got = mse_train_pallas(
        mixed_scene, default_camera, target, W, H, SPP, DEPTH,
        ray_tile=64, interpret=True, park_residuals=False,
        sweep="wave", pixels_per_lane=4,
    )
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(got[1]))
    np.testing.assert_allclose(float(base[0]), float(got[0]), rtol=1e-6)
    _assert_tree_close(base[2:], got[2:], rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_sharded_grads_match(mixed_scene, default_camera):
    """Mesh path: pixel tiles sharded over 8 virtual devices; scene/camera
    cotangents all-reduced with psum inside shard_map."""
    from raytracingincuda_tpu.parallel import mesh as meshlib

    m = meshlib.make_mesh()
    gm = _grads(mixed_scene, default_camera, mesh=m, ray_tile=128)
    g1 = _grads(mixed_scene, default_camera, ray_tile=128)
    _assert_tree_close(gm, g1, rtol=1e-4, atol=1e-6)


def test_rr_start_must_be_integer(mixed_scene, default_camera):
    """ADVICE r3: the backward replays the RR zone test in the integer
    domain while the forward compares in float — a fractional rr_start
    would desync them by one bounce. Every entry point rejects it."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        mse_train_pallas, render_pallas_grads,
    )
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas

    g = jnp.zeros((H, W, 3), jnp.float32)
    with pytest.raises(ValueError, match="rr_start"):
        render_pallas_grads(
            mixed_scene, default_camera, g, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, rr_start=2.5,
        )
    with pytest.raises(ValueError, match="rr_start"):
        mse_train_pallas(
            mixed_scene, default_camera, g, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, rr_start=1.5,
        )
    with pytest.raises(ValueError, match="rr_start"):
        render_pallas(
            mixed_scene, default_camera, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, rr_start=0.5,
        )
    with pytest.raises(ValueError, match="rr_start"):
        tracer.render(
            mixed_scene, default_camera, W, H, SPP, DEPTH, rr_start=-1,
        )
    # integral floats are fine (== their int)
    render_pallas_grads(
        mixed_scene, default_camera, g, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, rr_start=2.0,
    )


def test_wave_sweep_rejects_huge_images(mixed_scene, default_camera):
    """ADVICE r3 (medium): the wave sweep carries pixel ids as f32 for
    ANY pixels_per_lane — >= 2^24 padded pixels must be rejected even at
    an explicit K=1 (ids would round silently, desyncing RNG streams)."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )

    w, h = 4096, 4096                       # 16.7M pixels >= 2^24
    g = np.zeros((h, w, 3), np.float32)     # never touched: raises first
    with pytest.raises(ValueError, match="16M"):
        render_pallas_grads(
            mixed_scene, default_camera, g, w, h, SPP, DEPTH,
            ray_tile=512, interpret=True, sweep="wave",
            pixels_per_lane=1,
        )


def test_train_step_kwargs_non_fused(mixed_scene, default_camera):
    """ADVICE r3: make_train_step's rr/sweep kwargs must reach the
    non-fused impls instead of TypeError-ing — impl='pallas' trains the
    RR estimator through the custom_vjp path."""
    from raytracingincuda_tpu.ops.grad import make_train_step

    target = jnp.zeros((H, W, 3), jnp.float32)
    init_fn, step_fn = make_train_step(
        W, H, SPP, DEPTH, impl="pallas", interpret=True, rr_start=2,
        ray_tile=128, bwd_ray_tile=128, sweep="wave",
        pixels_per_lane=2, learning_rate=1e-3,
    )
    state = init_fn(mixed_scene.params)
    state, loss = step_fn(state, default_camera, mixed_scene.mat_type,
                          mixed_scene.active, target)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # oracle rejects pallas-only tuning knobs with a clear error...
    with pytest.raises(ValueError, match="impl='pallas'"):
        make_train_step(W, H, SPP, DEPTH, impl="oracle", sweep="wave")
    with pytest.raises(ValueError, match="fused"):
        make_train_step(W, H, SPP, DEPTH, impl="pallas",
                        park_residuals=True)
    # ...but accepts rr_start (the oracle supports the RR estimator)
    init_fn, step_fn = make_train_step(
        W, H, SPP, DEPTH, impl="oracle", rr_start=2, learning_rate=1e-3,
    )
    state = init_fn(mixed_scene.params)
    _, loss = step_fn(state, default_camera, mixed_scene.mat_type,
                      mixed_scene.active, target)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_standalone_grads_hbm_park_matches_wave(mixed_scene,
                                                default_camera):
    """render_pallas_grads park='hbm' (round 4.2: the standalone
    program's FULL-PARK mode, now the auto) must reproduce the windowed
    wave sweep's gradients — identical wave visit order, so here the
    agreement is exact, not just reassociation-close. K=3 covers the
    integer-fit non-power-of-2 lane path."""
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )

    g = _weight_image()
    for kpl in (1, 3):
        wave = render_pallas_grads(
            mixed_scene, default_camera, g, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, park=False, rr_start=2,
            pixels_per_lane=kpl,
        )
        hbm = render_pallas_grads(
            mixed_scene, default_camera, g, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, park="hbm", rr_start=2,
            pixels_per_lane=kpl,
        )
        for leaf in jax.tree_util.tree_leaves(hbm):
            assert np.isfinite(np.asarray(leaf)).all()
        _assert_tree_close(wave, hbm, rtol=1e-5, atol=1e-8)

    # explicit offset chunking keeps the windowed sweep (the park
    # recurrence regenerates from sample 0)
    with pytest.raises(ValueError):
        render_pallas_grads(
            mixed_scene, default_camera, g, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, park="hbm", sample_offset=1,
        )
