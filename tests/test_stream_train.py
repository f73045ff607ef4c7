"""Streaming-scene inverse rendering (ops/grad.make_stream_train) and
the device-side stream-array rebuild (build_stream_arrays).

The train step freezes the Morton permutation and rebuilds the packed
matrix + block bounds on device each step; the rebuild must reproduce
prepare_stream_scene's host output exactly (same packing) and the
two-program step must reduce MSE on a small perturbation-recovery
problem."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import (
    LAMBERTIAN, METAL, Scene, SceneParams,
)
from raytracingincuda_tpu.ops.grad import make_stream_train
from raytracingincuda_tpu.ops.pallas_stream import (
    build_stream_arrays, prepare_stream_scene, render_pallas_stream,
)
from raytracingincuda_tpu.ops.vec import Vec3
from helpers import scene_from_spheres

W, H = 24, 16
SPP, DEPTH = 2, 3


@pytest.fixture(scope="module")
def small_scene():
    return scene_from_spheres(
        [
            dict(center=(0, -1000, 0), radius=1000.0, mat=LAMBERTIAN,
                 albedo=(0.5, 0.5, 0.5)),
            dict(center=(0, 1, 0), radius=1.0, mat=LAMBERTIAN,
                 albedo=(0.8, 0.2, 0.1)),
            dict(center=(2, 1, 0), radius=1.0, mat=METAL,
                 albedo=(0.7, 0.6, 0.5), fuzz=0.1),
        ],
        pad_to=8,
    )


def test_build_stream_arrays_matches_host(small_scene):
    stream = prepare_stream_scene(small_scene, block=32)
    sm, bounds = build_stream_arrays(
        small_scene, stream.perm, stream.block,
        stream.scene_mat.shape[0],
    )
    np.testing.assert_array_equal(
        np.asarray(sm), np.asarray(stream.scene_mat)
    )
    # bounds: same shape, conservative containment (float-op order may
    # differ by ulps from the numpy host path)
    np.testing.assert_allclose(
        np.asarray(bounds), np.asarray(stream.bounds), rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.slow
def test_fused_matches_two_program(small_scene):
    """mse_train_stream's one-kernel loss + grads must match the eager
    composition (render -> MSE cotangent -> render_pallas_stream_grads)
    bit-for-bit up to float association of the loss reduce."""
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream, render_pallas_stream_grads,
    )

    cam = CameraConfig.reference_default()
    stream = prepare_stream_scene(small_scene, block=32)
    target = render_pallas_stream(
        stream, cam, W, H, SPP, DEPTH, gamma=False, ray_tile=128,
        interpret=True,
    ) * 0.9  # nonzero residual

    loss_f, ds_f, dc_f = mse_train_stream(
        stream, cam, target, W, H, SPP, DEPTH, ray_tile=128,
        interpret=True,
    )

    img = render_pallas_stream(stream, cam, W, H, SPP, DEPTH,
                               gamma=False, ray_tile=128, interpret=True)
    n = W * H * 3
    g_acc = (2.0 / n) * (img - target) / SPP
    ds_e, dc_e = render_pallas_stream_grads(
        stream, cam, g_acc, W, H, SPP, DEPTH, ray_tile=128,
        interpret=True,
    )
    loss_e = float(jnp.mean((img - target) ** 2))
    assert abs(float(loss_f) - loss_e) < 1e-7 * max(1.0, loss_e)
    np.testing.assert_allclose(np.asarray(ds_f), np.asarray(ds_e),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dc_f), np.asarray(dc_e),
                               rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_stream_fused_multi_pixel_lane(small_scene):
    """Stream fused train step with multi-pixel lanes: the shared
    K-pixel regen render flushes complete-pixel sums (per-pixel
    radiance bit-identical to K=1, so the loss matches to reduce
    association) and the grad sweep rides the shared K machinery
    (grads equal up to reassociation)."""
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream,
    )

    cam = CameraConfig.reference_default()
    stream = prepare_stream_scene(small_scene, block=32)
    target = render_pallas_stream(
        stream, cam, W, H, SPP, DEPTH, gamma=False, ray_tile=128,
        interpret=True,
    ) * 0.9
    base = mse_train_stream(
        stream, cam, target, W, H, SPP, DEPTH, ray_tile=128,
        interpret=True, pixels_per_lane=1,
    )
    got = mse_train_stream(
        stream, cam, target, W, H, SPP, DEPTH, ray_tile=64,
        interpret=True, pixels_per_lane=4,
    )
    np.testing.assert_allclose(float(got[0]), float(base[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(base[1]),
                               rtol=1e-4, atol=5e-7)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(base[2]),
                               rtol=1e-4, atol=5e-7)


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_stream_train_recovers_albedo(small_scene, fused):
    cam = CameraConfig.reference_default()
    stream = prepare_stream_scene(small_scene, block=32)
    target = render_pallas_stream(
        stream, cam, W, H, SPP, DEPTH, gamma=False, ray_tile=128,
        interpret=True,
    )

    # perturb the big sphere's albedo; train albedo only
    p = small_scene.params
    alb = Vec3(
        p.albedo.x.at[1].set(0.3),
        p.albedo.y.at[1].set(0.7),
        p.albedo.z.at[1].set(0.6),
    )
    params0 = SceneParams(center=p.center, radius=p.radius, albedo=alb,
                          fuzz=p.fuzz, ior=p.ior)
    trainable = SceneParams(
        center=Vec3(False, False, False), radius=False,
        albedo=Vec3(True, True, True), fuzz=False, ior=False,
    )

    init_fn, step_fn = make_stream_train(
        stream, W, H, SPP, DEPTH, learning_rate=0.1,
        trainable=trainable, interpret=True, fused=fused,
    )
    state = init_fn(params0)
    losses = []
    for _ in range(8):
        state, loss = step_fn(state, cam, small_scene.mat_type,
                              small_scene.active, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.35, losses
    assert np.isfinite(losses).all()
    # the perturbed albedo moved toward the truth
    got = float(state.params.albedo.x[1])
    assert abs(got - 0.8) < abs(0.3 - 0.8)


def test_stream_fused_hbm_park_matches_retrace(small_scene, default_camera):
    """Round-4 FULL-PARK on the streaming fused step: the render pass
    parks every wave to HBM and the grad sweep is reverse-only — no
    per-wave O(N) block re-walk. Identical loss/cotangents up to
    reassociation (here bit-equal: one round covers the whole tile),
    and the auto routes to it whenever the buffer fits."""
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream,
    )

    stream = prepare_stream_scene(small_scene, block=32)
    rng = np.random.default_rng(4)
    target = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    kw = dict(ray_tile=128, interpret=True)
    base = mse_train_stream(stream, default_camera, target, W, H, SPP,
                            DEPTH, park=False, **kw)
    hbm = mse_train_stream(stream, default_camera, target, W, H, SPP,
                           DEPTH, park="hbm", **kw)
    auto = mse_train_stream(stream, default_camera, target, W, H, SPP,
                            DEPTH, **kw)
    np.testing.assert_allclose(float(base[0]), float(hbm[0]), rtol=1e-7)
    for a, b in zip(base[1:], hbm[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-7)
    for a, b in zip(auto, hbm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # rr estimator through the stream hbm reverse
    base = mse_train_stream(stream, default_camera, target, W, H, SPP,
                            DEPTH, park=False, rr_start=2, **kw)
    hbm = mse_train_stream(stream, default_camera, target, W, H, SPP,
                           DEPTH, park="hbm", rr_start=2, **kw)
    np.testing.assert_allclose(float(base[0]), float(hbm[0]), rtol=1e-7)
    for a, b in zip(base[1:], hbm[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-7)

    # the standalone grad program has no render to park from
    import pytest

    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        render_pallas_stream_grads,
    )

    g = jnp.zeros((H, W, 3), jnp.float32)
    with pytest.raises(ValueError, match="fused"):
        render_pallas_stream_grads(stream, default_camera, g, W, H,
                                   SPP, DEPTH, park="hbm", **kw)


def test_front_to_back_border_camdist_invariant(default_camera):
    """front_to_back_border returns CANONICAL block indices, so a
    stream prepared with camdist_from (bounds rows already permuted)
    must yield the SAME visit order as a camdist-free stream — and the
    order must actually be front-to-back on the canonically rebuilt
    bounds (ADVICE r4: the pre-fix code argsorted the prepared rows and
    applied the result to canonical rows, scrambling the order)."""
    from raytracingincuda_tpu.models.camera import initialize
    from raytracingincuda_tpu.ops.grad import front_to_back_border

    spheres = [
        dict(center=(3.0 * i, 0.2, 3.0 * i), radius=0.2,
             mat=LAMBERTIAN, albedo=(0.5, 0.5, 0.5))
        for i in range(32)
    ]
    scene = scene_from_spheres(spheres, pad_to=32)
    plain = prepare_stream_scene(scene, block=8)
    cc = initialize(default_camera, W, H).center
    cam_p = (float(cc.x), float(cc.y), float(cc.z))
    camd = prepare_stream_scene(scene, block=8, camdist_from=cam_p)
    b_plain = np.asarray(front_to_back_border(plain, default_camera, W, H))
    b_camd = np.asarray(front_to_back_border(camd, default_camera, W, H))
    assert b_plain.shape[0] > 1
    np.testing.assert_array_equal(b_plain, b_camd)

    # front-to-back on the canonical rebuild (what the walk consumes)
    _, bounds = build_stream_arrays(
        scene, plain.perm, plain.block, plain.scene_mat.shape[0]
    )
    bn = np.asarray(bounds)[b_plain]
    d = np.sqrt(((bn[:, 0:3] - np.array(cam_p)) ** 2).sum(1)) - bn[:, 3]
    d = np.where(bn[:, 3] > 0.0, d, np.inf)
    finite = d[np.isfinite(d)]
    assert (np.diff(finite) >= -1e-4).all(), finite


def test_stream_explicit_sweep_disables_park_auto(small_scene,
                                                  default_camera):
    """mse_train_stream with an explicit sweep must run that sweep, not
    be overridden by the full-park auto (park ignores sweep) — the
    stream twin of the VMEM fused step's rule (ADVICE r4). Pinned by
    bitwise equality with the explicitly forced park=False path."""
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream,
    )

    stream = prepare_stream_scene(small_scene, block=32)
    rng = np.random.default_rng(7)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    for sweep in ("sample", "wave"):
        kw = dict(seed=7, interpret=True, ray_tile=64)
        if sweep == "sample":
            kw["pixels_per_lane"] = 1
        auto = mse_train_stream(
            stream, default_camera, tgt, W, H, SPP, DEPTH,
            sweep=sweep, **kw,
        )
        forced = mse_train_stream(
            stream, default_camera, tgt, W, H, SPP, DEPTH,
            sweep=sweep, park=False, **kw,
        )
        for a, b in zip(auto, forced):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"sweep={sweep}")


@pytest.mark.parametrize("loss_kind", ["l1", "huber", "relmse"])
def test_stream_loss_family_matches_oracle(small_scene, default_camera,
                                           loss_kind):
    """Round 5: the STREAM fused step's per-pixel loss family vs
    jax.value_and_grad through the jnp oracle (linear radiance — the
    stream step renders gamma-off)."""
    from raytracingincuda_tpu.models.scene import Scene
    from raytracingincuda_tpu.ops import tracer
    from raytracingincuda_tpu.ops.pallas_backward import chain_to_params
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream, stream_grads_to_scene_mat,
    )

    rng = np.random.default_rng(13)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    stream = prepare_stream_scene(small_scene, block=32)
    loss, d_stream, d_cr = mse_train_stream(
        stream, default_camera, tgt, W, H, SPP, DEPTH,
        ray_tile=64, interpret=True, loss=loss_kind, huber_delta=0.25,
    )
    d_sm = stream_grads_to_scene_mat(d_stream, stream,
                                     small_scene.num_slots)
    d_params, d_cam = chain_to_params(
        d_sm, d_cr, small_scene.params, default_camera,
        small_scene.mat_type, small_scene.active, W, H,
    )

    def oracle_loss(p, c):
        img = tracer.render(
            Scene(p, small_scene.mat_type, small_scene.active), c,
            W, H, SPP, DEPTH, gamma=False,
        )
        d = img - tgt
        if loss_kind == "l1":
            return jnp.mean(jnp.abs(d))
        if loss_kind == "huber":
            hd = 0.25
            a = jnp.abs(d)
            return jnp.mean(jnp.where(a <= hd, 0.5 * d * d,
                                      hd * (a - 0.5 * hd)))
        return jnp.mean(d * d / (tgt * tgt + 1e-2))

    oloss, ograds = jax.value_and_grad(oracle_loss, argnums=(0, 1))(
        small_scene.params, default_camera)
    np.testing.assert_allclose(float(loss), float(oloss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves((d_params, d_cam)),
                    jax.tree_util.tree_leaves(ograds)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=7e-3, atol=7e-4)


def test_stream_explicit_park_oversize(small_scene, default_camera):
    """Explicit park='hbm' on the stream fused step shrinks K to the
    buffer fit and fails fast (ValueError) when even K=1 cannot fit —
    not a 100+ GiB runtime allocation (round-5 review; mirrors the
    VMEM twin's ADVICE-r4 guard)."""
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream,
    )

    stream = prepare_stream_scene(small_scene, block=32)
    tgt = jnp.zeros((H, W, 3), jnp.float32)
    with pytest.raises(ValueError, match="HBM budget"):
        # 1 * 8192 * 64 * 40 rows * 1024 * 4 B ≈ 86 GB at K=1
        mse_train_stream(
            stream, default_camera, tgt, W, H, 8192, 64,
            ray_tile=1024, interpret=True, park="hbm",
        )


def test_stream_train_nonfused_honors_loss(small_scene, default_camera):
    """make_stream_train(fused=False, loss=...) must train the
    requested objective (round-5 review: it silently fell back to MSE).
    The reported loss must equal the fused step's for the same loss
    kind (both are the same per-pixel formula on the same render)."""
    from raytracingincuda_tpu.ops.grad import make_stream_train

    stream = prepare_stream_scene(small_scene, block=32)
    rng = np.random.default_rng(17)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    losses = {}
    for fused in (True, False):
        init_fn, step_fn = make_stream_train(
            stream, W, H, SPP, DEPTH, learning_rate=1e-2,
            fused=fused, interpret=True, loss="l1",
        )
        state = init_fn(small_scene.params)
        _state, loss = step_fn(state, default_camera,
                               small_scene.mat_type,
                               small_scene.active, tgt)
        losses[fused] = float(loss)
    # same formula, same streams; different programs → reassociation tol
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
    # and it is actually L1, not MSE (the two differ grossly here)
    assert losses[True] > 0.05
