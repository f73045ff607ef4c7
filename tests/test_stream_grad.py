"""Streaming-HBM backward kernel (ops/pallas_stream_backward.py).

Gradients of the streamed render w.r.t. all scene + camera params, vs
jax.grad through the jnp oracle. The stream kernel walks HBM blocks in
the forward sweep, replays each bounce's WINNER sphere in the reverse
sweep (the detached min has gradients only through the winner), and
scatters cotangents by stream-slot id; the Morton permutation must be
inverted exactly (StreamScene.perm)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import (
    DIELECTRIC, LAMBERTIAN, METAL, Scene, build_random_scene,
)
from raytracingincuda_tpu.ops import tracer
from raytracingincuda_tpu.ops.pallas_backward import chain_to_params
from raytracingincuda_tpu.ops.pallas_stream import prepare_stream_scene
from raytracingincuda_tpu.ops.pallas_stream_backward import (
    render_pallas_stream_grads, stream_grads_to_scene_mat,
)
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


def _weight():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)


def _stream_grads(scene, cam, *, block=128, ray_tile=128, mesh=None,
                  sweep="sample", window=0, pixels_per_lane=None):
    w = _weight()
    stream = prepare_stream_scene(scene, block=block)
    d_stream, d_cr = render_pallas_stream_grads(
        stream, cam, w / SPP, W, H, SPP, DEPTH, ray_tile=ray_tile,
        interpret=True, mesh=mesh, sweep=sweep, window=window,
        pixels_per_lane=pixels_per_lane,
    )
    d_sm = stream_grads_to_scene_mat(d_stream, stream, scene.num_slots)
    return chain_to_params(d_sm, d_cr, scene.params, cam,
                           scene.mat_type, scene.active, W, H)


def _oracle_grads(scene, cam):
    w = _weight()

    def loss(p, c):
        img = tracer.render(Scene(p, scene.mat_type, scene.active), c,
                            W, H, SPP, DEPTH, gamma=False)
        return jnp.sum(w * img)

    return jax.grad(loss, argnums=(0, 1))(scene.params, cam)


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
def test_matches_oracle(mixed_scene, default_camera):
    gs = _stream_grads(mixed_scene, default_camera)
    go = _oracle_grads(mixed_scene, default_camera)
    _assert_tree_close(gs, go)


@pytest.mark.slow
def test_multi_block_morton_scatter(default_camera):
    """A wider random scene spanning 4 blocks: the Morton sort reorders
    spheres across blocks, so a wrong perm/sid mapping shows up as
    swapped gradient rows."""
    scene = build_random_scene(90, seed=7, pad_to_multiple=32,
                               half_extent=8.0)
    gs = _stream_grads(scene, default_camera, block=32)
    go = _oracle_grads(scene, default_camera)
    _assert_tree_close(gs, go, rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_wave_sweep_matches_sample(mixed_scene, default_camera):
    """The stream wave-reversed regenerating sweep (round 3) must agree
    with the per-sample sweep to reassociation precision — same winner
    replay and RNG streams, wave-order accumulation. window=3 forces
    paths to span drain rounds."""
    base = _stream_grads(mixed_scene, default_camera, sweep="sample")
    for window in (0, 3):
        wave = _stream_grads(mixed_scene, default_camera, sweep="wave",
                             window=window)
        _assert_tree_close(base, wave, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_rr_grads_match_oracle_stream(mixed_scene, default_camera):
    """Russian-roulette gradients through the STREAMING backward (both
    sweeps) vs jax.grad through the oracle with the same rr_start — the
    stream kernel replays the forward's RR streams bitwise too."""
    w = _weight()
    stream = prepare_stream_scene(mixed_scene, block=128)

    def stream_rr(sweep):
        d_stream, d_cr = render_pallas_stream_grads(
            stream, default_camera, w / SPP, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, rr_start=1, sweep=sweep,
        )
        d_sm = stream_grads_to_scene_mat(d_stream, stream,
                                         mixed_scene.num_slots)
        return chain_to_params(d_sm, d_cr, mixed_scene.params,
                               default_camera, mixed_scene.mat_type,
                               mixed_scene.active, W, H)

    def loss(p, c):
        img = tracer.render(Scene(p, mixed_scene.mat_type,
                                  mixed_scene.active), c,
                            W, H, SPP, DEPTH, gamma=False, rr_start=1)
        return jnp.sum(w * img)

    go = jax.grad(loss, argnums=(0, 1))(mixed_scene.params,
                                        default_camera)
    for sweep in ("sample", "wave"):
        _assert_tree_close(stream_rr(sweep), go)


@pytest.mark.slow
def test_wave_sweep_multi_block(default_camera):
    """Wave sweep on a 4-block Morton-sorted scene: the per-wave block
    scatter must land every cotangent row in its stream slot."""
    scene = build_random_scene(90, seed=7, pad_to_multiple=32,
                               half_extent=8.0)
    base = _stream_grads(scene, default_camera, block=32, sweep="sample")
    wave = _stream_grads(scene, default_camera, block=32, sweep="wave")
    # atol floor: near-zero camera leaves see a couple reassociation
    # ulps over 90 spheres' worth of scatter sums
    _assert_tree_close(base, wave, rtol=1e-4, atol=2e-6)


@pytest.mark.slow
def test_multi_pixel_lane_stream_grads(mixed_scene, default_camera):
    """Multi-pixel lanes on the STREAM wave backward: K pixels per lane
    must reproduce K=1 gradients to reassociation (the shared sweep's
    parked pixel rows route RNG streams and cotangents correctly
    through the block walk)."""
    base = _stream_grads(mixed_scene, default_camera, sweep="wave",
                         pixels_per_lane=1)
    got = _stream_grads(mixed_scene, default_camera, sweep="wave",
                        ray_tile=64, pixels_per_lane=4, window=3)
    _assert_tree_close(base, got, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_ray_tile_invariance(mixed_scene, default_camera):
    g1 = _stream_grads(mixed_scene, default_camera, ray_tile=128)
    g2 = _stream_grads(mixed_scene, default_camera, ray_tile=512)
    _assert_tree_close(g1, g2, rtol=1e-4, atol=5e-7)


@pytest.mark.slow
def test_sharded_matches_single(mixed_scene, default_camera):
    from raytracingincuda_tpu.parallel import mesh as meshlib

    m = meshlib.make_mesh()
    gm = _stream_grads(mixed_scene, default_camera, mesh=m, ray_tile=128)
    g1 = _stream_grads(mixed_scene, default_camera, ray_tile=128)
    _assert_tree_close(gm, g1, rtol=1e-4, atol=1e-6)


def test_hbm_accumulator_matches_vmem(default_camera):
    """acc='hbm' (the >200k-sphere mode: HBM accumulator output,
    window-RMW through a VMEM staging tile) must produce BITWISE the
    resident accumulator's gradients — the same adds happen in the
    same order; only the residence differs. Multi-block Morton scene
    so the scatter crosses windows; both sweeps."""
    scene = build_random_scene(600, seed=3)
    w = _weight()
    stream = prepare_stream_scene(scene, block=128)
    for sweep in ("sample", "wave"):
        base = render_pallas_stream_grads(
            stream, default_camera, w / SPP, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, sweep=sweep, acc="vmem",
        )
        hbm = render_pallas_stream_grads(
            stream, default_camera, w / SPP, W, H, SPP, DEPTH,
            ray_tile=128, interpret=True, sweep=sweep, acc="hbm",
        )
        for a, b in zip(base, hbm):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"sweep={sweep}")


def test_hbm_accumulator_fused_step(default_camera):
    """The fused (mse) stream step with acc='hbm' — including the
    full-park auto — matches the resident-accumulator step bitwise."""
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream,
    )

    scene = build_random_scene(600, seed=4)
    stream = prepare_stream_scene(scene, block=128)
    rng = np.random.default_rng(9)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    base = mse_train_stream(
        stream, default_camera, tgt, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, acc="vmem",
    )
    hbm = mse_train_stream(
        stream, default_camera, tgt, W, H, SPP, DEPTH,
        ray_tile=128, interpret=True, acc="hbm",
    )
    for a, b in zip(base, hbm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
