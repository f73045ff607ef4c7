"""Adaptive / incremental sampling semantics (regen kernel budget rows).

Counter-based RNG (ops/rng.py) makes sample scheduling exact: pixel p's
samples are global ids, so per-pixel budgets and multi-pass schedules must
reproduce the single-pass result (bit-exact within a pass; one float
reassociation ulp at pass joins)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.ops.adaptive import (
    budgets_from_error, render_adaptive, split_buffer_error,
)
from raytracingincuda_tpu.ops.pallas_kernel import render_pallas

W, H, D = 40, 24, 6
KW = dict(ray_tile=256, interpret=True, accumulate_only=True, gamma=False)


@pytest.mark.slow
def test_mixed_budgets_bit_exact(tiny_scene, default_camera):
    """Per-pixel budget n_p: lane traces samples [0, n_p) exactly as a
    uniform n_p-sample render would for that pixel."""
    rng = np.random.default_rng(1)
    nbm = rng.integers(1, 5, W * H).astype(np.int32)
    mix = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 4, D,
                      sample_budgets=jnp.asarray(nbm), **KW)
    )
    refs = np.stack(
        [
            np.asarray(render_pallas(tiny_scene, default_camera, W, H, k,
                                     D, **KW))
            for k in range(1, 5)
        ],
        0,
    )
    want = refs[nbm.reshape(H, W) - 1,
                np.arange(H)[:, None], np.arange(W)[None, :]]
    np.testing.assert_array_equal(mix, want)


@pytest.mark.slow
def test_zero_budget_pixels_with_multi_pixel_lanes(tiny_scene,
                                                   default_camera):
    """Regression: zero-quota pixels (adaptive refine's converged pixels)
    must contribute nothing and not stall multi-pixel lanes."""
    rng = np.random.default_rng(2)
    nb = rng.integers(0, 5, W * H).astype(np.int32)   # includes zeros
    kw2 = dict(**KW, sample_offset=2)
    a1 = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 5, D,
                      sample_budgets=jnp.asarray(nb), **kw2)
    )
    a4 = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 5, D,
                      sample_budgets=jnp.asarray(nb), pixels_per_lane=4,
                      **kw2)
    )
    np.testing.assert_array_equal(a1, a4)
    zero_mask = (nb == 0).reshape(H, W)
    assert np.all(a1[zero_mask] == 0.0)


@pytest.mark.slow
def test_incremental_passes_join_to_full(tiny_scene, default_camera):
    """[0,4) == [0,2) + [2,4) up to one reassociation ulp at the join."""
    full = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 4, D, **KW)
    )
    a = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 2, D,
                      sample_offset=0, **KW)
    )
    b = np.asarray(
        render_pallas(tiny_scene, default_camera, W, H, 2, D,
                      sample_offset=2, **KW)
    )
    np.testing.assert_allclose(full, a + b, atol=5e-7)


@pytest.mark.slow
def test_adaptive_end_to_end(tiny_scene, default_camera):
    res = render_adaptive(
        tiny_scene, default_camera, W, H, D, base_spp=4, max_spp=16,
        tol=0.1, ray_tile=256, interpret=True,
    )
    img = np.asarray(res.image)
    spp = np.asarray(res.spp_map)
    assert np.isfinite(img).all()
    assert img.shape == (H, W, 3)
    assert spp.min() >= 4 and spp.max() <= 16
    # adaptive must actually vary the budget on this noisy scene
    assert spp.max() > spp.min()
    # consistency by construction: zero-extra pixels are exactly
    # gamma((A+B)/base) of the SAME phase programs. (Comparing against a
    # separately compiled uniform render is NOT valid: XLA fuses the
    # host-side camera math differently per program, and ulp differences
    # flip knife-edge hit decisions on a few pixels — see the in-kernel
    # |C|^2-r^2 note in pallas_kernel._hit_select.)
    from raytracingincuda_tpu.ops.adaptive import _make_phases

    pa, pb, plan, refine, finish = _make_phases(
        W, H, D, 4, 16, 0.1, 1227, True, 256, None, True, None, False
    )
    a = pa(tiny_scene, default_camera)
    b = pb(tiny_scene, default_camera)
    base = np.sqrt(np.maximum(np.asarray(a + b) / 4.0, 0.0))
    mask = spp == 4
    np.testing.assert_allclose(img[mask], base[mask], atol=1e-6)


@pytest.mark.slow
def test_stream_multipass_accumulation_exact(default_camera):
    """Counter-RNG multi-pass exactness on the STREAM kernel: samples
    [0,4) + [4,12) accumulated in two passes equal the single 12-spp
    pass (same eager program family — cross-program comparisons are
    invalid, UPSTREAM_ISSUES.md #7)."""
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )

    scene = build_random_scene(200, half_extent=10.0)
    stream = prepare_stream_scene(scene, block=64)
    kw = dict(ray_tile=128, interpret=True, pixels_per_lane=8,
              gamma=False)
    uni = np.asarray(render_pallas_stream(
        stream, default_camera, W, H, 12, D, **kw))
    a = np.asarray(render_pallas_stream(
        stream, default_camera, W, H, 4, D, accumulate_only=True, **kw))
    c = np.asarray(render_pallas_stream(
        stream, default_camera, W, H, 8, D, sample_offset=4,
        accumulate_only=True, **kw))
    np.testing.assert_allclose((a + c) / 12.0, uni, atol=1e-6)


@pytest.mark.slow
def test_adaptive_on_stream_scene(default_camera):
    """Adaptive sampling drives the STREAMING-HBM kernel end-to-end;
    zero-extra pixels must equal gamma((A+B)/base) of the SAME phase
    programs (the vmem test's consistency-by-construction check)."""
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.adaptive import _make_phases
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene,
    )

    scene = build_random_scene(200, half_extent=10.0)
    stream = prepare_stream_scene(scene, block=64)
    res = render_adaptive(
        scene, default_camera, W, H, D, base_spp=4, max_spp=16,
        tol=0.1, ray_tile=128, interpret=True, stream=stream,
    )
    img = np.asarray(res.image)
    spp = np.asarray(res.spp_map)
    assert np.isfinite(img).all()
    assert spp.min() >= 4 and spp.max() <= 16
    assert spp.max() > spp.min()

    pa, pb, _plan, _r, _f = _make_phases(
        W, H, D, 4, 16, 0.1, 1227, True, 128, None, True, None, False,
        1, stream_block=64, stream_lane_group=0,
    )
    a = pa(stream, default_camera)
    b = pb(stream, default_camera)
    base = np.sqrt(np.maximum(np.asarray(a + b) / 4.0, 0.0))
    mask = spp == 4
    np.testing.assert_allclose(img[mask], base[mask], atol=1e-6)


@pytest.mark.slow
def test_adaptive_multi_round(tiny_scene, default_camera):
    """rounds=2: re-estimates error after the first refine and refines
    again from a disjoint sample-id window; counts stay within
    [base, max] and converged pixels keep the exact probe value."""
    res = render_adaptive(
        tiny_scene, default_camera, W, H, D, base_spp=4, max_spp=32,
        tol=0.05, ray_tile=256, interpret=True, rounds=2,
    )
    img = np.asarray(res.image)
    spp = np.asarray(res.spp_map)
    assert np.isfinite(img).all()
    assert spp.min() >= 4 and spp.max() <= 32
    assert spp.max() > spp.min()
    # multi-round budgets are even (two half-budget launches per round)
    assert np.all((spp - 4) % 2 == 0)
    # zero-extra pixels are exactly gamma((A+B)/base) of the same phase
    # programs (cross-program bit-compare is invalid; see the rounds=1
    # test note)
    from raytracingincuda_tpu.ops.adaptive import _make_phases

    pa, pb, _plan, _refines, _finish = _make_phases(
        W, H, D, 4, 32, 0.05, 1227, True, 256, None, True, None, False, 2
    )
    a = pa(tiny_scene, default_camera)
    b = pb(tiny_scene, default_camera)
    base = np.sqrt(np.maximum(np.asarray(a + b) / 4.0, 0.0))
    mask = spp == 4
    assert mask.any()
    np.testing.assert_allclose(img[mask], base[mask], atol=1e-6)


@pytest.mark.slow
def test_adaptive_rounds_reduce_error(tiny_scene, default_camera):
    """A second round must never RAISE the measured split-buffer error
    where it adds samples: total counts grow monotonically per round."""
    r1 = render_adaptive(
        tiny_scene, default_camera, W, H, D, base_spp=4, max_spp=32,
        tol=0.05, ray_tile=256, interpret=True, rounds=1,
    )
    r2 = render_adaptive(
        tiny_scene, default_camera, W, H, D, base_spp=4, max_spp=32,
        tol=0.05, ray_tile=256, interpret=True, rounds=2,
    )
    # round 2 can only add samples on top of round 1's (evened) budgets
    assert int(np.asarray(r2.spp_map).sum()) >= int(
        np.asarray(r1.spp_map).sum() - (r1.spp_map.size)  # evening slack
    )


def test_budget_formula():
    err = jnp.asarray([0.0, 0.05, 0.1, 10.0])
    extra = np.asarray(budgets_from_error(err, 16, 64, tol=0.05,
                                          smooth=False))
    assert extra[0] == 0
    assert extra[1] == 0          # already at tolerance
    assert 0 < extra[2] <= 48
    assert extra[3] == 48         # clipped at max_spp - base_spp


def test_split_buffer_error_zero_for_identical():
    a = jnp.ones((4, 4, 3))
    e = np.asarray(split_buffer_error(a, a, 2))
    np.testing.assert_allclose(e, 0.0)


def test_rejects_max_spp_below_base():
    """clip(x, 0, negative) returns the negative bound — budgets would
    silently corrupt per-pixel counts; must raise instead."""
    import pytest

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene

    with pytest.raises(ValueError, match="max_spp"):
        render_adaptive(
            build_scene(2), CameraConfig.reference_default(), 16, 8, 2,
            base_spp=8, max_spp=4, interpret=True,
        )
