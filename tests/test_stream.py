"""Streaming-HBM path (ops/pallas_stream.py): double-buffered sphere
blocks + Morton-sorted block culling vs the jnp oracle (interpret mode).

The stream kernel reuses _regen_body's bounce math and the oracle's RNG
streams, so images must match the oracle exactly in interpret mode (the
per-block winner update preserves argmin semantics across blocks)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_random_scene, build_scene
from raytracingincuda_tpu.ops import tracer
from raytracingincuda_tpu.ops.pallas_stream import (
    prepare_stream_scene, render_pallas_stream,
)

W, H = 40, 24


@pytest.mark.slow
def test_stream_matches_oracle_reference_scene(tiny_scene, default_camera):
    stream = prepare_stream_scene(tiny_scene, block=32)
    img_s = np.asarray(
        render_pallas_stream(stream, default_camera, W, H, 2, 6,
                             ray_tile=256, interpret=True)
    )
    img_o = np.asarray(tracer.render(tiny_scene, default_camera, W, H, 2, 6))
    np.testing.assert_allclose(img_s, img_o, atol=5e-5)


@pytest.mark.slow
def test_stream_big_scene_sorted_and_unsorted(default_camera):
    big = build_random_scene(1000, pad_to_multiple=128)
    sorted_s = prepare_stream_scene(big, block=128)
    unsorted_s = prepare_stream_scene(big, block=128, sort=False)
    img_sorted = np.asarray(
        render_pallas_stream(sorted_s, default_camera, W, H, 1, 4,
                             ray_tile=256, interpret=True)
    )
    img_unsorted = np.asarray(
        render_pallas_stream(unsorted_s, default_camera, W, H, 1, 4,
                             ray_tile=256, interpret=True)
    )
    img_o = np.asarray(tracer.render(big, default_camera, W, H, 1, 4))
    np.testing.assert_allclose(img_sorted, img_o, atol=5e-5)
    np.testing.assert_allclose(img_unsorted, img_o, atol=5e-5)


@pytest.mark.slow
def test_multi_pixel_lanes_match(default_camera):
    """pixels_per_lane K > 1 (lane works K pixels sequentially) must
    reproduce the K=1 stream image exactly — same per-pixel RNG streams,
    assignment is bookkeeping (mirrors the VMEM kernel's contract)."""
    big = build_random_scene(300, pad_to_multiple=128, half_extent=10.0)
    stream = prepare_stream_scene(big, block=64)
    kw = dict(ray_tile=64, interpret=True)
    img1 = np.asarray(render_pallas_stream(
        stream, default_camera, W, H, 2, 4, pixels_per_lane=1, **kw))
    img4 = np.asarray(render_pallas_stream(
        stream, default_camera, W, H, 2, 4, pixels_per_lane=4, **kw))
    assert np.array_equal(img1, img4)


@pytest.mark.slow
def test_lane_group_bit_identical(default_camera):
    """Per-lane-group culling only changes WHICH non-improving block
    batches are skipped — the image must be bit-identical to whole-wave
    gating (and still match the oracle)."""
    big = build_random_scene(600, pad_to_multiple=128, half_extent=10.0)
    stream = prepare_stream_scene(big, block=64)
    kw = dict(ray_tile=256, interpret=True)
    img0 = np.asarray(render_pallas_stream(
        stream, default_camera, W, H, 1, 4, lane_group=0, **kw))
    img128 = np.asarray(render_pallas_stream(
        stream, default_camera, W, H, 1, 4, lane_group=128, **kw))
    assert np.array_equal(img0, img128)
    img_o = np.asarray(tracer.render(big, default_camera, W, H, 1, 4))
    np.testing.assert_allclose(img0, img_o, atol=5e-5)


@pytest.mark.slow
def test_resident_bit_identical(default_camera):
    """The VMEM-resident block walk (texture-cache analog for scenes
    that fit — auto for packed matrices <= 2 MB) must be bit-identical
    to the per-wave DMA walk: same blocks, same bound culling, same
    winner updates — only the fetch path differs."""
    big = build_random_scene(600, pad_to_multiple=128, half_extent=10.0)
    stream = prepare_stream_scene(big, block=64)
    for kw in (dict(), dict(lane_group=128), dict(pixels_per_lane=4)):
        img_dma = np.asarray(render_pallas_stream(
            stream, default_camera, W, H, 1, 4, ray_tile=256,
            resident=False, interpret=True, **kw))
        img_res = np.asarray(render_pallas_stream(
            stream, default_camera, W, H, 1, 4, ray_tile=256,
            resident=True, interpret=True, **kw))
        assert np.array_equal(img_dma, img_res)


@pytest.mark.slow
def test_one_block_resident_fast_path(default_camera):
    """A one-block resident scene (pad_pairs=False, block >= N — the
    packed small-scene production shape) takes the straight-line
    fast path in _hit_world_stream; it must be bit-identical to the
    multi-block resident walk and match the oracle. Both K=1 and
    multi-pixel lanes."""
    big = build_random_scene(600, pad_to_multiple=128, half_extent=10.0)
    walk = prepare_stream_scene(big, block=64)
    one = prepare_stream_scene(big, block=1024, pad_pairs=False)
    assert one.n_blocks == 1
    for kw in (dict(), dict(pixels_per_lane=4)):
        img_walk = np.asarray(render_pallas_stream(
            walk, default_camera, W, H, 1, 4, ray_tile=256,
            resident=True, interpret=True, **kw))
        img_one = np.asarray(render_pallas_stream(
            one, default_camera, W, H, 1, 4, ray_tile=256,
            resident=True, interpret=True, **kw))
        assert np.array_equal(img_walk, img_one)
    img_o = np.asarray(tracer.render(big, default_camera, W, H, 1, 4))
    np.testing.assert_allclose(img_one, img_o, atol=5e-5)


def test_prepare_stream_scene_layout(tiny_scene):
    stream = prepare_stream_scene(tiny_scene, block=32)
    mat = np.asarray(stream.scene_mat)
    # padded to an even number of blocks
    assert mat.shape[0] % (2 * 32) == 0
    assert stream.n_blocks == mat.shape[0] // 32
    # active spheres preserved (same multiset of radii)
    orig = np.asarray(tiny_scene.params.radius)[np.asarray(tiny_scene.active)]
    got = mat[mat[:, 10] > 0.5, 3]
    np.testing.assert_allclose(np.sort(orig), np.sort(got))
    # bounds contain every active sphere of their block
    b = 32
    for k in range(stream.n_blocks):
        blk = mat[k * b:(k + 1) * b]
        act = blk[blk[:, 10] > 0.5]
        if act.shape[0] == 0:
            continue
        ctr = np.asarray(stream.bounds)[k, 0:3]
        rb = np.asarray(stream.bounds)[k, 3]
        dist = np.sqrt(((act[:, 0:3] - ctr) ** 2).sum(1)) + act[:, 3]
        assert (dist <= rb + 1e-5).all()


def test_rejects_odd_block_count(tiny_scene, default_camera):
    """A hand-built StreamScene with an odd block count would silently
    drop the last block from every hit test (paired DMA walk)."""
    import pytest

    from raytracingincuda_tpu.ops.pallas_stream import (
        StreamScene, prepare_stream_scene, render_pallas_stream,
    )

    st = prepare_stream_scene(tiny_scene, block=8)
    bad = StreamScene(
        scene_mat=jnp.concatenate(
            [st.scene_mat, jnp.zeros((8, st.scene_mat.shape[1]))]
        ),
        bounds=jnp.concatenate([st.bounds, jnp.zeros((1, 8))]),
        block=8, perm=st.perm,
    )
    with pytest.raises(ValueError, match="even block count"):
        render_pallas_stream(bad, default_camera, 16, 8, 1, 2,
                             resident=False, interpret=True)
    # the resident walk has no pairing and accepts any block count
    img = render_pallas_stream(bad, default_camera, 16, 8, 1, 2,
                               resident=True, interpret=True)
    assert np.isfinite(np.asarray(img)).all()


def test_rejects_bad_lane_group(tiny_scene, default_camera):
    import pytest

    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )

    st = prepare_stream_scene(tiny_scene, block=8)
    with pytest.raises(ValueError, match="lane_group"):
        render_pallas_stream(st, default_camera, 16, 8, 1, 2,
                             lane_group=96, ray_tile=256,
                             interpret=True)


def test_prepare_rejects_non_f32(tiny_scene):
    import pytest

    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene,
    )

    with pytest.raises(NotImplementedError, match="f32"):
        prepare_stream_scene(tiny_scene, dtype=jnp.bfloat16)


def test_auto_block_for_huge_scenes():
    """The SMEM block-bounds table (512 B/block after Mosaic's 16x row
    padding) must stay under the ~1 MB SMEM budget: prepare's block size
    doubles as needed (measured: 3908 blocks fails AOT compile with an
    SMEM allocation error; 1954 works)."""
    from raytracingincuda_tpu.ops.pallas_stream import (
        _MAX_BLOCKS, _auto_block,
    )

    assert _auto_block(488, 256) == 256          # small scenes unchanged
    assert _auto_block(100_000, 256) == 256      # 391 blocks, fine
    assert _auto_block(1_000_000, 256) == 1024   # 3907 -> 977 blocks
    for n in (10, 10_000, 500_000, 1_000_000, 5_000_000):
        b = _auto_block(n, 256)
        n_pad = ((max(n, 1) + 2 * b - 1) // (2 * b)) * 2 * b
        assert n_pad // b <= _MAX_BLOCKS


def test_dense_resident_cull_matches_vmem(default_camera):
    """The culled VMEM closest-hit (dense 16-column resident walk:
    Morton blocks + camdist bounds order + running-t_best bound culling)
    is bit-identical to the straight (N, R) scan — culling only skips
    blocks that provably cannot improve any lane, and the per-block
    numerator-domain min merge is exact."""
    from raytracingincuda_tpu.models.camera import initialize
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )

    scene = build_scene(1)
    W, H, SPP, D = 64, 40, 2, 8
    base = np.asarray(
        render_pallas(scene, default_camera, W, H, SPP, D, interpret=True)
    )
    cc = initialize(default_camera, W, H).center
    campt = [float(cc.x), float(cc.y), float(cc.z)]
    for block, group in [(32, 0), (64, 0), (32, 128)]:
        st = prepare_stream_scene(scene, block=block, pad_pairs=False,
                                  dense=True, camdist_from=campt)
        img = np.asarray(render_pallas_stream(
            st, default_camera, W, H, SPP, D, interpret=True,
            resident=True, lane_group=group, ray_tile=256,
        ))
        np.testing.assert_array_equal(img, base, err_msg=f"b{block}g{group}")

    # dense scenes are resident-only: the HBM DMA path must refuse
    import pytest

    st = prepare_stream_scene(scene, block=32, pad_pairs=False,
                              dense=True)
    with pytest.raises(ValueError, match="resident"):
        render_pallas_stream(st, default_camera, W, H, 1, 2,
                             interpret=True, resident=False)
    with pytest.raises(ValueError, match="resident"):
        prepare_stream_scene(scene, block=32, dense=True)
