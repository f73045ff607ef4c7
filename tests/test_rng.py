"""Threefry RNG tests: known-answer vectors, stream properties, samplers."""
import numpy as np
import jax.numpy as jnp

from raytracingincuda_tpu.ops import rng as rtrng
from raytracingincuda_tpu.ops import vec


def test_threefry_known_answer_vectors():
    """Random123 reference vectors for Threefry-2x32, 20 rounds."""
    cases = [
        ((0, 0), (0, 0), (0x6B200159, 0x99BA4EFE)),
        ((0xFFFFFFFF, 0xFFFFFFFF), (0xFFFFFFFF, 0xFFFFFFFF),
         (0x1CB996FC, 0xBB002BE7)),
        ((0x13198A2E, 0x03707344), (0x243F6A88, 0x85A308D3),
         (0xC4923A9C, 0x483DF7A0)),
    ]
    for (k0, k1), (c0, c1), (e0, e1) in cases:
        r0, r1 = rtrng.threefry2x32(
            jnp.uint32(k0), jnp.uint32(k1), jnp.uint32(c0), jnp.uint32(c1)
        )
        assert int(r0) == e0 and int(r1) == e1


def test_uniform_range_and_determinism():
    key = rtrng.key_from_seed(1227)
    ids = jnp.arange(4096, dtype=jnp.uint32)
    u0, u1 = rtrng.uniform2(key, ids, 3, 7, rtrng.DRAW_SCATTER)
    for u in (u0, u1):
        u = np.asarray(u)
        assert (u >= 0).all() and (u < 1).all()
        # crude uniformity: mean within 4 sigma of 0.5
        assert abs(u.mean() - 0.5) < 4 * (1 / np.sqrt(12 * u.size))
    # bit determinism
    v0, _ = rtrng.uniform2(key, ids, 3, 7, rtrng.DRAW_SCATTER)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(v0))


def test_streams_decorrelated_across_counter_fields():
    key = rtrng.key_from_seed(1227)
    ids = jnp.arange(1024, dtype=jnp.uint32)
    base, _ = rtrng.uniform2(key, ids, 0, 0, 0)
    for sample, bounce, draw in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        other, _ = rtrng.uniform2(key, ids, sample, bounce, draw)
        corr = np.corrcoef(np.asarray(base), np.asarray(other))[0, 1]
        assert abs(corr) < 0.1
        assert not np.array_equal(np.asarray(base), np.asarray(other))


def test_different_seeds_differ():
    ids = jnp.arange(128, dtype=jnp.uint32)
    a, _ = rtrng.uniform2(rtrng.key_from_seed(1), ids, 0, 0, 0)
    b, _ = rtrng.uniform2(rtrng.key_from_seed(2), ids, 0, 0, 0)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_random_unit_vector_on_sphere():
    key = rtrng.key_from_seed(42)
    ids = jnp.arange(8192, dtype=jnp.uint32)
    v = rtrng.random_unit_vector(key, ids, 0, 0, rtrng.DRAW_SCATTER)
    lens = np.asarray(vec.length(v))
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    # uniform on sphere => each component mean ~0, z uniform in [-1,1]
    for comp in (v.x, v.y, v.z):
        assert abs(np.asarray(comp).mean()) < 0.05
    z = np.asarray(v.z)
    # var of U[-1,1] is 1/3
    assert abs(z.var() - 1 / 3) < 0.02


def test_random_in_unit_disk():
    key = rtrng.key_from_seed(42)
    ids = jnp.arange(8192, dtype=jnp.uint32)
    px, py = rtrng.random_in_unit_disk(key, ids, 0)
    r2 = np.asarray(px) ** 2 + np.asarray(py) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # uniform disk: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 0.02


def test_counter_packing_no_collisions():
    cs = set()
    for sample in (0, 1, 255):
        for bounce in (0, 1, 255):
            for draw in range(8):
                cs.add(int(rtrng.make_counter(sample, bounce, draw)))
    assert len(cs) == 3 * 3 * 8


def test_stream_id_validation():
    """Counter fields are 21-bit sample / 8-bit bounce; wrappers must
    reject configs whose ids would alias adjacent fields."""
    import pytest

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops import tracer

    scene = build_scene(2)
    cam = CameraConfig.reference_default()
    with pytest.raises(ValueError, match="bounce"):
        tracer.render(scene, cam, 8, 8, 1, 300)
    with pytest.raises(ValueError, match="sample"):
        tracer.render(scene, cam, 8, 8, 4, 2,
                      sample_offset=(1 << 21) - 2)
