"""Scene-construction tests against the reference's specs (SURVEY.md §2.1b)."""
import numpy as np
import jax.numpy as jnp

from raytracingincuda_tpu.models import scene as sc


def test_slot_counts():
    assert sc.num_slots_for_scene(1) == 488
    assert sc.num_slots_for_scene(2) == 40
    assert sc.num_slots_for_scene(3) == 125
    assert sc.num_slots_for_scene(99) == 125  # any other id -> default scene


def test_padding():
    s = sc.build_scene(1)
    assert s.num_slots == 512  # 488 -> next multiple of 128
    assert not bool(s.active[488:].any())
    s2 = sc.build_scene(2, pad_to_multiple=None)
    assert s2.num_slots == 40


def test_ground_sphere():
    s = sc.build_scene(1)
    assert float(s.params.center.y[0]) == -1000.0
    assert float(s.params.radius[0]) == 1000.0
    assert int(s.mat_type[0]) == sc.LAMBERTIAN
    np.testing.assert_allclose(
        [float(s.params.albedo.x[0]), float(s.params.albedo.y[0]),
         float(s.params.albedo.z[0])], [0.5, 0.5, 0.5]
    )


def test_big_three_spheres():
    for scene_id, n in [(1, 488), (2, 40), (3, 125)]:
        s = sc.build_scene(scene_id)
        i = n - 3
        assert int(s.mat_type[i]) == sc.DIELECTRIC
        assert float(s.params.ior[i]) == 1.5
        assert int(s.mat_type[i + 1]) == sc.LAMBERTIAN
        np.testing.assert_allclose(float(s.params.center.x[i + 1]), -4.0)
        assert int(s.mat_type[i + 2]) == sc.METAL
        assert float(s.params.fuzz[i + 2]) == 0.0
        for j in (i, i + 1, i + 2):
            assert bool(s.active[j])
            assert float(s.params.radius[j]) == 1.0
            assert float(s.params.center.y[j]) == 1.0


def test_small_sphere_properties():
    s = sc.build_scene(1)
    act = np.asarray(s.active[1:485])
    # distance filter removes only a few cells near (4, 0.2, 0)
    assert act.sum() > 450
    centers = np.stack(
        [np.asarray(c[1:485]) for c in s.params.center], axis=-1
    )[act]
    radii = np.asarray(s.params.radius[1:485])[act]
    np.testing.assert_allclose(radii, 0.2)
    np.testing.assert_allclose(centers[:, 1], 0.2)
    # all survivors respect the distance filter (main.cu:168)
    d = np.linalg.norm(centers - np.array([4.0, 0.2, 0.0]), axis=-1)
    assert (d > 0.9).all()
    # material mix roughly 80/15/5 (main.cu:175-191)
    mats = np.asarray(s.mat_type[1:485])[act]
    frac_lam = (mats == sc.LAMBERTIAN).mean()
    frac_met = (mats == sc.METAL).mean()
    assert 0.7 < frac_lam < 0.9
    assert 0.08 < frac_met < 0.25
    # metal albedo in [0.5, 1], fuzz in [0, 0.5]
    met = mats == sc.METAL
    alb = np.stack([np.asarray(a[1:485])[act] for a in s.params.albedo], -1)
    assert (alb[met] >= 0.5).all() and (alb[met] <= 1.0).all()
    fz = np.asarray(s.params.fuzz[1:485])[act]
    assert (fz[met] >= 0.0).all() and (fz[met] <= 0.5).all()


def test_scene_deterministic_per_seed():
    a = sc.build_scene(1, seed=7)
    b = sc.build_scene(1, seed=7)
    c = sc.build_scene(1, seed=8)
    np.testing.assert_array_equal(
        np.asarray(a.params.center.x), np.asarray(b.params.center.x)
    )
    assert not np.array_equal(
        np.asarray(a.params.center.x), np.asarray(c.params.center.x)
    )


def test_dtype_plumbs():
    s = sc.build_scene(2, dtype=jnp.bfloat16)
    assert s.params.radius.dtype == jnp.bfloat16
    assert s.mat_type.dtype == jnp.int32


def test_serial_reference_scene_replica():
    """models/reference_scene.py replays the serial baseline's unseeded
    glibc rand() scene construction bit-exactly; the digest is pinned
    from a validation against a C++ dump compiled against the
    reference's own headers (benchmarks/external_parity.py)."""
    import hashlib

    import numpy as np

    from raytracingincuda_tpu.models.reference_scene import (
        build_serial_reference_scene, serial_scene1_arrays,
    )

    arrays = serial_scene1_arrays()
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a, np.float64).tobytes())
    assert h.hexdigest() == (
        "aca58f22a147bd5a5c86f8d347b33f22026bd110e6ba19a99e47d5b83016a0f8"
    )
    center, radius, mat, albedo, fuzz, ior = arrays
    # 1 ground + 483 surviving small spheres + 3 big = 487 (the serial
    # list has no uninitialized gaps, unlike the CUDA slot arrays)
    assert center.shape[0] == 487
    scene = build_serial_reference_scene()
    assert int(scene.active.sum()) == 487
    assert scene.num_slots == 512  # padded to the 128 multiple
