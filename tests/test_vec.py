"""Math-core unit tests (the reference has none — SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.ops import vec
from raytracingincuda_tpu.ops.vec import Vec3


def rand_vec3(rng, n=64):
    a = rng.standard_normal((3, n)).astype(np.float32)
    return Vec3(jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2])), a


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_arithmetic_matches_numpy(rng):
    u, ua = rand_vec3(rng)
    v, va = rand_vec3(rng)
    np.testing.assert_allclose((u + v).stack(0), ua + va, rtol=1e-6)
    np.testing.assert_allclose((u - v).stack(0), ua - va, rtol=1e-6)
    np.testing.assert_allclose((u * v).stack(0), ua * va, rtol=1e-6)
    np.testing.assert_allclose((u * 2.5).stack(0), ua * 2.5, rtol=1e-6)
    np.testing.assert_allclose((2.5 * u).stack(0), ua * 2.5, rtol=1e-6)
    np.testing.assert_allclose((u / 2.0).stack(0), ua / 2.0, rtol=1e-6)
    np.testing.assert_allclose((-u).stack(0), -ua, rtol=1e-6)


def test_dot_cross(rng):
    u, ua = rand_vec3(rng)
    v, va = rand_vec3(rng)
    np.testing.assert_allclose(vec.dot(u, v), (ua * va).sum(0), rtol=1e-5)
    c = vec.cross(u, v).stack(0)
    expected = np.cross(ua.T, va.T).T
    np.testing.assert_allclose(c, expected, rtol=1e-5, atol=1e-6)
    # cross is perpendicular to both
    np.testing.assert_allclose(
        vec.dot(vec.cross(u, v), u), np.zeros(64), atol=1e-4
    )


def test_unit_and_length(rng):
    u, ua = rand_vec3(rng)
    np.testing.assert_allclose(
        vec.length(u), np.linalg.norm(ua, axis=0), rtol=1e-5
    )
    n = vec.unit(u)
    np.testing.assert_allclose(vec.length(n), np.ones(64), rtol=1e-5)
    # zero vector stays finite (grad hygiene)
    z = Vec3.zeros((4,))
    assert np.isfinite(vec.unit(z).stack(0)).all()


def test_near_zero():
    v = Vec3(jnp.array([1e-7, 1e-3]), jnp.array([1e-7, 1e-7]),
             jnp.array([0.0, 0.0]))
    np.testing.assert_array_equal(vec.near_zero(v), [True, False])


def test_reflect():
    # 45-degree reflection off the y plane
    v = Vec3.of(1.0, -1.0, 0.0)
    n = Vec3.of(0.0, 1.0, 0.0)
    r = vec.reflect(v, n)
    np.testing.assert_allclose(
        [float(r.x), float(r.y), float(r.z)], [1.0, 1.0, 0.0], atol=1e-6
    )


def test_refract_straight_through():
    # normal incidence: direction unchanged regardless of eta
    v = Vec3.of(0.0, -1.0, 0.0)
    n = Vec3.of(0.0, 1.0, 0.0)
    r = vec.refract(v, n, jnp.float32(1.5))
    np.testing.assert_allclose(
        [float(r.x), float(r.y), float(r.z)], [0.0, -1.0, 0.0], atol=1e-6
    )


def test_refract_snells_law(rng):
    # oblique incidence: sin(theta_out) = eta * sin(theta_in)
    theta_in = 0.5
    v = Vec3.of(np.sin(theta_in), -np.cos(theta_in), 0.0)
    n = Vec3.of(0.0, 1.0, 0.0)
    eta = 0.7
    r = vec.refract(v, n, jnp.float32(eta))
    sin_out = float(r.x) / float(vec.length(r))
    np.testing.assert_allclose(sin_out, eta * np.sin(theta_in), rtol=1e-5)


def test_lerp_endpoints():
    a = Vec3.of(1.0, 1.0, 1.0)
    b = Vec3.of(0.5, 0.7, 1.0)
    l0 = vec.lerp(jnp.float32(0.0), a, b)
    l1 = vec.lerp(jnp.float32(1.0), a, b)
    np.testing.assert_allclose(float(l0.y), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(l1.y), 0.7, atol=1e-6)


def test_pytree_roundtrip(rng):
    import jax

    u, _ = rand_vec3(rng)
    leaves, treedef = jax.tree_util.tree_flatten(u)
    assert len(leaves) == 3
    v = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(v, Vec3)
