"""Scatter-function unit tests (material.h:38-89 semantics)."""
import numpy as np
import jax.numpy as jnp

from raytracingincuda_tpu.models import materials
from raytracingincuda_tpu.models.scene import DIELECTRIC, LAMBERTIAN, METAL
from raytracingincuda_tpu.ops import vec
from raytracingincuda_tpu.ops.vec import Vec3


def mk(n, vals):
    return jnp.full((n,), vals, jnp.float32)


def const_vec(n, x, y, z):
    return Vec3(mk(n, x), mk(n, y), mk(n, z))


def run_scatter(mat, d_in, normal, front_face=True, albedo=(0.5, 0.5, 0.5),
                fuzz=0.0, ior=1.5, unit_rand=(0.0, 1.0, 0.0), coin=0.99):
    n = 4
    return materials.scatter(
        const_vec(n, *d_in),
        const_vec(n, *normal),
        jnp.full((n,), front_face, bool),
        jnp.full((n,), mat, jnp.int32),
        const_vec(n, *albedo),
        mk(n, fuzz),
        mk(n, ior),
        const_vec(n, *unit_rand),
        mk(n, coin),
    )


def test_schlick_limits():
    # normal incidence: r0 = ((1-ri)/(1+ri))^2
    r = materials.schlick_reflectance(jnp.float32(1.0), jnp.float32(1.5))
    np.testing.assert_allclose(float(r), ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-6)
    # grazing: reflectance -> 1
    r = materials.schlick_reflectance(jnp.float32(0.0), jnp.float32(1.5))
    np.testing.assert_allclose(float(r), 1.0, rtol=1e-6)


def test_lambertian_direction_and_albedo():
    out = run_scatter(LAMBERTIAN, (0, -1, 0), (0, 1, 0),
                      unit_rand=(1, 0, 0), albedo=(0.3, 0.2, 0.1))
    d = np.array([float(out.direction.x[0]), float(out.direction.y[0]),
                  float(out.direction.z[0])])
    np.testing.assert_allclose(d, [1.0, 1.0, 0.0], atol=1e-6)  # n + rand
    np.testing.assert_allclose(float(out.attenuation.x[0]), 0.3)
    assert bool(out.scattered[0])


def test_lambertian_degenerate_guard():
    # unit_rand == -normal would produce a near-zero direction (material.h:44)
    out = run_scatter(LAMBERTIAN, (0, -1, 0), (0, 1, 0), unit_rand=(0, -1, 0))
    d = np.array([float(out.direction.x[0]), float(out.direction.y[0]),
                  float(out.direction.z[0])])
    np.testing.assert_allclose(d, [0.0, 1.0, 0.0], atol=1e-6)  # falls back to n


def test_metal_mirror_and_absorption():
    # fuzz=0: exact unit-length specular reflection
    out = run_scatter(METAL, (1, -1, 0), (0, 1, 0), unit_rand=(0, 0, 1))
    d = np.array([float(out.direction.x[0]), float(out.direction.y[0]),
                  float(out.direction.z[0])])
    np.testing.assert_allclose(d, np.array([1, 1, 0]) / np.sqrt(2), atol=1e-6)
    assert bool(out.scattered[0])
    # large fuzz pushing the ray below the surface absorbs (material.h:58)
    out2 = run_scatter(METAL, (1, -0.01, 0), (0, 1, 0), fuzz=1.0,
                       unit_rand=(0, -1, 0))
    assert not bool(out2.scattered[0])


def test_dielectric_refracts_with_low_coin():
    # coin=0.99 > reflectance at normal-ish incidence -> refract
    out = run_scatter(DIELECTRIC, (0, -1, 0), (0, 1, 0), ior=1.5, coin=0.99)
    assert float(out.direction.y[0]) < 0  # continues downward (refracted)
    np.testing.assert_allclose(float(out.attenuation.x[0]), 1.0)  # no tint


def test_dielectric_total_internal_reflection():
    # exiting glass (front_face=False => eta = ior = 1.5) at a grazing angle
    # beyond the critical angle must reflect even with coin=1 (never reflect
    # by Schlick): cannot_refract branch material.h:79-84
    grazing = (1.0, -0.2, 0.0)
    out = run_scatter(DIELECTRIC, grazing, (0, 1, 0), front_face=False,
                      ior=1.5, coin=1.0)
    d_in = np.array(grazing) / np.linalg.norm(grazing)
    expect = d_in - 2 * d_in[1] * np.array([0.0, 1.0, 0.0])
    got = np.array([float(out.direction.x[0]), float(out.direction.y[0]),
                    float(out.direction.z[0])])
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_dielectric_schlick_coin_reflects():
    # coin=0 => reflectance > coin always -> reflect (stochastic Fresnel)
    out = run_scatter(DIELECTRIC, (0, -1, 0), (0, 1, 0), ior=1.5, coin=0.0)
    assert float(out.direction.y[0]) > 0  # bounced back up


def test_material_lane_select():
    """Mixed material batch: each lane follows its own material."""
    n = 3
    mats = jnp.asarray([LAMBERTIAN, METAL, DIELECTRIC], jnp.int32)
    out = materials.scatter(
        const_vec(n, 0, -1, 0),
        const_vec(n, 0, 1, 0),
        jnp.ones((n,), bool),
        mats,
        const_vec(n, 0.3, 0.3, 0.3),
        mk(n, 0.0),
        mk(n, 1.5),
        const_vec(n, 1, 0, 0),
        mk(n, 0.99),
    )
    att = np.asarray(out.attenuation.x)
    np.testing.assert_allclose(att, [0.3, 0.3, 1.0])  # dielectric untinted
    d = np.stack([np.asarray(out.direction.x), np.asarray(out.direction.y),
                  np.asarray(out.direction.z)], -1)
    np.testing.assert_allclose(d[0], [1, 1, 0], atol=1e-6)      # n + rand
    np.testing.assert_allclose(d[1], [0, 1, 0], atol=1e-6)      # mirror up
    assert d[2][1] < 0                                          # refracted down
