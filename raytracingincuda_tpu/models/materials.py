"""Material scatter models: lambertian / metal / dielectric.

The reference dispatches per-thread via a switch over a tagged-union
``material`` struct (``GlobalFloat…/material.h:18-89``, ``camera.h:92-108``)
— a warp-divergence point its own ncu profiles flag (SURVEY.md §5).  The
TPU-native wavefront form computes all three scatter candidates for every
lane with shared random draws and lane-selects by material id: divergence
becomes predicated vector work, which is exactly what the VPU wants.

All math is "safe" (guarded sqrt/normalize): lanes holding dead or missed
rays must stay finite so reverse-mode gradients of live lanes are never
poisoned through 0 * NaN.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import vec
from ..ops.vec import Vec3
from .scene import DIELECTRIC, LAMBERTIAN, METAL


class ScatterResult(NamedTuple):
    direction: Vec3        # next-bounce ray direction
    attenuation: Vec3      # multiplicative throughput factor
    scattered: jnp.ndarray  # bool: False => ray absorbed (metal below surface)


def schlick_reflectance(cosine: jnp.ndarray, ri: jnp.ndarray) -> jnp.ndarray:
    """Schlick's approximation (material.h:62-66)."""
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    one_minus = 1.0 - cosine
    return r0 + (1.0 - r0) * (one_minus ** 5)


def scatter(
    d_in: Vec3,
    normal: Vec3,
    front_face: jnp.ndarray,
    mat_type: jnp.ndarray,
    albedo: Vec3,
    fuzz: jnp.ndarray,
    ior: jnp.ndarray,
    unit_rand: Vec3,
    coin_u: jnp.ndarray,
) -> ScatterResult:
    """Wavefront scatter: evaluates every material, selects by ``mat_type``.

    Shared random draws across branches (one unit-sphere vector + one coin
    per bounce) are sound because materials are mutually exclusive per lane.

    Parity: lambertian_scatter material.h:38-49, metal_scatter :51-59,
    dieletric_scatter :68-89.
    """
    one = jnp.ones_like(fuzz)

    # -- lambertian (material.h:38-49) ------------------------------------
    lam_dir = normal + unit_rand
    lam_dir = vec.where(vec.near_zero(lam_dir), normal, lam_dir)

    # -- metal (material.h:51-59) ------------------------------------------
    reflected = vec.unit(vec.reflect(d_in, normal))
    metal_dir = reflected + unit_rand * fuzz
    metal_ok = vec.dot(metal_dir, normal) > 0.0

    # -- dielectric (material.h:68-89) --------------------------------------
    ri = jnp.where(front_face, 1.0 / ior, ior)
    ud = vec.unit(d_in)
    cos_theta = jnp.minimum(vec.dot(-ud, normal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = ri * sin_theta > 1.0
    reflect_coin = schlick_reflectance(cos_theta, ri) > coin_u
    diel_dir = vec.where(
        cannot_refract | reflect_coin,
        vec.reflect(ud, normal),
        vec.refract(ud, normal, ri),
    )

    # -- lane select ---------------------------------------------------------
    is_lam = mat_type == LAMBERTIAN
    is_metal = mat_type == METAL
    is_diel = mat_type == DIELECTRIC

    direction = vec.where(is_lam, lam_dir, vec.where(is_metal, metal_dir, diel_dir))
    attenuation = vec.where(is_diel, Vec3(one, one, one), albedo)
    # logical ops, not select-of-bools: non-metal lanes always scatter.
    # (select with a broadcast bool constant materializes an i8 vector that
    # Mosaic cannot truncate back to i1 inside Pallas kernels.)
    scattered = metal_ok | jnp.logical_not(is_metal)
    return ScatterResult(direction, attenuation, scattered)
