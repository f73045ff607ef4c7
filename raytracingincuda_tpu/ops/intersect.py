"""Batched ray-sphere intersection ("hit_world").

The reference scans spheres sequentially per thread with a shrinking
interval (``GlobalFloat…/hittable.h:80-98``).  The TPU-native form tests a
whole ray batch against the whole sphere list at once as (N_spheres, R_rays)
tiles — spheres on sublanes, rays on lanes — then takes a masked argmin over
the sphere axis.  The shrinking-interval loop and the global argmin over
per-sphere nearest-valid roots are mathematically equivalent.

The quadratic uses the half-b formulation of ``hittable.h:40-66``:
  oc = C - O;  a = |D|^2;  h = D.oc;  c = |oc|^2 - r^2
  disc = h^2 - a*c;  roots (h -/+ sqrt(disc)) / a
taking the near root if it lies in the open interval (t_min, inf), else the
far root (this matters for dielectrics: a ray inside a sphere must find the
far root — interval logic hittable.h:52-57).

The dot products expand over sphere/ray broadcasts:
  h = (C . D) - (D . O),  |oc|^2 = |C|^2 - 2 (C . O) + |O|^2
so the (N, R) work is pure fused elementwise FMA on the VPU, with optional
MXU offload of C.D / C.O contractions left to XLA.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.scene import Scene
from .vec import Vec3

# Sentinel "no hit" distance. Finite (not inf) so dead lanes never create
# inf - inf = NaN anywhere downstream (gradient hygiene).
T_MISS = 1.0e30
# Reference's shadow-acne lower bound: interval(0.001, infinity) camera.h:87.
T_MIN = 1.0e-3


class HitResult(NamedTuple):
    hit: jnp.ndarray   # (R,) bool
    t: jnp.ndarray     # (R,) distance along (unnormalized) ray, T_MISS if miss
    idx: jnp.ndarray   # (R,) int32 sphere index (arbitrary slot if miss)


def hit_world(scene: Scene, origin: Vec3, direction: Vec3,
              t_min: float = T_MIN) -> HitResult:
    """Closest-hit over all scene spheres for a flat batch of R rays.

    origin/direction: Vec3 of (R,) arrays. Returns per-ray closest hit.
    Inactive (padding / filtered) slots are masked out — the reference's
    uninitialized-slot UB (SURVEY.md §3.1) replaced by defined semantics.
    """
    p = scene.params
    # Sphere axis -> sublanes: (N, 1); ray axis -> lanes: (1, R).
    cx, cy, cz = p.center.x[:, None], p.center.y[:, None], p.center.z[:, None]
    r2 = (p.radius * p.radius)[:, None]
    active = scene.active[:, None]

    ox, oy, oz = origin.x[None, :], origin.y[None, :], origin.z[None, :]
    dx, dy, dz = direction.x[None, :], direction.y[None, :], direction.z[None, :]

    # a = |D|^2, guarded away from 0 (degenerate lanes must stay finite).
    a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12)          # (1, R)
    c_dot_d = cx * dx + cy * dy + cz * dz                         # (N, R)
    d_dot_o = dx * ox + dy * oy + dz * oz                         # (1, R)
    h = c_dot_d - d_dot_o                                         # (N, R)

    c_dot_o = cx * ox + cy * oy + cz * oz                         # (N, R)
    c2r2 = cx * cx + cy * cy + cz * cz - r2                       # (N, 1)
    o2 = ox * ox + oy * oy + oz * oz                              # (1, R)
    # association mirrors the Pallas kernel exactly (bit-parity contract)
    c = (c2r2 + o2) - 2.0 * c_dot_o                               # (N, R)

    disc = h * h - a * c
    # Double-where for gradient hygiene: sqrt(max(disc, 0)) has NaN gradient
    # (inf * 0) on every miss lane; substitute a safe operand there instead —
    # those lanes' roots are where()-masked out, so their cotangents are
    # exactly zero and stay finite.
    disc_pos = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(disc_pos, disc, 1.0))
    # numerator-domain root select (a > 0): one inv_a multiply on the
    # winning root only — same arithmetic as the kernel's hit test
    tmin_a = t_min * a
    near_num = h - sqrtd
    root_num = jnp.where(near_num > tmin_a, near_num, h + sqrtd)
    # disc == 0 (tangent graze, measure zero) counts as miss — the reference
    # accepts it (hittable.h:48) but its gradient is unbounded.
    valid = disc_pos & (root_num > tmin_a) & active

    # min in the NUMERATOR domain, mirroring the kernel's _hit_select
    # (bit-parity contract): a > 0 per lane and float mul by a positive
    # scalar is monotone, so the argmin winner and the winning t are
    # bitwise identical to the per-sphere-multiply form — only the
    # winning root pays the inv_a multiply.
    t_num_all = jnp.where(valid, root_num, T_MISS)                # (N, R)
    idx = jnp.argmin(t_num_all, axis=0).astype(jnp.int32)         # (R,)
    t_num = jnp.take_along_axis(t_num_all, idx[None, :], axis=0)[0]
    hit = t_num < T_MISS
    t = jnp.where(hit, t_num * (1.0 / a[0]), T_MISS)              # (R,)
    return HitResult(hit=hit, t=t, idx=idx)


class HitParams(NamedTuple):
    center: Vec3
    radius: jnp.ndarray
    albedo: Vec3
    fuzz: jnp.ndarray
    ior: jnp.ndarray
    mat_type: jnp.ndarray


def gather_hit_params(scene: Scene, idx: jnp.ndarray) -> HitParams:
    """Fetch per-ray sphere/material parameters for the winning slot.

    The per-ray gather replaces the reference's pointer chase
    (``hit_record.mat``, hittable.h:63) / texture fetches
    (Tex variant, hittable.h:91-96).
    """
    p = scene.params
    take = lambda arr: jnp.take(arr, idx, axis=0)
    return HitParams(
        center=Vec3(take(p.center.x), take(p.center.y), take(p.center.z)),
        radius=take(p.radius),
        albedo=Vec3(take(p.albedo.x), take(p.albedo.y), take(p.albedo.z)),
        fuzz=take(p.fuzz),
        ior=take(p.ior),
        mat_type=take(scene.mat_type),
    )
