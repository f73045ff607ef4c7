"""Double-float (df64) path tracing core: the accelerator fp64 analog.

The reference ships full double-precision render variants as benchmark
axes (``GlobalDoubleCUDAInOneWeekend``, ``ConstDouble…`` — a mechanical
float->double widening of the float tracer, ``rtweekend.h:32-40``). TPU
has no f64 units at all, so this module widens the SAME estimator to
double-float arithmetic (ops/df64.py: ~49 significand bits from f32
pairs) instead: every geometric quantity — camera rays, the hit-test
quadratic, roots, hit points, normals, reflect/refract directions,
attenuation and radiance accumulation, the sky lerp — is computed in
df64. The random draws themselves stay the f32 Threefry values, promoted
exactly (lo = 0): the draw POSITIONS are what the estimator contract
fixes (ops/rng.py); widening the mantissa of a uniform sample changes
the Monte-Carlo estimate by O(2^-24) per draw, far below the f32-vs-f64
image differences this path exists to measure (README "Precision").

Everything here is pure jnp on arrays, shared verbatim by the Pallas
kernel (ops/pallas_df64.py) and usable under interpret mode on CPU; the
independent correctness oracle is the NATIVE f64 jnp tracer
(ops/tracer.py with jax_enable_x64 on CPU) — images must agree to
~2^-45 relative, far tighter than f32's knife-edge hit flips
(tests/test_df64.py).

Precision ledger (what is NOT full df64, by design):
  * random draws: f32 mantissas (see above);
  * transcendentals sin/cos in the unit-vector samplers: f32 (they feed
    sampled directions, not decision boundaries);
  * the gather one-hot matmul: exact copies (HIGHEST-precision one-hot).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.scene import DIELECTRIC, LAMBERTIAN, METAL, Scene
from . import df64 as dd
from . import rng as rtrng
from .df64 import D, D3
from .intersect import T_MIN, T_MISS
from .pallas_kernel import (
    COL_ACTIVE,
    COL_ALB_B,
    COL_ALB_G,
    COL_ALB_R,
    COL_CX,
    COL_CY,
    COL_CZ,
    COL_FUZZ,
    COL_IOR,
    COL_MAT,
    COL_RADIUS,
    NUM_COLS,
)

# --------------------------------------------------------------------------
# host-side packing (numpy float64 — jnp would truncate to f32 without x64)
# --------------------------------------------------------------------------


def pack_scene_matrix_df64(scene: Scene):
    """Scene -> two (N, 16) f32 matrices (hi, lo).

    Built in numpy f64. Scene params are stored f32, so today lo == 0
    everywhere — the geometry is exactly representable — but the split is
    kept generic for f64-sourced assets (models/io.py npz)."""
    p = scene.params
    n = scene.num_slots
    cols = [
        p.center.x, p.center.y, p.center.z,
        p.radius,
        p.albedo.x, p.albedo.y, p.albedo.z,
        p.fuzz, p.ior,
        scene.mat_type, scene.active,
    ]
    mat = np.zeros((n, NUM_COLS), np.float64)
    for k, c in enumerate(cols):
        mat[:, k] = np.asarray(c, np.float64)
    pair = dd.from_f64(mat)
    return pair.hi, pair.lo


@jax.jit
def pack_scene_matrix_df64_device(scene: Scene):
    """Device-side df64 pack: (hi, lo) with hi = the f32 scene matrix and
    lo = 0, in ONE jitted program.

    Exact, not an approximation: Scene params are STORED f32 (see
    models/scene.py), so their f64 promotion has a zero low word — this
    is the same (hi, lo) pack_scene_matrix_df64 produces, without its
    per-leaf device->host fetch (~27 ms tunnel RTT per leaf on relayed
    TPU, ~300 ms total — the round-2 df64 e2e gap). The numpy pack above
    remains for genuinely f64-valued matrices (df64 unit tests)."""
    from .pallas_kernel import pack_scene_matrix

    hi = pack_scene_matrix(scene, jnp.float32)
    return hi, jnp.zeros_like(hi)


class CameraD(NamedTuple):
    """Camera frame with df64 vectors (mirrors models/camera.Camera)."""

    center: D3
    pixel00_loc: D3
    pixel_delta_u: D3
    pixel_delta_v: D3
    defocus_disk_u: D3
    defocus_disk_v: D3
    use_defocus: jnp.ndarray


def initialize_f64(cfg, img_width: int, img_height: int) -> np.ndarray:
    """camera.initialize (camera.h:33-68) in numpy float64; returns the
    (2, 24) packed hi/lo camera rows for SMEM."""
    f = lambda v: np.float64(np.asarray(v))
    v3 = lambda v: np.array([f(v.x), f(v.y), f(v.z)], np.float64)
    lookfrom, lookat, vup = v3(cfg.lookfrom), v3(cfg.lookat), v3(cfg.vup)
    theta = f(cfg.vfov) * (math.pi / 180.0)
    h = np.tan(theta / 2.0)
    focus = f(cfg.focus_dist)
    viewport_h = 2.0 * h * focus
    viewport_w = viewport_h * (float(img_width) / float(img_height))

    def unit(v):
        return v / np.sqrt((v * v).sum())

    w = unit(lookfrom - lookat)
    u = unit(np.cross(vup, w))
    v = np.cross(w, u)
    viewport_u = u * viewport_w
    viewport_v = -v * viewport_h
    pixel_delta_u = viewport_u / float(img_width)
    pixel_delta_v = viewport_v / float(img_height)
    center = lookfrom
    upper_left = center - w * focus - viewport_u / 2.0 - viewport_v / 2.0
    pixel00 = upper_left + (pixel_delta_u + pixel_delta_v) * 0.5
    defocus_radius = focus * np.tan(
        (f(cfg.defocus_angle) / 2.0) * (math.pi / 180.0)
    )
    row = np.zeros((24,), np.float64)
    row[0:3] = pixel00
    row[3:6] = pixel_delta_u
    row[6:9] = pixel_delta_v
    row[9:12] = center
    row[12:15] = u * defocus_radius
    row[15:18] = v * defocus_radius
    row[18] = 1.0 if f(cfg.defocus_angle) > 0.0 else 0.0
    hi = row.astype(np.float32)
    lo = (row - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo])  # (2, 24)


def unpack_camera_df64(cam_hi, cam_lo) -> CameraD:
    """(1, 24) hi/lo rows -> CameraD of df64 scalars."""
    g = lambda k: D(cam_hi[0, k], cam_lo[0, k])
    v3 = lambda k: D3(g(k), g(k + 1), g(k + 2))
    return CameraD(
        pixel00_loc=v3(0), pixel_delta_u=v3(3), pixel_delta_v=v3(6),
        center=v3(9), defocus_disk_u=v3(12), defocus_disk_v=v3(15),
        use_defocus=cam_hi[0, 18] > 0.5,
    )


# --------------------------------------------------------------------------
# tracing math (pure jnp; shared by the Pallas kernel and interpret mode)
# --------------------------------------------------------------------------


def primary_rays_df64(cam: CameraD, fi, fj, pixel_ids, sample_u, key):
    """tracer.primary_rays_from_ij widened to df64 (draws stay f32)."""
    u0, u1 = rtrng.uniform2(key, pixel_ids, sample_u, 0,
                            rtrng.DRAW_JITTER, jnp.float32)
    ix = dd.add(dd.of(fi), dd.of(u0 - 0.5))
    jy = dd.add(dd.of(fj), dd.of(u1 - 0.5))
    pixel_sample = (
        cam.pixel00_loc
        + cam.pixel_delta_u.scale(ix)
        + cam.pixel_delta_v.scale(jy)
    )
    px, py = rtrng.random_in_unit_disk(key, pixel_ids, sample_u,
                                       jnp.float32)
    defocus_origin = (
        cam.center
        + cam.defocus_disk_u.scale(dd.of(px))
        + cam.defocus_disk_v.scale(dd.of(py))
    )
    bc = lambda s: D(jnp.broadcast_to(s.hi, fi.shape),
                     jnp.broadcast_to(s.lo, fi.shape))
    center = D3(bc(cam.center.x), bc(cam.center.y), bc(cam.center.z))
    origin = dd.d3_where(cam.use_defocus, defocus_origin, center)
    direction = pixel_sample - origin
    return origin, direction


def hit_world_df64(sm_hi, sm_lo, o: D3, d: D3):
    """intersect.hit_world / _hit_select widened to df64.

    sm_hi/sm_lo: (N, 16) scene matrices. o/d: D3 of (1, R) rows.
    Returns (hit (1,R) bool, t D (1,R), one_hot (N,R) f32)."""
    col = lambda k: D(sm_hi[:, k:k + 1], sm_lo[:, k:k + 1])     # (N, 1)
    cx, cy, cz, r = col(COL_CX), col(COL_CY), col(COL_CZ), col(COL_RADIUS)
    active = sm_hi[:, COL_ACTIVE:COL_ACTIVE + 1] > 0.5

    a = dd.maximum(dd.d3_length_sq(d), dd.const(1e-12))          # (1, R)
    d_dot_o = dd.d3_dot(d, o)
    o2 = dd.d3_length_sq(o)

    c_dot_d = dd.add(dd.add(dd.mul(cx, d.x), dd.mul(cy, d.y)),
                     dd.mul(cz, d.z))                            # (N, R)
    c_dot_o = dd.add(dd.add(dd.mul(cx, o.x), dd.mul(cy, o.y)),
                     dd.mul(cz, o.z))
    c2r2 = dd.sub(
        dd.add(dd.add(dd.mul(cx, cx), dd.mul(cy, cy)), dd.mul(cz, cz)),
        dd.mul(r, r),
    )                                                            # (N, 1)
    h = dd.sub(c_dot_d, d_dot_o)
    c = dd.sub(dd.add(c2r2, o2), dd.mul(dd.const(2.0), c_dot_o))
    disc = dd.sub(dd.mul(h, h), dd.mul(a, c))
    disc_pos = dd.gt(disc, dd.const(0.0))
    sqrtd = dd.sqrt(dd.where(disc_pos, disc, dd.const(1.0)))
    tmin_a = dd.mul(dd.const(T_MIN), a)
    near_num = dd.sub(h, sqrtd)
    root_num = dd.where(dd.gt(near_num, tmin_a), near_num,
                        dd.add(h, sqrtd))
    valid = disc_pos & dd.gt(root_num, tmin_a) & active
    t_num_all = dd.where(valid, root_num, dd.const(T_MISS))
    t_num = dd.min_axis0(t_num_all)                              # (1, R)
    hit = dd.lt(t_num, dd.const(T_MISS))
    one_hot = (hit & dd.eq(t_num_all, t_num)).astype(jnp.float32)
    t = dd.div(t_num, a)
    return hit, t, one_hot


def gather_hit_df64(sm_hi, sm_lo, one_hot):
    """Winner-parameter fetch: scene^T @ one-hot, hi and lo separately
    (exact copies — one exact 1.0 per hit lane, pallas_kernel._gather_params
    contract). Returns (center D3, radius D, albedo D3, fuzz D, ior D,
    mat_f (1,R) f32)."""
    dn = (((0,), (0,)), ((), ()))
    f = lambda m: lax.dot_general(m, one_hot, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
    ph, plo = f(sm_hi), f(sm_lo)                                 # (16, R)
    g = lambda k: D(ph[k:k + 1, :], plo[k:k + 1, :])
    center = D3(g(COL_CX), g(COL_CY), g(COL_CZ))
    albedo = D3(g(COL_ALB_R), g(COL_ALB_G), g(COL_ALB_B))
    return (center, g(COL_RADIUS), albedo, g(COL_FUZZ), g(COL_IOR),
            ph[COL_MAT:COL_MAT + 1, :])


def _safe_radius_df64(r: D, eps: float = 1e-12) -> D:
    ok = jnp.abs(r.hi) > eps
    return dd.where(ok, r, dd.const(eps))


def _near_zero_df64(v: D3, eps: float = 1e-6) -> jnp.ndarray:
    """vec.near_zero on the hi parts (|lo| <= ulp(hi)/2 cannot cross the
    1e-6 threshold from a non-near-zero hi)."""
    return (
        (jnp.abs(v.x.hi) < eps) & (jnp.abs(v.y.hi) < eps)
        & (jnp.abs(v.z.hi) < eps)
    )


def _refract_df64(uv: D3, n: D3, etai_over_etat: D) -> D3:
    cos_theta = dd.minimum(dd.d3_dot(-uv, n), dd.const(1.0))
    r_out_perp = (uv + n.scale(cos_theta)).scale(etai_over_etat)
    m = dd.sub(dd.const(1.0), dd.d3_length_sq(r_out_perp))
    m_abs = D(jnp.abs(m.hi), jnp.where(m.hi < 0, -m.lo, m.lo))
    par_len = dd.sqrt(dd.maximum(m_abs, dd.const(1e-12)))
    return r_out_perp + n.scale(dd.neg(par_len))


def scatter_df64(d_in: D3, normal: D3, front_face, mat_f, albedo: D3,
                 fuzz: D, ior: D, unit_rand: D3, coin_u):
    """materials.scatter widened to df64 (material.h:38-89 semantics).
    Returns (direction D3, attenuation D3, scattered bool)."""
    one = dd.const(1.0)

    lam_dir = normal + unit_rand
    lam_dir = dd.d3_where(_near_zero_df64(lam_dir), normal, lam_dir)

    reflected = dd.d3_unit(dd.d3_reflect(d_in, normal))
    metal_dir = reflected + unit_rand.scale(fuzz)
    metal_ok = dd.gt(dd.d3_dot(metal_dir, normal), dd.const(0.0))

    ri = dd.where(front_face, dd.div(one, ior), ior)
    ud = dd.d3_unit(d_in)
    cos_theta = dd.minimum(dd.d3_dot(-ud, normal), one)
    sin2 = dd.sub(one, dd.mul(cos_theta, cos_theta))
    sin_theta = dd.sqrt(dd.maximum(sin2, dd.const(0.0)))
    cannot_refract = dd.gt(dd.mul(ri, sin_theta), one)
    r0 = dd.div(dd.sub(one, ri), dd.add(one, ri))
    r0 = dd.mul(r0, r0)
    om = dd.sub(one, cos_theta)
    om2 = dd.mul(om, om)
    om5 = dd.mul(dd.mul(om2, om2), om)
    refl_p = dd.add(r0, dd.mul(dd.sub(one, r0), om5))
    reflect_coin = dd.gt(refl_p, dd.of(coin_u))
    diel_dir = dd.d3_where(
        cannot_refract | reflect_coin,
        dd.d3_reflect(ud, normal),
        _refract_df64(ud, normal, ri),
    )

    mat_i = mat_f.astype(jnp.int32)
    is_lam = mat_i == LAMBERTIAN
    is_metal = mat_i == METAL
    is_diel = mat_i == DIELECTRIC
    direction = dd.d3_where(
        is_lam, lam_dir, dd.d3_where(is_metal, metal_dir, diel_dir)
    )
    sh = mat_f.shape
    ones3 = D3(*(D(jnp.ones(sh, jnp.float32), jnp.zeros(sh, jnp.float32))
                 for _ in range(3)))
    attenuation = dd.d3_where(is_diel, ones3, albedo)
    scattered = metal_ok | jnp.logical_not(is_metal)
    return direction, attenuation, scattered


_SKY_WHITE = (1.0, 1.0, 1.0)
_SKY_BLUE = (0.5, 0.7, 1.0)


def sky_color_df64(direction: D3) -> D3:
    ud = dd.d3_unit(direction)
    a = dd.mul(dd.const(0.5), dd.add(ud.y, dd.const(1.0)))
    one_minus = dd.sub(dd.const(1.0), a)
    mix = lambda w, b: dd.add(dd.mul(one_minus, dd.const(w)),
                              dd.mul(a, dd.const(b)))
    return D3(mix(_SKY_WHITE[0], _SKY_BLUE[0]),
              mix(_SKY_WHITE[1], _SKY_BLUE[1]),
              mix(_SKY_WHITE[2], _SKY_BLUE[2]))


def _d3_rows(shape, x=0.0, y=0.0, z=0.0):
    mk = lambda v: D(jnp.full(shape, v, jnp.float32),
                     jnp.zeros(shape, jnp.float32))
    return D3(mk(x), mk(y), mk(z))


def regen_trace_df64(sm_hi, sm_lo, cam_hi, cam_lo, pixel_ids, fi, fj,
                     *, samples: int, max_depth: int, seed: int):
    """The regeneration wavefront loop (pallas_kernel._regen_body) in
    df64: each lane owns one pixel and traces its samples back-to-back,
    regenerating on death. Uniform budgets, parity estimator (no Russian
    roulette), current-bounce sky. Returns the per-lane radiance SUM over
    samples as a D3 of (1, R) rows."""
    key = rtrng.key_from_seed(seed)
    cam = unpack_camera_df64(cam_hi, cam_lo)
    shape = pixel_ids.shape
    budget = jnp.full(shape, float(samples), jnp.float32)
    one_row = jnp.ones(shape, jnp.float32)
    zero_row = jnp.zeros(shape, jnp.float32)

    def to_u32(f):
        return f.astype(jnp.int32).astype(jnp.uint32)

    s0 = jnp.zeros(shape, jnp.float32)
    o0, d0 = primary_rays_df64(cam, fi, fj, pixel_ids, to_u32(s0), key)

    init = (
        jnp.int32(0), s0, jnp.zeros(shape, jnp.float32),
        o0, d0,
        _d3_rows(shape, 1.0, 1.0, 1.0),
        _d3_rows(shape),
    )
    max_waves = samples * max_depth

    def cond(carry):
        w, sample_f = carry[0], carry[1]
        return (w < max_waves) & (jnp.max(budget - sample_f) > 0.0)

    def body(carry):
        w, sample_f, bounce_f, o, d, atten, acc = carry
        active = sample_f < budget

        hit, t, one_hot = hit_world_df64(sm_hi, sm_lo, o, d)
        center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = (
            gather_hit_df64(sm_hi, sm_lo, one_hot)
        )

        t_safe = dd.where(hit, t, dd.const(1.0))
        p = o + d.scale(t_safe)
        inv_r = dd.div(dd.const(1.0), _safe_radius_df64(radius_h))
        outward = (p - center_h).scale(inv_r)
        front_face = dd.lt(dd.d3_dot(d, outward), dd.const(0.0))
        normal = dd.d3_where(front_face, outward, -outward)

        s_u = to_u32(sample_f)
        b_u = to_u32(bounce_f)
        ur = rtrng.random_unit_vector(key, pixel_ids, s_u, b_u,
                                      rtrng.DRAW_SCATTER, jnp.float32)
        unit_rand = dd.d3_of(ur)
        coin_u, _ = rtrng.uniform2(key, pixel_ids, s_u, b_u,
                                   rtrng.DRAW_COIN, jnp.float32)
        sc_dir, sc_att, sc_scattered = scatter_df64(
            d, normal, front_face, mat_f, albedo_h, fuzz_h, ior_h,
            unit_rand, coin_u,
        )

        survived = active & hit & sc_scattered
        at_cap = survived & (bounce_f >= (max_depth - 1))
        continues = survived & ~at_cap
        dies = active & ~continues

        sky = sky_color_df64(d)
        miss_now = active & ~hit
        zero3 = _d3_rows(shape)
        acc = acc + dd.d3_where(miss_now, atten.hadamard(sky), zero3)

        o = dd.d3_where(continues, p, o)
        d = dd.d3_where(continues, sc_dir, d)
        atten = dd.d3_where(continues, atten.hadamard(sc_att), atten)
        bounce_f = jnp.where(continues, bounce_f + 1.0, bounce_f)

        sample_next = sample_f + jnp.where(dies, one_row, zero_row)
        o_new, d_new = primary_rays_df64(
            cam, fi, fj, pixel_ids, to_u32(sample_next), key
        )
        regen = dies & (sample_next < budget)
        o = dd.d3_where(regen, o_new, o)
        d = dd.d3_where(regen, d_new, d)
        atten = dd.d3_where(regen, _d3_rows(shape, 1.0, 1.0, 1.0), atten)
        bounce_f = jnp.where(regen, zero_row, bounce_f)
        sample_f = jnp.where(dies, sample_next, sample_f)

        return w + 1, sample_f, bounce_f, o, d, atten, acc

    final = lax.while_loop(cond, body, init)
    return final[6]
