"""Pallas wavefront render kernel.

TPU-native replacement for the reference's ``render`` CUDA kernel
(``GlobalFloat…/camera.h:130-172``). One grid step owns a *tile of rays*
(the CUDA thread-block analog, ``main.cu:137-139``) and keeps every piece of
bounce-loop state resident in VMEM across all samples and bounces — no HBM
roundtrips inside the hot loop, which the per-bounce XLA fusion boundaries
of the jnp oracle cannot guarantee.

Data layout (chosen for the (8,128) VPU and the 128x128 MXU):
  * ray state: lane-major rows (1, R_T) — 128 rays fill one vreg, so the
    per-ray scatter/RNG math (the Threefry block cipher is ~100 int ops)
    runs at full lane occupancy;
  * scene: one packed SoA matrix (N, 16) resident in VMEM — sphere slots on
    sublanes, attributes on lanes (centers, radius, albedo, fuzz, ior, mat,
    active). This is the reference's own endpoint
    design (Tex-variant SoA + integer indices, SURVEY.md §2.4) without the
    pointer/texture machinery;
  * intersection: (N, R_T) tiles — spheres x rays — hot loop 3 of the
    reference (hittable.h:87) as one predicated vector expression, with the
    C.D and C.O contractions on the MXU;
  * hit-parameter fetch: scene^T @ one-hot(argmin) on the MXU — the TPU way
    to "chase the material pointer" (hittable.h:63).

The bounce loop is a ``lax.while_loop`` that exits as soon as every lane in
the tile is dead — the wavefront answer to the reference's per-thread early
``return`` (camera.h:117-124), which the SIMT machine pays for in warp
divergence (SURVEY.md §5 ncu notes) and we pay for only until the slowest
lane of a tile dies.

Randomness is the same Threefry stream as the jnp oracle (ops/rng.py), so
kernel-vs-oracle comparisons consume bit-identical random draws.

Scene "layout" axis (the reference's global/const/tex variants):
  vmem   — scene matrix (N, 16) sphere-major preloaded to VMEM by
           BlockSpec (constant-memory analog; default, the right call
           for scenes that fit VMEM).
  hbm    — scene resident off-chip; DMA'd whole into a VMEM scratch once
           per grid step (the global-memory variant's H2D-then-read
           role, main.cu:301-314).
  packed — the tex-variant analog (TexFloat…/main.cu:210-313: SoA
           arrays fetched per probe through a separate memory path): the
           scene lives in HBM as 128-lane SoA rows and every closest-hit
           walks it through the double-buffered DMA block pipeline of
           ops/pallas_stream.py — a genuinely distinct fetch path with
           its own measured cost, like the reference's tex object reads
           (which are likewise slower than resident global reads: 4568
           vs 2879 ms at its headline). Served by render_pallas_stream;
           this function rejects it (render_api routes the layout).
           A transposed attribute-major (16, N) VMEM mapping with rays
           on sublanes was tried first and is unimplementable at speed:
           (R, 1) ray columns tile-pad to (8, 128) vregs — 128x the
           storage of a lane-major row — and the blocks alone blow the
           16 MB scoped-VMEM cap (parity_tune4.jsonl packed errors).

Mosaic-specific constraints honored here (found the hard way):
  * no bool vectors through while-carries or selects-of-bool-constants
    (i8->i1 truncation is unsupported) — masks are carried as f32;
  * kernels may not capture traced constants — the RNG key is derived from
    the static seed inside the kernel.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import materials
from ..models.camera import Camera, CameraConfig, initialize
from ..models.scene import Scene
from . import rng as rtrng
from . import vec
from .intersect import T_MIN, T_MISS
from .tracer import _linear_to_gamma, _sky_color, primary_rays_from_ij
from .vec import Vec3

# Scene-matrix attribute columns (lane axis; padded to 16 for tiling).
# No derived columns: |C|^2 - r^2 is computed in-kernel (see _hit_select)
# so hit decisions are independent of host-side fusion.
COL_CX, COL_CY, COL_CZ = 0, 1, 2
COL_RADIUS = 3
COL_ALB_R, COL_ALB_G, COL_ALB_B = 4, 5, 6
COL_FUZZ, COL_IOR, COL_MAT, COL_ACTIVE = 7, 8, 9, 10
NUM_COLS = 16

# 512 rays/tile measured best on v5e (133ms vs 380ms at 128 for scene 1
# 320x192x10spp): big enough to amortize grid/loop overhead, small enough
# that the (N_spheres, R) VMEM working set and the while-loop tail (tile
# lives until its slowest ray dies) stay acceptable.
DEFAULT_RAY_TILE = 512


def pack_scene_matrix(scene: Scene, dtype=jnp.float32) -> jnp.ndarray:
    """Scene pytree -> (N, 16) attribute matrix (differentiable)."""
    p = scene.params
    n = scene.num_slots
    zeros = jnp.zeros((n,), dtype)
    cols = [
        p.center.x, p.center.y, p.center.z,
        p.radius,
        p.albedo.x, p.albedo.y, p.albedo.z,
        p.fuzz, p.ior,
        scene.mat_type.astype(dtype),
        scene.active.astype(dtype),
    ]
    cols += [zeros] * (NUM_COLS - len(cols))
    return jnp.stack([c.astype(dtype) for c in cols], axis=1)


def pack_camera(cam: Camera, dtype=jnp.float32) -> jnp.ndarray:
    """Derived camera -> (1, 24) scalar row for SMEM."""
    vals = [
        cam.pixel00_loc.x, cam.pixel00_loc.y, cam.pixel00_loc.z,
        cam.pixel_delta_u.x, cam.pixel_delta_u.y, cam.pixel_delta_u.z,
        cam.pixel_delta_v.x, cam.pixel_delta_v.y, cam.pixel_delta_v.z,
        cam.center.x, cam.center.y, cam.center.z,
        cam.defocus_disk_u.x, cam.defocus_disk_u.y, cam.defocus_disk_u.z,
        cam.defocus_disk_v.x, cam.defocus_disk_v.y, cam.defocus_disk_v.z,
        cam.use_defocus.astype(dtype),
    ]
    row = jnp.stack([jnp.asarray(v, dtype) for v in vals])
    return jnp.pad(row, (0, 24 - row.shape[0]))[None, :]


def _unpack_camera(cam_ref) -> Camera:
    g = lambda k: cam_ref[0, k]
    v3 = lambda k: Vec3(g(k), g(k + 1), g(k + 2))
    return Camera(
        pixel00_loc=v3(0),
        pixel_delta_u=v3(3),
        pixel_delta_v=v3(6),
        center=v3(9),
        defocus_disk_u=v3(12),
        defocus_disk_v=v3(15),
        use_defocus=g(18) > 0.5,
    )


def _row_stack3(v: Vec3) -> jnp.ndarray:
    """Vec3 of (1, R) rows -> (3, R)."""
    return jnp.concatenate([v.x, v.y, v.z], axis=0)


def _hit_world_tile(scene_ref, o: Vec3, d: Vec3, mxu_dots: bool = False):
    """Closest hit for a lane-major (1, R) ray tile vs the (N, 16) scene.

    Same quadratic as intersect.hit_world (hittable.h:40-66): spheres on
    sublanes, rays on lanes; |C|^2 - r^2 computed in-kernel (_hit_select);
    root selection happens in the numerator domain ((h - sq) vs T_MIN * a)
    so only the winning root pays the inv_a multiply.

    ``mxu_dots=True`` computes the C.D / C.O contractions on the MXU at
    bf16x3 (lax.Precision.HIGH) — ~2^-22 relative error, which can flip
    hits only at silhouette tangencies (noise, not bias), in exchange for
    moving ~1/3 of the VPU work to the otherwise idle MXU. Off by default
    to preserve exact checksum parity with the jnp oracle.

    Returns (hit (1,R) bool, t (1,R), one_hot (N,R) f32).
    """
    cxc = scene_ref[:, COL_CX:COL_CX + 1]                    # (N, 1)
    cyc = scene_ref[:, COL_CY:COL_CY + 1]
    czc = scene_ref[:, COL_CZ:COL_CZ + 1]
    rc = scene_ref[:, COL_RADIUS:COL_RADIUS + 1]
    active = scene_ref[:, COL_ACTIVE:COL_ACTIVE + 1]

    a = jnp.maximum(vec.length_sq(d), 1e-12)                 # (1, R)
    d_dot_o = vec.dot(d, o)                                   # (1, R)
    o2 = vec.length_sq(o)                                     # (1, R)

    if mxu_dots:
        # Manual bf16x3 ("HIGH"-equivalent; Mosaic only lowers DEFAULT and
        # HIGHEST): split each operand into bf16 hi+lo and take 3 of the 4
        # cross terms (lo*lo is below f32 epsilon).
        centers = scene_ref[:, COL_CX:COL_CZ + 1]            # (N, 3)
        d_rows = _row_stack3(d)                               # (3, R)
        o_rows = _row_stack3(o)

        def split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def dot3(a_mat, b_mat):
            a_hi, a_lo = split(a_mat)
            b_hi, b_lo = split(b_mat)
            dn = (((1,), (0,)), ((), ()))
            f = functools.partial(
                lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            return f(a_hi, b_hi) + (f(a_hi, b_lo) + f(a_lo, b_hi))

        c_dot_d = dot3(centers, d_rows)
        c_dot_o = dot3(centers, o_rows)
    else:
        c_dot_d = cxc * d.x + cyc * d.y + czc * d.z           # (N, R)
        c_dot_o = cxc * o.x + cyc * o.y + czc * o.z           # (N, R)

    return _hit_select(cxc, cyc, czc, rc, active, a, d_dot_o, o2,
                       c_dot_d, c_dot_o)


def _hit_select(cxc, cyc, czc, rc, active, a, d_dot_o, o2, c_dot_d,
                c_dot_o):
    """Root selection half of the hit test, shared with the backward
    kernel (which passes the scene columns as separate vjp arguments)."""
    # |C|^2 - r^2 computed IN-KERNEL from the raw columns (association
    # matches intersect.hit_world exactly). Deliberately not precomputed on
    # the host: XLA's fusion (FMA grouping) of host-side packing varies
    # between programs (jit vs eager, phase A vs phase B), and ulp-level
    # differences there flip knife-edge hit decisions — whole-sample pixel
    # changes. In-kernel, Mosaic lowers this expression identically in
    # every program, so hit decisions are bit-stable across programs.
    c2r2 = cxc * cxc + cyc * cyc + czc * czc - rc * rc        # (N, 1)

    h = c_dot_d - d_dot_o                                     # (N, R)
    c = (c2r2 + o2) - 2.0 * c_dot_o                           # (N, R)

    disc = h * h - a * c
    disc_pos = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(disc_pos, disc, 1.0))
    # numerator-domain root select: near/far compare against T_MIN * a
    # (a > 0), deferring the inv_a multiply to the selected root only
    tmin_a = T_MIN * a                                        # (1, R)
    near_num = h - sqrtd
    root_num = jnp.where(near_num > tmin_a, near_num, h + sqrtd)
    valid = disc_pos & (root_num > tmin_a) & (active > 0.5)

    # min in the NUMERATOR domain: only the winning root pays the inv_a
    # multiply (a > 0 and float mul by a positive scalar is monotone, so
    # the winner — and its t value — is bitwise the per-sphere-multiply
    # answer; measured −1.6% at the headline, parity_tune3.jsonl). The
    # oracle (intersect.hit_world) mirrors this association exactly.
    t_num_all = jnp.where(valid, root_num, T_MISS)            # (N, R)
    t_num = jnp.min(t_num_all, axis=0, keepdims=True)         # (1, R)
    hit = t_num < T_MISS
    t = t_num * (1.0 / a)                                     # (1, R)
    # winner select by equality against the min — one comparison pass
    # instead of a second (argmin) sublane reduction. Miss lanes match
    # every invalid slot; their gathered params are garbage-but-finite and
    # fully masked downstream by `hit`. Exact-t ties between two real
    # spheres (bit-identical roots of distinct geometry) would blend their
    # params; measure-zero and absent from the reference scenes.
    one_hot = (hit & (t_num_all == t_num)).astype(t_num.dtype)  # (N, R)
    return hit, t, one_hot


def _gather_params(scene_mat, one_hot: jnp.ndarray) -> jnp.ndarray:
    """Hit-parameter fetch: scene^T (16,N) @ one-hot (N,R) on the MXU.
    HIGHEST precision: the one-hot has a single exact 1.0 per hit lane,
    so the gathered values are exact copies of the winner's columns —
    the bitwise-replay invariant the backward's winner replay relies on
    (ops/pallas_backward._hit_winner shares this helper)."""
    return lax.dot_general(
        scene_mat[:, :], one_hot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )                                                          # (16, R)


def _gather_hit(scene_ref, one_hot: jnp.ndarray):
    params = _gather_params(scene_ref, one_hot)
    row = lambda k: params[k:k + 1, :]
    return (
        Vec3(row(COL_CX), row(COL_CY), row(COL_CZ)),           # center
        row(COL_RADIUS),
        Vec3(row(COL_ALB_R), row(COL_ALB_G), row(COL_ALB_B)),
        row(COL_FUZZ),
        row(COL_IOR),
        row(COL_MAT),
    )


def _render_tile_kernel(
    ids_ref, ii_ref, jj_ref, scene_ref, cam_ref, out_r_ref, out_g_ref,
    out_b_ref,
    *, samples: int, max_depth: int,
    seed: int, dtype, legacy_sky: bool,
):
    # Key materialized from the static seed inside the kernel (pallas
    # kernels cannot capture traced constants).
    key = rtrng.key_from_seed(seed)
    cam = _unpack_camera(cam_ref)
    pixel_ids = ids_ref[0, :, :]                              # (1, R) uint32
    fi = ii_ref[0, :, :]                                       # (1, R) f32
    fj = jj_ref[0, :, :]
    shape = pixel_ids.shape

    def trace_one_sample(s: jnp.ndarray) -> Vec3:
        origin, direction = primary_rays_from_ij(
            cam, fi, fj, pixel_ids, s, key, dtype
        )
        primary_dir = direction

        # Masks carried as f32 (Mosaic can't round-trip i1 vectors through
        # while carries); booleans stay transient cmp results in the body.
        def cond(carry):
            b, _, _, _, _, alive_f = carry
            return (b < max_depth) & (jnp.max(alive_f) > 0.5)

        def body(carry):
            b, o, d, atten, rad, alive_f = carry
            alive = alive_f > 0.5
            hit, t, one_hot = _hit_world_tile(scene_ref, o, d)
            center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = (
                _gather_hit(scene_ref, one_hot)
            )
            mat_h = mat_f.astype(jnp.int32)

            t_safe = jnp.where(hit, t, 1.0)
            p = o + d * t_safe
            outward = (p - center_h) / vec.safe_radius(radius_h)
            front_face = vec.dot(d, outward) < 0.0
            normal = vec.where(front_face, outward, -outward)

            b_u = b.astype(jnp.uint32)
            unit_rand = rtrng.random_unit_vector(
                key, pixel_ids, s, b_u, rtrng.DRAW_SCATTER, dtype
            )
            coin_u, _ = rtrng.uniform2(
                key, pixel_ids, s, b_u, rtrng.DRAW_COIN, dtype
            )
            sc = materials.scatter(
                d, normal, front_face, mat_h,
                albedo_h, fuzz_h, ior_h, unit_rand, coin_u,
            )

            sky_dir = primary_dir if legacy_sky else d
            sky = _sky_color(sky_dir, dtype)
            miss_now = alive & ~hit
            zero = Vec3.zeros(shape, dtype=dtype)
            rad = rad + vec.where(miss_now, atten * sky, zero)

            scattered_alive = alive & hit & sc.scattered
            atten = vec.where(scattered_alive, atten * sc.attenuation, atten)
            o = vec.where(scattered_alive, p, o)
            d = vec.where(scattered_alive, sc.direction, d)
            alive_next = jnp.where(
                scattered_alive,
                jnp.ones(shape, dtype),
                jnp.zeros(shape, dtype),
            )
            return b + 1, o, d, atten, rad, alive_next

        init = (
            jnp.int32(0), origin, direction,
            Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
            Vec3.zeros(shape, dtype=dtype),
            jnp.ones(shape, dtype),
        )
        _, _, _, _, rad, _ = lax.while_loop(cond, body, init)
        return rad

    def sample_body(s, acc):
        rad = trace_one_sample(s.astype(jnp.uint32))
        return acc + rad

    acc = lax.fori_loop(
        0, samples, sample_body, Vec3.zeros(shape, dtype=dtype)
    )
    out_r_ref[0, :, :] = acc.x
    out_g_ref[0, :, :] = acc.y
    out_b_ref[0, :, :] = acc.z




# ---------------------------------------------------------------------------
# Kernel v2: in-kernel ray compaction ("wavefront inside the tile").
#
# Motivation (measured): the v1 tile pays the full (N_spheres x R) hit test
# every wave until its SLOWEST ray dies (~15 effective waves at 25 max
# bounces), while the mean ray dies after ~2-3. An XLA-level compaction pass
# (ops/wavefront.py, removed after measuring — see git history) loses:
# per-wave scatter/gather through HBM costs more than it saves. The TPU-native answer lives inside the kernel, where the
# ray pool is a (16, R) VMEM value:
#   * after each wave, live rays are packed to the lane prefix with a
#     one-hot permutation matmul (MXU, precision=HIGHEST -> exact for
#     one-hot weights);
#   * each wave only processes 128-lane blocks that intersect the live
#     prefix — dead blocks are skipped by a scalar lax.cond;
#   * banked radiance rides in the pool rows and is un-permuted once per
#     sample by a second one-hot matmul keyed on the original lane id.
# Ray identity (pixel id) travels as an f32 row — exact for ids < 2^24
# (images up to 16M pixels; asserted by the caller).
# ---------------------------------------------------------------------------

_ROW_PIX = 0        # pixel id (f32-exact)
_ROW_LANE = 1       # original lane id (for the final radiance unscatter)
_ROW_O = 2          # 2,3,4: origin
_ROW_D = 5          # 5,6,7: direction
_ROW_A = 8          # 8,9,10: attenuation
_ROW_RAD = 11       # 11,12,13: banked radiance
_ROW_ALIVE = 14
_STATE_ROWS = 16
_BLK = 128          # lane-block granularity for dead-block skipping


def _lane_prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the lane axis of a (1, R) row via
    log2(R) masked rolls (jnp.cumsum does not lower in Mosaic)."""
    r = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < r:
        shifted = pltpu.roll(x, k, axis=1)
        x = x + jnp.where(lane >= k, shifted, 0.0)
        k *= 2
    return x


def _rows3(st: jnp.ndarray, row: int) -> Vec3:
    return Vec3(st[row:row + 1, :], st[row + 1:row + 2, :],
                st[row + 2:row + 3, :])


def _bounce_rows(scene_ref, key, s, b_u, dtype, legacy_sky,
                 pix_f, o, d, atten, rad, alive_f):
    """One bounce for a lane-major row batch; returns updated rows.
    Shared math with the v1 kernel body (camera.h:78-128 semantics)."""
    alive = alive_f > 0.5
    # Mosaic has no f32<->u32 casts; go through i32 (ids < 2^24, sign-safe)
    pix_u = pltpu.bitcast(pix_f.astype(jnp.int32), jnp.uint32)
    hit, t, one_hot = _hit_world_tile(scene_ref, o, d)
    center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = (
        _gather_hit(scene_ref, one_hot)
    )
    mat_h = mat_f.astype(jnp.int32)

    t_safe = jnp.where(hit, t, 1.0)
    p = o + d * t_safe
    outward = (p - center_h) / vec.safe_radius(radius_h)
    front_face = vec.dot(d, outward) < 0.0
    normal = vec.where(front_face, outward, -outward)

    unit_rand = rtrng.random_unit_vector(
        key, pix_u, s, b_u, rtrng.DRAW_SCATTER, dtype
    )
    coin_u, _ = rtrng.uniform2(key, pix_u, s, b_u, rtrng.DRAW_COIN, dtype)
    sc = materials.scatter(
        d, normal, front_face, mat_h, albedo_h, fuzz_h, ior_h,
        unit_rand, coin_u,
    )

    sky = _sky_color(d, dtype)   # current-bounce semantics (no legacy here)
    miss_now = alive & ~hit
    zero = Vec3.zeros(pix_f.shape, dtype=dtype)
    rad = rad + vec.where(miss_now, atten * sky, zero)

    scattered_alive = alive & hit & sc.scattered
    atten = vec.where(scattered_alive, atten * sc.attenuation, atten)
    o = vec.where(scattered_alive, p, o)
    d = vec.where(scattered_alive, sc.direction, d)
    alive_f = jnp.where(scattered_alive, 1.0, 0.0).astype(dtype)
    return o, d, atten, rad, alive_f


def _pack_state(pix_f, lane_f, o, d, atten, rad, alive_f, dtype):
    rows = [pix_f, lane_f, o.x, o.y, o.z, d.x, d.y, d.z,
            atten.x, atten.y, atten.z, rad.x, rad.y, rad.z, alive_f,
            jnp.zeros_like(alive_f)]
    return jnp.concatenate(rows, axis=0)              # (16, R)


def _permute_lanes(mat: jnp.ndarray, dest: jnp.ndarray) -> jnp.ndarray:
    """mat (K, R) -> mat' with mat'[:, dest[src]] = mat[:, src].

    dest must be a permutation of 0..R-1 (as f32 ints). Implemented as a
    one-hot matmul on the MXU; precision=HIGHEST makes it exact (one-hot
    weights select single f32 values)."""
    r = mat.shape[1]
    dst_iota = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    mt = (dst_iota == dest.astype(jnp.int32)).astype(mat.dtype)  # [dst, src]
    return lax.dot_general(
        mat, mt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _render_tile_kernel_compact(
    ids_ref, ii_ref, jj_ref, scene_ref, cam_ref, out_r_ref, out_g_ref,
    out_b_ref, st_ref, alive_ref,
    *, samples: int, max_depth: int, seed: int, dtype, ray_tile: int,
):
    """Compacting kernel body. State lives in the (16, R) VMEM scratch
    ``st_ref``; the live count in SMEM ``alive_ref``. Each wave:

      * a dynamic-bound fori_loop touches only ceil(n_alive/128) lane
        blocks (pl.ds dynamic slices; pl.when skips fully dead waves) —
        real predication, unlike lax.cond which lowers to execute-both;
      * the one-hot permutation matmul packs live rays to the lane prefix.
    """
    key = rtrng.key_from_seed(seed)
    cam = _unpack_camera(cam_ref)
    pixel_ids = ids_ref[0, :, :]                      # (1, R) uint32
    fi = ii_ref[0, :, :]
    fj = jj_ref[0, :, :]
    shape = pixel_ids.shape
    r = ray_tile
    lane_f = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
    pix_f = pltpu.bitcast(pixel_ids, jnp.int32).astype(dtype)

    def sample_body(s_i, acc):
        s = s_i.astype(jnp.uint32)
        o, d = primary_rays_from_ij(cam, fi, fj, pixel_ids, s, key, dtype)
        st_ref[:, :] = _pack_state(
            pix_f, lane_f, o, d,
            Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
            Vec3.zeros(shape, dtype=dtype),
            jnp.ones(shape, dtype), dtype,
        )
        alive_ref[0] = jnp.int32(r)

        def wave(b, carry):
            @pl.when(alive_ref[0] > 0)
            def _():
                b_u = b.astype(jnp.uint32)
                n_alive = alive_ref[0]
                n_blocks = pl.cdiv(n_alive, _BLK)

                def blk_body(i, c):
                    off = pl.multiple_of(i * _BLK, _BLK)
                    blk = st_ref[:, pl.ds(off, _BLK)]   # (16, BLK)
                    o = _rows3(blk, _ROW_O)
                    d = _rows3(blk, _ROW_D)
                    at = _rows3(blk, _ROW_A)
                    rd = _rows3(blk, _ROW_RAD)
                    pf = blk[_ROW_PIX:_ROW_PIX + 1, :]
                    av = blk[_ROW_ALIVE:_ROW_ALIVE + 1, :]
                    o, d, at, rd, av = _bounce_rows(
                        scene_ref, key, s, b_u, dtype, False,
                        pf, o, d, at, rd, av,
                    )
                    st_ref[:, pl.ds(off, _BLK)] = _pack_state(
                        pf, blk[_ROW_LANE:_ROW_LANE + 1, :],
                        o, d, at, rd, av, dtype,
                    )
                    return c

                lax.fori_loop(0, n_blocks, blk_body, 0)

                # pack live rays to the lane prefix
                st = st_ref[:, :]
                alive_row = st[_ROW_ALIVE:_ROW_ALIVE + 1, :]
                n_new = jnp.sum(alive_row).astype(jnp.int32)
                cs_alive = _lane_prefix_sum(alive_row)
                cs_dead = _lane_prefix_sum(1.0 - alive_row)
                dest = jnp.where(
                    alive_row > 0.5,
                    cs_alive - 1.0,
                    n_new.astype(dtype) + cs_dead - 1.0,
                )
                st_ref[:, :] = _permute_lanes(st, dest)
                alive_ref[0] = n_new
            return carry

        lax.fori_loop(0, max_depth, wave, 0)

        st = st_ref[:, :]
        rad_rows = st[_ROW_RAD:_ROW_RAD + 3, :]
        orig = st[_ROW_LANE:_ROW_LANE + 1, :]
        return acc + _permute_lanes(rad_rows, orig)

    acc = lax.fori_loop(
        0, samples, sample_body, jnp.zeros((3, r), dtype)
    )
    out_r_ref[0, :, :] = acc[0:1, :]
    out_g_ref[0, :, :] = acc[1:2, :]
    out_b_ref[0, :, :] = acc[2:3, :]




# ---------------------------------------------------------------------------
# Kernel v4: ray regeneration ("lane owns a pixel").
#
# Depth-scaling measurements killed both earlier designs: render time is
# LINEAR in max_depth (~600ms/wave at 1280x768x100spp) because in this
# scene every 512-lane tile keeps at least one ray alive (dielectric
# interior paths) to the full depth — the tile-level early exit never
# fires — while each wave already runs the VPU near peak, so compaction's
# fixed costs (permutes, counters) cancel its savings.
#
# Regeneration sidesteps the survival distribution entirely: every lane
# owns ONE pixel and traces that pixel's samples back-to-back — the moment
# its ray dies (miss / absorb / depth cap) the lane banks radiance and
# immediately restarts with the pixel's next Monte-Carlo sample. Lanes do
# useful work every wave until their whole sample budget is spent; total
# waves drop from samples x max_depth to ~samples x E[path length] (+ a
# small tile tail). The counter-based RNG keys (pixel, sample, bounce) per
# lane, so the streams remain bit-identical to the oracle's.
# ---------------------------------------------------------------------------


def _render_tile_kernel_regen(
    ids_ref, ii_ref, jj_ref, budget_ref, scene_in_ref, cam_ref, out_r_ref,
    out_g_ref, out_b_ref,
    *, samples: int, max_depth: int, seed: int, dtype, legacy_sky: bool,
    mxu_dots: bool = False, emit_depth: bool = False, rr_start=None,
    hbm_scene: bool = False, sample_offset: int = 0, k_pixels: int = 1,
    finalize_scale=None,
):
    def run_body(scene_ref):
        if k_pixels > 1:
            _regen_body_multi(
                ids_ref, ii_ref, jj_ref, budget_ref, scene_ref, cam_ref,
                out_r_ref, out_g_ref, out_b_ref,
                samples=samples, max_depth=max_depth, seed=seed,
                dtype=dtype, mxu_dots=mxu_dots, rr_start=rr_start,
                sample_offset=sample_offset, k_pixels=k_pixels,
                finalize_scale=finalize_scale,
            )
        else:
            _regen_body(
                ids_ref, ii_ref, jj_ref, budget_ref, scene_ref, cam_ref,
                out_r_ref, out_g_ref, out_b_ref,
                samples=samples, max_depth=max_depth, seed=seed,
                dtype=dtype, legacy_sky=legacy_sky, mxu_dots=mxu_dots,
                emit_depth=emit_depth, rr_start=rr_start,
                sample_offset=sample_offset,
                finalize_scale=finalize_scale,
            )

    if hbm_scene:
        # "global memory" layout (SURVEY.md §2.1): the scene lives off-chip;
        # DMA it into a VMEM scratch once per grid step (the H2D-transfer
        # analog of main.cu:301-314, but HBM->VMEM per tile).
        def _with_scene(scene_vmem, sem):
            dma = pltpu.make_async_copy(scene_in_ref, scene_vmem, sem)
            dma.start()
            dma.wait()
            run_body(scene_vmem)

        pl.run_scoped(
            _with_scene,
            pltpu.VMEM(scene_in_ref.shape, dtype),
            pltpu.SemaphoreType.DMA,
        )
    else:
        run_body(scene_in_ref)


def _regen_body(
    ids_ref, ii_ref, jj_ref, budget_ref, scene_ref, cam_ref, out_r_ref,
    out_g_ref, out_b_ref,
    *, samples: int, max_depth: int, seed: int, dtype, legacy_sky: bool,
    mxu_dots: bool, emit_depth: bool, rr_start, sample_offset: int,
    hit_fn=None, finalize_scale=None,
):
    key = rtrng.key_from_seed(seed)
    cam = _unpack_camera(cam_ref)
    pixel_ids = ids_ref[0, :, :]                      # (1, R) uint32
    fi = ii_ref[0, :, :]
    fj = jj_ref[0, :, :]
    # per-lane sample budget: the lane's EXCLUSIVE end sample id. Uniform
    # renders pass the constant row sample_offset + samples; adaptive
    # sampling (ops/adaptive.py) passes per-pixel budgets so noisy pixels
    # trace more Monte-Carlo samples than converged ones.
    budget = budget_ref[0, :, :]                      # (1, R) f32
    shape = pixel_ids.shape
    zero3 = Vec3.zeros(shape, dtype=dtype)
    one_row = jnp.ones(shape, dtype)
    zero_row = jnp.zeros(shape, dtype)

    def to_u32(f):
        return pltpu.bitcast(f.astype(jnp.int32), jnp.uint32)

    s0 = jnp.full(shape, float(sample_offset), dtype)
    o0, d0 = primary_rays_from_ij(cam, fi, fj, pixel_ids, to_u32(s0), key,
                                  dtype)

    # carry: wave, sample_f, bounce_f, o, d, atten, acc, primary_d
    init = (
        jnp.int32(0), s0, jnp.zeros(shape, dtype),
        o0, d0,
        Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
        zero3,
        d0,
    )
    max_waves = samples * max_depth

    def cond(carry):
        w, sample_f = carry[0], carry[1]
        return (w < max_waves) & (jnp.max(budget - sample_f) > 0.0)

    def body(carry):
        w, sample_f, bounce_f, o, d, atten, acc, prim_d = carry
        active = sample_f < budget

        if hit_fn is not None:
            # pluggable closest-hit (streaming-HBM block loop)
            hit, t, center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = (
                hit_fn(o, d)
            )
        else:
            hit, t, one_hot = _hit_world_tile(scene_ref, o, d, mxu_dots)
            center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = (
                _gather_hit(scene_ref, one_hot)
            )
        mat_h = mat_f.astype(jnp.int32)

        t_safe = jnp.where(hit, t, 1.0)
        p = o + d * t_safe
        outward = (p - center_h) / vec.safe_radius(radius_h)
        front_face = vec.dot(d, outward) < 0.0
        normal = vec.where(front_face, outward, -outward)

        s_u = to_u32(sample_f)
        b_u = to_u32(bounce_f)
        unit_rand = rtrng.random_unit_vector(
            key, pixel_ids, s_u, b_u, rtrng.DRAW_SCATTER, dtype
        )
        coin_u, _ = rtrng.uniform2(
            key, pixel_ids, s_u, b_u, rtrng.DRAW_COIN, dtype
        )
        sc = materials.scatter(
            d, normal, front_face, mat_h, albedo_h, fuzz_h, ior_h,
            unit_rand, coin_u,
        )

        survived = active & hit & sc.scattered
        # scattering at the depth cap exits black (camera.h:126-127)
        at_cap = survived & (bounce_f >= (max_depth - 1))
        continues = survived & ~at_cap

        # optional Russian roulette (unbiased early termination; an
        # estimator CHANGE vs the reference — off by default)
        rr_scale = None
        if rr_start is not None:
            atten_next = atten * sc.attenuation
            p_surv = jnp.clip(
                jnp.maximum(jnp.maximum(atten_next.x, atten_next.y),
                            atten_next.z),
                0.05, 1.0,
            )
            u_rr, _ = rtrng.uniform2(
                key, pixel_ids, s_u, b_u, rtrng.DRAW_RR, dtype
            )
            rr_zone = bounce_f >= float(rr_start)
            rr_kill = continues & rr_zone & (u_rr >= p_surv)
            continues = continues & ~rr_kill
            rr_scale = jnp.where(rr_zone, 1.0 / p_surv, 1.0)

        dies = active & ~continues

        if emit_depth:
            # difficulty prepass: bank traced segments at death instead of
            # radiance (supports multi-sample probes with no extra carry)
            acc = Vec3(
                acc.x + jnp.where(dies, bounce_f + 1.0, zero_row),
                acc.y, acc.z,
            )
        else:
            sky = _sky_color(prim_d if legacy_sky else d, dtype)
            miss_now = active & ~hit
            acc = acc + vec.where(miss_now, atten * sky, zero3)

        # continuing rays advance one bounce
        o = vec.where(continues, p, o)
        d = vec.where(continues, sc.direction, d)
        atten_upd = atten * sc.attenuation
        if rr_scale is not None:
            atten_upd = atten_upd * rr_scale
        atten = vec.where(continues, atten_upd, atten)
        bounce_f = jnp.where(continues, bounce_f + 1.0, bounce_f)

        # dying lanes regenerate with the pixel's next sample
        sample_next = sample_f + jnp.where(dies, one_row, zero_row)
        o_new, d_new = primary_rays_from_ij(
            cam, fi, fj, pixel_ids, to_u32(sample_next), key, dtype
        )
        regen = dies & (sample_next < budget)
        o = vec.where(regen, o_new, o)
        d = vec.where(regen, d_new, d)
        atten = vec.where(regen, Vec3(one_row, one_row, one_row), atten)
        bounce_f = jnp.where(regen, zero_row, bounce_f)
        prim_d = vec.where(regen, d_new, prim_d) if legacy_sky else prim_d
        sample_f = jnp.where(dies, sample_next, sample_f)

        return w + 1, sample_f, bounce_f, o, d, atten, acc, prim_d

    final = lax.while_loop(cond, body, init)
    acc = final[6]
    if emit_depth:
        out_r_ref[0, :, :] = acc.x
        # diagnostics: green channel carries the tile's wave count
        out_g_ref[0, :, :] = jnp.full(shape, final[0]).astype(dtype)
        out_b_ref[0, :, :] = jnp.zeros(shape, dtype)
    elif finalize_scale is not None:
        # fused finalize: 1/spp scale + gamma in the kernel epilogue —
        # the post-kernel XLA fusions the xprof shows as separate work
        # (elementwise, so bit-identical to the host-side chain)
        sc_f = jnp.asarray(finalize_scale, dtype)
        out_r_ref[0, :, :] = _linear_to_gamma(acc.x * sc_f)
        out_g_ref[0, :, :] = _linear_to_gamma(acc.y * sc_f)
        out_b_ref[0, :, :] = _linear_to_gamma(acc.z * sc_f)
    else:
        out_r_ref[0, :, :] = acc.x
        out_g_ref[0, :, :] = acc.y
        out_b_ref[0, :, :] = acc.z



def _regen_body_multi(
    ids_ref, ii_ref, jj_ref, budget_ref, scene_ref, cam_ref, out_r_ref,
    out_g_ref, out_b_ref,
    *, samples: int, max_depth: int, seed: int, dtype, mxu_dots: bool,
    rr_start, sample_offset: int, k_pixels: int, hit_fn=None,
    finalize_scale=None,
):
    """Regeneration kernel, K pixels per lane ("multi-pixel lanes").

    The K=1 regen kernel's wall clock is set by the slowest LANE of each
    tile: max over lanes of the pixel's total traced segments. Giving each
    lane K pixels (worked sequentially: when pixel k's sample budget is
    spent, the lane pulls its (k+1)-th pixel) averages that per-lane total
    over K draws — the max-statistic floor shrinks ~1/sqrt(K) — at the
    price of a few (1, R) row-selects per wave (negligible next to the
    (N, R) hit test). Same estimator, same per-pixel RNG streams, same
    images as K=1 (streams key on pixel id; assignment is bookkeeping).

    Differences vs _regen_body: current pixel id / fi / fj / budget ride
    the carry as rows (pixel id f32-exact, caller asserts < 2^24);
    radiance flushes into the (K, R) output block as each pixel
    completes. legacy_sky / emit_depth are K=1-only (caller enforces).
    """
    K = k_pixels
    key = rtrng.key_from_seed(seed)
    cam = _unpack_camera(cam_ref)
    ids_blk = ids_ref[0, :, :]                        # (K, R) uint32
    ii_blk = ii_ref[0, :, :]                          # (K, R)
    jj_blk = jj_ref[0, :, :]
    bud_blk = budget_ref[0, :, :]                     # (K, R) absolute end
    r = ids_blk.shape[1]
    shape = (1, r)
    zero3 = Vec3.zeros(shape, dtype=dtype)
    one_row = jnp.ones(shape, dtype)
    zero_row = jnp.zeros(shape, dtype)
    kf_done = float(K)

    def to_u32(f):
        return pltpu.bitcast(f.astype(jnp.int32), jnp.uint32)

    idsf_blk = pltpu.bitcast(ids_blk, jnp.int32).astype(dtype)  # (K, R)

    def row_of(blk, k_next):
        """Per-lane row gather: sum_k (k_next == k) * blk[k]."""
        out = jnp.zeros(shape, dtype)
        for k in range(K):
            out = out + jnp.where(k_next == float(k),
                                  blk[k:k + 1, :], zero_row)
        return out

    # output accumulators start at zero; rows flush per pixel completion
    zeros_kr = jnp.zeros((K, r), dtype)
    out_r_ref[0, :, :] = zeros_kr
    out_g_ref[0, :, :] = zeros_kr
    out_b_ref[0, :, :] = zeros_kr

    s_off = jnp.full(shape, float(sample_offset), dtype)
    pix_f0 = idsf_blk[0:1, :]
    fi0 = ii_blk[0:1, :]
    fj0 = jj_blk[0:1, :]
    bud0 = bud_blk[0:1, :]
    o0, d0 = primary_rays_from_ij(cam, fi0, fj0, to_u32(pix_f0),
                                  to_u32(s_off), key, dtype)

    max_waves = K * samples * max_depth

    def cond(carry):
        w, k_f = carry[0], carry[3]
        return (w < max_waves) & (jnp.min(k_f) < kf_done)

    def body(carry):
        (w, sample_f, bounce_f, k_f, pix_f, fi, fj, bud,
         o, d, atten, acc) = carry
        has_pixel = k_f < kf_done
        # a pixel may carry ZERO quota for this pass (adaptive refine:
        # converged pixels get no extra samples) — such lanes must not
        # trace; they complete immediately below (one wave per skipped
        # pixel)
        has_quota = sample_f < bud
        active = has_pixel & has_quota
        pixel_ids = to_u32(pix_f)

        if hit_fn is not None:
            hit, t, center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = (
                hit_fn(o, d)
            )
        else:
            hit, t, one_hot = _hit_world_tile(scene_ref, o, d, mxu_dots)
            center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = (
                _gather_hit(scene_ref, one_hot)
            )
        mat_h = mat_f.astype(jnp.int32)

        t_safe = jnp.where(hit, t, 1.0)
        p = o + d * t_safe
        outward = (p - center_h) / vec.safe_radius(radius_h)
        front_face = vec.dot(d, outward) < 0.0
        normal = vec.where(front_face, outward, -outward)

        s_u = to_u32(sample_f)
        b_u = to_u32(bounce_f)
        unit_rand = rtrng.random_unit_vector(
            key, pixel_ids, s_u, b_u, rtrng.DRAW_SCATTER, dtype
        )
        coin_u, _ = rtrng.uniform2(
            key, pixel_ids, s_u, b_u, rtrng.DRAW_COIN, dtype
        )
        sc = materials.scatter(
            d, normal, front_face, mat_h, albedo_h, fuzz_h, ior_h,
            unit_rand, coin_u,
        )

        survived = active & hit & sc.scattered
        at_cap = survived & (bounce_f >= (max_depth - 1))
        continues = survived & ~at_cap

        rr_scale = None
        if rr_start is not None:
            atten_next = atten * sc.attenuation
            p_surv = jnp.clip(
                jnp.maximum(jnp.maximum(atten_next.x, atten_next.y),
                            atten_next.z),
                0.05, 1.0,
            )
            u_rr, _ = rtrng.uniform2(
                key, pixel_ids, s_u, b_u, rtrng.DRAW_RR, dtype
            )
            rr_zone = bounce_f >= float(rr_start)
            rr_kill = continues & rr_zone & (u_rr >= p_surv)
            continues = continues & ~rr_kill
            rr_scale = jnp.where(rr_zone, 1.0 / p_surv, 1.0)

        dies = active & ~continues

        sky = _sky_color(d, dtype)
        miss_now = active & ~hit
        acc = acc + vec.where(miss_now, atten * sky, zero3)

        # continuing rays advance one bounce
        o = vec.where(continues, p, o)
        d = vec.where(continues, sc.direction, d)
        atten_upd = atten * sc.attenuation
        if rr_scale is not None:
            atten_upd = atten_upd * rr_scale
        atten = vec.where(continues, atten_upd, atten)
        bounce_f = jnp.where(continues, bounce_f + 1.0, bounce_f)

        # dying lanes: next sample of this pixel, or pull the next pixel
        sample_next = sample_f + jnp.where(dies, one_row, zero_row)
        complete = (dies & (sample_next >= bud)) | (has_pixel & ~has_quota)

        # flush completed pixels into their (K, R) output rows
        def mk_flush(val):
            return jnp.concatenate(
                [jnp.where(complete & (k_f == float(k)), val, zero_row)
                 for k in range(K)],
                axis=0,
            )

        out_r_ref[0, :, :] = out_r_ref[0, :, :] + mk_flush(acc.x)
        out_g_ref[0, :, :] = out_g_ref[0, :, :] + mk_flush(acc.y)
        out_b_ref[0, :, :] = out_b_ref[0, :, :] + mk_flush(acc.z)
        acc = vec.where(complete, zero3, acc)

        k_next = k_f + jnp.where(complete, one_row, zero_row)
        pull = complete & (k_next < kf_done)
        pix_f = jnp.where(pull, row_of(idsf_blk, k_next), pix_f)
        fi = jnp.where(pull, row_of(ii_blk, k_next), fi)
        fj = jnp.where(pull, row_of(jj_blk, k_next), fj)
        bud = jnp.where(pull, row_of(bud_blk, k_next), bud)
        k_f = k_next
        sample_f = jnp.where(dies & ~complete, sample_next, sample_f)
        sample_f = jnp.where(complete, s_off, sample_f)

        # regenerate: same pixel next sample, or new pixel first sample
        regen = (dies & ~complete) | pull
        o_new, d_new = primary_rays_from_ij(
            cam, fi, fj, to_u32(pix_f), to_u32(sample_f), key, dtype
        )
        o = vec.where(regen, o_new, o)
        d = vec.where(regen, d_new, d)
        atten = vec.where(regen, Vec3(one_row, one_row, one_row), atten)
        bounce_f = jnp.where(regen, zero_row, bounce_f)

        return (w + 1, sample_f, bounce_f, k_f, pix_f, fi, fj, bud,
                o, d, atten, acc)

    init = (
        jnp.int32(0), s_off, zero_row, zero_row, pix_f0, fi0, fj0, bud0,
        o0, d0, Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype), zero3,
    )
    final = lax.while_loop(cond, body, init)
    # max_waves-cap parity with K=1: lanes cut mid-pixel bank their
    # partial accumulation into the current pixel's row
    k_f_end = final[3]
    acc_end = final[11]

    def mk_tail(val):
        return jnp.concatenate(
            [jnp.where(k_f_end == float(k), val, jnp.zeros(shape, dtype))
             for k in range(K)],
            axis=0,
        )

    out_r_ref[0, :, :] = out_r_ref[0, :, :] + mk_tail(acc_end.x)
    out_g_ref[0, :, :] = out_g_ref[0, :, :] + mk_tail(acc_end.y)
    out_b_ref[0, :, :] = out_b_ref[0, :, :] + mk_tail(acc_end.z)

    if finalize_scale is not None:
        # fused finalize (see _regen_body): scale + gamma the completed
        # (K, R) accumulator blocks in-place
        sc_f = jnp.asarray(finalize_scale, dtype)
        out_r_ref[0, :, :] = _linear_to_gamma(out_r_ref[0, :, :] * sc_f)
        out_g_ref[0, :, :] = _linear_to_gamma(out_g_ref[0, :, :] * sc_f)
        out_b_ref[0, :, :] = _linear_to_gamma(out_b_ref[0, :, :] * sc_f)


def render_pallas(
    scene: Scene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    dtype=jnp.float32,
    layout: str = "vmem",
    legacy_sky: bool = False,
    gamma: bool = True,
    ray_tile: int = DEFAULT_RAY_TILE,
    pixel_sharding=None,
    mesh=None,
    interpret: bool = False,
    mode: str = "regen",
    mxu_dots: bool = False,
    pixel_order=None,
    return_depth: bool = False,
    rr_start=None,
    sample_offset: int = 0,
    sample_budgets=None,
    accumulate_only: bool = False,
    pixels_per_lane: int = 1,
) -> jnp.ndarray:
    """Render with the Pallas wavefront kernel. Same semantics and RNG
    streams as tracer.render (the jnp oracle); (H, W, 3) output.

    ``mode`` selects the wavefront strategy (all produce the same image):
      regen   — ray regeneration, each lane streams its pixel's samples
                back-to-back (fastest; default)
      compact — in-kernel live-ray packing + dead-block skipping
      simple  — v1: per-sample tile loop with whole-tile early exit

    ``pixel_order``: optional (padded,) uint32 permutation of pixel ids —
    lanes are assigned pixels in this order and the output is un-permuted
    at the end. Used for difficulty-sorted tiling (render_api): grouping
    pixels by measured path depth stops one hard (glass) pixel from
    pinning a whole tile at its depth. Passed as data from a *separate*
    prepass jit — the TPU AOT compile service rejects two Mosaic kernels
    in one program. Per-pixel results are unchanged (RNG streams key on
    pixel id, not lane position).

    ``sample_offset`` / ``sample_budgets`` / ``accumulate_only`` support
    incremental and adaptive rendering (regen mode): sample ids are global
    counters (ops/rng.py), so rendering samples [off, off+n_p) per pixel
    and summing raw accumulations is EXACTLY the single-pass render of the
    union (SURVEY.md §5 checkpoint/resume). ``sample_budgets`` is a
    (num_pixels,) int array of per-pixel counts for THIS pass (<= the
    static ``samples_per_pixel``, which bounds the wave loop);
    ``accumulate_only`` returns the raw radiance sum (no 1/spp, no gamma)
    so callers with non-uniform budgets normalize per pixel."""
    if jnp.dtype(dtype) != jnp.float32:
        raise NotImplementedError(
            "pallas kernel is f32; use impl='oracle' for float64/bfloat16"
        )
    if return_depth and mode != "regen":
        raise ValueError("return_depth requires mode='regen'")
    if (sample_offset or sample_budgets is not None) and mode != "regen":
        raise ValueError("sample offset/budgets require mode='regen'")
    kpl = pixels_per_lane
    if kpl > 1:
        if mode != "regen" or legacy_sky or return_depth:
            raise ValueError(
                "pixels_per_lane > 1 requires mode='regen' without "
                "legacy_sky/return_depth"
            )
    if mode == "compact" and (legacy_sky or
                              img_width * img_height >= (1 << 24)):
        # compact needs f32-exact pixel ids and has no legacy-sky rows
        mode = "simple"
    if layout == "packed":
        raise ValueError(
            "layout='packed' is served by the streamed-SoA kernel "
            "(ops/pallas_stream.render_pallas_stream) — use "
            "render_api.make_renderer, which routes it"
        )
    rtrng.validate_stream_ids(sample_offset + samples_per_pixel,
                              max_depth)
    rr_start = rtrng.validate_rr_start(rr_start)
    cam = initialize(cam_cfg, img_width, img_height)

    n_shards = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    (ids, ids2, ii2, jj2, bud2, use_sort, num_pixels,
     padded) = _lane_setup(
        img_width, img_height, ray_tile, kpl, n_shards, pixel_order,
        samples_per_pixel, sample_offset, sample_budgets, dtype,
    )

    scene_mat = pack_scene_matrix(scene, dtype)
    cam_row = pack_camera(cam, dtype)
    n_spheres = scene_mat.shape[0]

    # Fused finalize: uniform-budget gamma renders scale+gamma inside the
    # kernel epilogue (bit-identical elementwise chain; saves the
    # post-kernel XLA fusions). Adaptive/incremental callers normalize
    # per pixel on the host, so they keep raw accumulations.
    fuse_finalize = (
        mode == "regen" and gamma and not accumulate_only
        and not return_depth and sample_budgets is None
    )
    if mode == "regen":
        kernel = functools.partial(
            _render_tile_kernel_regen,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            dtype=dtype,
            legacy_sky=legacy_sky,
            mxu_dots=mxu_dots,
            emit_depth=return_depth,
            rr_start=rr_start,
            hbm_scene=(layout == "hbm"),
            sample_offset=sample_offset,
            k_pixels=kpl,
            finalize_scale=(
                1.0 / samples_per_pixel if fuse_finalize else None
            ),
        )
    elif mode == "compact":
        kernel = functools.partial(
            _render_tile_kernel_compact,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            dtype=dtype,
            ray_tile=ray_tile,
        )
    else:
        kernel = functools.partial(
            _render_tile_kernel,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            dtype=dtype,
            legacy_sky=legacy_sky,
        )

    scene_space = pltpu.VMEM if layout == "vmem" else pl.ANY
    flops_est = int(samples_per_pixel * max_depth * padded * n_spheres * 20)

    def run(ids_arr, ii_arr, jj_arr, bud_arr, scene_m, cam_r):
        tiles = ids_arr.shape[0]
        blk = (1, kpl, ray_tile)
        scene_blk = (n_spheres, NUM_COLS)
        row_spec = pl.BlockSpec(blk, lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        # budget row only exists in the regen kernel's signature
        regen = mode == "regen"
        ins = [row_spec, row_spec, row_spec]
        args = [ids_arr, ii_arr, jj_arr]
        if regen:
            ins.append(row_spec)
            args.append(bud_arr)
        ins += [
            pl.BlockSpec(scene_blk, lambda i: (0, 0),
                         memory_space=scene_space),
            pl.BlockSpec((1, 24), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args += [scene_m, cam_r]
        out = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=ins,
            out_specs=(row_spec, row_spec, row_spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((tiles,) + blk[1:], dtype)
                for _ in range(3)
            ),
            scratch_shapes=(
                [
                    pltpu.VMEM((_STATE_ROWS, ray_tile), dtype),
                    pltpu.SMEM((1,), jnp.int32),
                ]
                if mode == "compact"
                else []
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops_est, bytes_accessed=int(padded) * 4 * 16,
                transcendentals=int(
                    samples_per_pixel * max_depth * padded * 4
                ),
            ),
            interpret=interpret,
        )(*args)
        return out

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)
        run = shard_map(
            run, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes), P(axes), P(), P()),
            out_specs=(P(axes), P(axes), P(axes)),
            check_vma=False,
        )

    acc_r, acc_g, acc_b = run(ids2, ii2, jj2, bud2, scene_mat, cam_row)
    if return_depth:
        # (per-tile wave counts on green — diagnostics; segments on red)
        seg = acc_r.reshape(padded)
        return acc_g.reshape(padded), seg
    return _finalize_output(
        acc_r, acc_g, acc_b, ids, use_sort, num_pixels, padded,
        img_width, img_height, samples_per_pixel, gamma,
        accumulate_only, dtype, already_finalized=fuse_finalize,
    )


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _lane_setup(img_width, img_height, ray_tile, kpl, n_shards,
                pixel_order, samples_per_pixel, sample_offset,
                sample_budgets, dtype):
    """Shared lane->pixel plumbing for the regen-family wrappers
    (render_pallas and pallas_stream.render_pallas_stream): padding,
    optional pixel ordering, per-lane ABSOLUTE budget rows (exclusive
    end sample ids), and the (T, K, R) tile reshapes — trailing dims
    equal the block shape (Pallas TPU block divisibility rule).

    Returns (ids, ids2, ii2, jj2, bud2, use_sort, num_pixels, padded).
    The two wrappers MUST share this: the budget/ordering
    contract is what the adaptive sampler relies on, and a fix landing
    in only one path would silently diverge the other."""
    num_pixels = img_width * img_height
    padded = _round_up(num_pixels, kpl * ray_tile * n_shards)
    n_tiles = padded // (kpl * ray_tile)
    if kpl > 1 and padded >= (1 << 24):
        # multi-pixel lanes carry the current pixel id as f32
        raise ValueError("pixels_per_lane > 1 supports images < 16M pixels")

    if pixel_order is not None:
        if pixel_order.shape != (padded,):
            raise ValueError(
                f"pixel_order must have shape ({padded},), "
                f"got {pixel_order.shape}"
            )
        ids = jnp.asarray(pixel_order, jnp.uint32)
        use_sort = True
    else:
        ids = jnp.arange(padded, dtype=jnp.uint32)
        use_sort = False
    ii = (ids % jnp.uint32(img_width)).astype(dtype)
    jj = (ids // jnp.uint32(img_width)).astype(dtype)
    ids2 = ids.reshape(n_tiles, kpl, ray_tile)
    ii2 = ii.reshape(n_tiles, kpl, ray_tile)
    jj2 = jj.reshape(n_tiles, kpl, ray_tile)

    if sample_budgets is not None:
        nb = jnp.asarray(sample_budgets).astype(dtype).reshape(-1)
        if nb.shape != (num_pixels,):
            raise ValueError(
                f"sample_budgets must have shape ({num_pixels},)"
            )
        nb_pad = jnp.zeros((padded,), dtype).at[:num_pixels].set(nb)
        # lane i owns pixel ids[i] — budgets follow the pixel ordering
        budget_row = float(sample_offset) + nb_pad[ids.astype(jnp.int32)]
    else:
        budget_row = jnp.full(
            (padded,), float(sample_offset + samples_per_pixel), dtype
        )
    bud2 = budget_row.reshape(n_tiles, kpl, ray_tile)
    return ids, ids2, ii2, jj2, bud2, use_sort, num_pixels, padded


def _finalize_output(acc_r, acc_g, acc_b, ids, use_sort, num_pixels,
                     padded, img_width, img_height, samples_per_pixel,
                     gamma, accumulate_only, dtype,
                     already_finalized: bool = False):
    """Shared output tail: un-permute sorted lanes, then either return
    the raw radiance sum (accumulate_only — adaptive / incremental
    callers normalize by their own per-pixel counts) or the
    1/spp-scaled (optionally gamma'd) image. ``already_finalized``:
    the kernel epilogue applied scale+gamma in-kernel (fused finalize) —
    only the un-permute/reshape remains."""
    acc = jnp.stack(
        [acc_r.reshape(padded), acc_g.reshape(padded),
         acc_b.reshape(padded)],
        axis=-1,
    )
    if use_sort:
        # un-permute: lane i rendered pixel ids[i]
        acc = jnp.zeros_like(acc).at[ids.astype(jnp.int32)].set(acc)
    if already_finalized:
        return acc[:num_pixels].reshape(img_height, img_width, 3)
    if accumulate_only:
        return acc[:num_pixels].reshape(img_height, img_width, 3)
    scale = jnp.asarray(1.0 / samples_per_pixel, dtype)
    img = acc[:num_pixels] * scale
    if gamma:
        img = _linear_to_gamma(img)
    return img.reshape(img_height, img_width, 3)


def _bucket_order(seg: jnp.ndarray, max_seg: int) -> jnp.ndarray:
    """Pixel ordering grouped by integer difficulty bucket (stable
    counting sort via cumsums + one scatter — no lax.sort)."""
    n = seg.shape[0]
    seg_i = jnp.clip(seg.astype(jnp.int32), 0, max_seg)
    pos = jnp.zeros((n,), jnp.int32)
    offset = jnp.int32(0)
    for b in range(max_seg + 1):
        mask = seg_i == b
        within = jnp.cumsum(mask.astype(jnp.int32)) - 1
        pos = jnp.where(mask, offset + within, pos)
        offset = offset + jnp.sum(mask.astype(jnp.int32))
    return (
        jnp.zeros((n,), jnp.int32)
        .at[pos]
        .set(jnp.arange(n, dtype=jnp.int32))
        .astype(jnp.uint32)
    )


def make_diff_render(
    mat_type,
    active,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    gamma: bool = False,
    legacy_sky: bool = False,
    ray_tile: int = DEFAULT_RAY_TILE,
    bwd_ray_tile: Optional[int] = None,
    pixel_order=None,
    mesh=None,
    oracle_chunk_pixels: Optional[int] = None,
    oracle_pixel_sharding=None,
    interpret: bool = False,
    backward: str = "pallas",
    rr_start=None,
    bwd_sweep: Optional[str] = None,
    bwd_window: int = 0,
    bwd_pixels_per_lane: Optional[int] = None,
):
    """Differentiable renderer with the Pallas kernel as the forward pass.

    ``rr_start``: render AND differentiate the Russian-roulette estimator
    from that bounce (the backward replays the identical RR streams —
    ops/pallas_backward._winner_bounce). Unbiased like the forward rr;
    paths shorten, so fwd+bwd both speed up.

    ``bwd_ray_tile``: backward-kernel tile (None = render_pallas_grads'
    auto: 1024 when the FULL-PARK reverse fires — the measured winner
    at every shape once there is no parking window to squeeze,
    standalone_ab.jsonl round 5 (e2e step 5783 vs 6085 ms at the
    headline) — else 512, the WINDOWED sweep's knee: a smaller tile
    buys a deeper parking window under the same VMEM budget, rt512/w128
    312 ms vs rt1024/w32 365 at 640x384x16spp/d25, bwd_wave.jsonl).
    Lower it explicitly for sphere-heavy scenes where the forward
    sweep's (N, R) hit-scan working set presses the 16 MB VMEM limit.

    ``bwd_sweep`` / ``bwd_window`` / ``bwd_pixels_per_lane``: passed to
    render_pallas_grads as sweep / window / pixels_per_lane (None/0 =
    that function's autos) — the wave-sweep tuning knobs, exposed so the
    non-fused custom_vjp path accepts the same training options as the
    fused kernel (ops/grad.make_train_step routes them).

    ``pixel_order``: optional frozen difficulty permutation (see
    measure_difficulty/difficulty_order) applied to BOTH the forward
    render and the pallas backward — depth-grouped tiles retire/exit
    together (order changes only speed, not values, up to tile-sum
    reassociation). Ignored by the oracle backward.

    ``backward`` selects the VJP implementation:
      pallas — in-kernel winner-replay reverse sweep
               (ops/pallas_backward.py): per-bounce winner residuals in
               VMEM, gradient scatter via one-hot-by-slot-id MXU
               matmuls. Default (fastest). Falls back to oracle for
               legacy_sky (the backward kernel implements the frozen
               current-bounce sky semantics only).
      oracle — recompute-VJP through the jnp oracle (ops/tracer.py). Sound
               because both paths consume identical Threefry streams and
               identical math — the oracle's cotangents are the kernel's
               cotangents up to float reassociation (the detached-sampler
               convention, ops/grad.py).

    Returns f(params: SceneParams, cam_cfg) -> (H, W, 3) image.
    """
    from ..models.scene import SceneParams  # local import to avoid cycle
    from . import tracer as _tracer

    if backward == "pallas" and legacy_sky:
        backward = "oracle"

    def _scene(params):
        return Scene(params=params, mat_type=mat_type, active=active)

    if pixel_order is not None:
        # extend to the forward's exact padding (K=1 lanes here); the
        # backward re-extends to its own (larger-tile) padding itself
        from .pallas_backward import _order_ids

        n_sh = (
            int(np.prod(list(mesh.shape.values()))) if mesh is not None
            else 1
        )
        pixel_order = _order_ids(
            pixel_order, _round_up(img_width * img_height,
                                   ray_tile * n_sh)
        )

    # forward as its own jitted program (one Mosaic kernel per program —
    # the service limit; a jit(value_and_grad(...)) over f would fuse fwd
    # and bwd kernels into one program and fail to compile on TPU. Leave
    # the train loop unjitted at top level: it dispatches two compiled
    # programs + a tiny optimizer program.)
    _fwd_jit = jax.jit(
        lambda params, cam_cfg: render_pallas(
            _scene(params), cam_cfg, img_width, img_height,
            samples_per_pixel, max_depth, seed=seed, gamma=gamma,
            legacy_sky=legacy_sky, ray_tile=ray_tile,
            pixel_order=pixel_order, mesh=mesh, interpret=interpret,
            rr_start=rr_start,
        )
    )

    @jax.custom_vjp
    def f(params, cam_cfg):
        return _fwd_jit(params, cam_cfg)

    def fwd(params, cam_cfg):
        out = f(params, cam_cfg)
        return out, (params, cam_cfg, out)

    def _pallas_bwd_impl(params, cam_cfg, img, g):
        from .pallas_backward import chain_to_params, render_pallas_grads

        # chain the cotangent through the host-side postprocess:
        # img = gamma(acc / spp)  =>  d_acc = g * gamma'(lin) / spp
        if gamma:
            # d sqrt(x) = 0.5 / sqrt(x) = 0.5 / img; define 0 at img==0
            # (absorbed-black pixels; subgradient choice, finite)
            denom = jnp.where(img > 0, img, 1.0)
            g = jnp.where(img > 0, 0.5 * g / denom, 0.0)
        g_acc = g * (1.0 / samples_per_pixel)
        d_sm, d_cr = render_pallas_grads(
            _scene(params), cam_cfg, g_acc, img_width, img_height,
            samples_per_pixel, max_depth, seed=seed,
            ray_tile=bwd_ray_tile, pixel_order=pixel_order,
            mesh=mesh, interpret=interpret, rr_start=rr_start,
            sweep=bwd_sweep or "wave", window=bwd_window,
            pixels_per_lane=bwd_pixels_per_lane,
        )
        return chain_to_params(
            d_sm, d_cr, params, cam_cfg, mat_type, active,
            img_width, img_height,
        )

    # one jitted program for the whole backward (contains exactly ONE
    # Mosaic kernel — allowed by the compile service; the host chain ops
    # fuse into it instead of dispatching eagerly through the tunnel)
    _pallas_bwd_jit = jax.jit(_pallas_bwd_impl)

    def bwd(res, g):
        params, cam_cfg, img = res

        if backward == "pallas":
            return _pallas_bwd_jit(params, cam_cfg, img, g)

        def oracle(p, c):
            return _tracer.render(
                _scene(p), c, img_width, img_height, samples_per_pixel,
                max_depth, seed=seed, gamma=gamma, legacy_sky=legacy_sky,
                chunk_pixels=oracle_chunk_pixels,
                pixel_sharding=oracle_pixel_sharding, remat=True,
                rr_start=rr_start,
            )

        _, vjp = jax.vjp(oracle, params, cam_cfg)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def measure_difficulty(
    scene: Scene, cam_cfg: CameraConfig, img_width: int, img_height: int,
    probe_depth: int = 8, probe_samples: int = 4, *,
    seed: int = rtrng.DEFAULT_SEED,
    ray_tile: int = DEFAULT_RAY_TILE, mesh=None, interpret: bool = False,
) -> jnp.ndarray:
    """Shallow prepass: per-pixel traced-segment TOTAL over
    ``probe_samples`` samples at depth ``probe_depth`` (a 1-sample probe
    is far too noisy to identify long-mean-depth pixels: measured tile
    savings 12% vs ~3x with a 4-8 sample probe)."""
    _, seg = render_pallas(
        scene, cam_cfg, img_width, img_height, probe_samples, probe_depth,
        seed=seed, gamma=False, ray_tile=ray_tile, mesh=mesh,
        interpret=interpret, mode="regen", return_depth=True,
    )
    return seg


def difficulty_order(seg: jnp.ndarray, probe_depth: int = 8,
                     probe_samples: int = 4) -> jnp.ndarray:
    """Pixel ordering from a difficulty prepass (counting sort, no lax.sort)."""
    return _bucket_order(seg.reshape(-1), probe_depth * probe_samples)
