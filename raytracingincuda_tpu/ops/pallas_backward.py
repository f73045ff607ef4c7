"""Pallas backward (VJP) kernel for the wavefront tracer.

Replaces the oracle recompute-VJP (pallas_kernel.make_diff_render's default
backward) with an in-kernel reverse pass: the whole bounce chain of a ray
tile is re-traced forward with per-bounce state parked in VMEM, then walked
in reverse accumulating cotangents for the packed scene matrix (N, 16) and
the camera scalars. No HBM roundtrips between bounces — the same property
that makes the forward kernel fast applies to the backward sweep.

Design notes:
  * The bounce body is the SAME jnp math as the forward kernel
    (_hit_select / _gather_hit / materials.scatter), and its transpose is
    obtained with ``jax.vjp`` *inside* the kernel trace — Mosaic lowers
    the transposed ops like any other kernel code. No hand-derived adjoint
    to drift out of sync with the forward math.
  * Detached-sampler convention (ops/grad.py): RNG draws are integer
    Threefry streams (zero tangent by construction) and every discrete
    decision (hit winner one-hot, material select, Schlick coin, liveness)
    enters through comparisons/casts whose tangents JAX already treats as
    symbolically zero — the vjp graph contains exactly the continuous
    chain.
  * Gradient scatter into spheres is the transpose of the forward gather:
    forward fetches hit params with scene^T @ one_hot on the MXU, so the
    backward scatters with one_hot @ d_params^T — again an MXU matmul, not
    a serialized scatter (the TPU answer to atomicAdd-style gradient
    accumulation).
  * Mosaic cannot lower the transpose of LANE-dim slicing (pad/concat at
    unaligned lane offsets -> "offset mismatch on non-concat dimension").
    Every lane-sliced quantity therefore enters the vjp'd function as its
    OWN argument: the geometry columns cx/cy/cz/r are loaded from the
    scene ref and passed as four (N, 1) primals (their cotangents come
    back as independent (N, 1) leaves and leave the kernel as separate
    outputs, assembled on the host); the camera enters as 18 SMEM scalars
    whose cotangents are full-lane reductions (supported) written to an
    SMEM output row.
  * Per-bounce residuals are (o, d, atten, alive) = 10 rows of (1, R) f32,
    stored in a (max_depth*16, R) VMEM scratch — 25 bounces x 512 lanes =
    800 KB, far under VMEM; everything else is recomputed in the reverse
    sweep.
  * Scene/camera cotangents accumulate across grid steps into single
    output blocks (index_map -> (0, 0)), zero-initialized at program 0 —
    TPU grids execute sequentially so the read-modify-write is sound.

The reference has no backward pass at all (SURVEY.md: no training); this
is north-star capability. Gradients here match jax.grad through the jnp
oracle (ops/tracer.py) up to float reassociation — see
tests/test_pallas_grad.py.
"""
from __future__ import annotations

import functools

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
from .pallas_kernel import (
    COL_ACTIVE,
    COL_CX,
    COL_CY,
    COL_CZ,
    COL_RADIUS,
    NUM_COLS,
    _gather_hit,
    _hit_select,
    _round_up,
    pack_camera,
    pack_scene_matrix,
)
from .tracer import _sky_color, primary_rays_from_ij
from .vec import Vec3

# per-bounce residual rows in the VMEM state scratch (padded to a full
# 16-sublane block per bounce)
_R_O = 0      # 0,1,2: origin
_R_D = 3      # 3,4,5: direction
_R_A = 6      # 6,7,8: attenuation
_R_ALIVE = 9
_ST_ROWS = 16
_CAM_COLS = 24
_N_CAM = 18   # differentiable camera scalars (pack_camera rows 0..17)


def _camera_from_scalars(vals, use_defocus):
    """Camera pytree from 18 scalar values (pack_camera columns 0..17).
    The defocus flag is passed separately (non-differentiable bool)."""
    v3 = lambda k: Vec3(vals[k], vals[k + 1], vals[k + 2])
    return Camera(
        pixel00_loc=v3(0),
        pixel_delta_u=v3(3),
        pixel_delta_v=v3(6),
        center=v3(9),
        defocus_disk_u=v3(12),
        defocus_disk_v=v3(15),
        use_defocus=use_defocus,
    )


def _bounce_tile(scene_mat, cx, cy, cz, rc, active_col,
                 o: Vec3, d: Vec3, atten: Vec3, alive_f: jnp.ndarray,
                 pixel_ids, s_u, b_u, key, dtype):
    """One bounce of the (non-RR) estimator for a (1, R) lane row batch.

    Returns ((o', d', atten', alive_f'), contrib) where contrib is the
    radiance banked THIS bounce (miss lanes: atten * sky). Identical
    semantics to the forward kernels' bounce bodies (camera.h:78-128).
    ``scene_mat`` (N, 16) feeds only the gather matmul; the geometry
    columns are separate primals (see module docstring on Mosaic and
    lane-slice transposes).
    """
    shape = alive_f.shape
    alive = alive_f > 0.5

    a = jnp.maximum(vec.length_sq(d), 1e-12)                  # (1, R)
    d_dot_o = vec.dot(d, o)
    o2 = vec.length_sq(o)
    c_dot_d = cx * d.x + cy * d.y + cz * d.z                  # (N, R)
    c_dot_o = cx * o.x + cy * o.y + cz * o.z
    hit, t, one_hot = _hit_select(
        cx, cy, cz, rc, active_col, a, d_dot_o, o2, c_dot_d, c_dot_o
    )
    center_h, radius_h, albedo_h, fuzz_h, ior_h, mat_f = _gather_hit(
        scene_mat, one_hot
    )
    mat_h = mat_f.astype(jnp.int32)

    # NaN hygiene for the REVERSE pass: miss lanes gather the all-zero
    # one-hot (radius 0, ior 0), whose downstream math overflows to inf in
    # forward intermediates; the forward kernels mask those values out, but
    # reverse-mode chain terms multiply cotangents (0 on miss lanes) by
    # those primals — and 0 * inf = NaN poisons the whole tile. Clamp the
    # gathered params to finite neutral values on miss lanes; their
    # cotangents are identically zero, so live-lane gradients are
    # unchanged (same argument as the oracle's garbage-but-finite gather,
    # intersect.gather_hit_params).
    radius_h = jnp.where(hit, radius_h, 1.0)
    ior_h = jnp.where(hit, ior_h, 1.0)

    t_safe = jnp.where(hit, t, 1.0)
    p = o + d * t_safe
    outward = (p - center_h) / jnp.maximum(radius_h, 1e-12)
    front_face = vec.dot(d, outward) < 0.0
    normal = vec.where(front_face, outward, -outward)

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

    sky = _sky_color(d, dtype)
    miss_now = alive & ~hit
    zero = Vec3.zeros(shape, dtype=dtype)
    contrib = vec.where(miss_now, atten * sky, zero)

    scattered_alive = alive & hit & sc.scattered
    atten2 = vec.where(scattered_alive, atten * sc.attenuation, atten)
    o2_ = vec.where(scattered_alive, p, o)
    d2 = vec.where(scattered_alive, sc.direction, d)
    alive2 = jnp.where(scattered_alive, 1.0, 0.0).astype(dtype)
    return (o2_, d2, atten2, alive2), contrib


def _pack_residual(o: Vec3, d: Vec3, atten: Vec3, alive_f) -> jnp.ndarray:
    rows = [o.x, o.y, o.z, d.x, d.y, d.z, atten.x, atten.y, atten.z,
            alive_f]
    rows += [jnp.zeros_like(alive_f)] * (_ST_ROWS - len(rows))
    return jnp.concatenate(rows, axis=0)                     # (16, R)


def _unpack_residual(blk: jnp.ndarray):
    r3 = lambda k: Vec3(blk[k:k + 1, :], blk[k + 1:k + 2, :],
                        blk[k + 2:k + 3, :])
    return (r3(_R_O), r3(_R_D), r3(_R_A),
            blk[_R_ALIVE:_R_ALIVE + 1, :])


def _read_tile_refs(ids_ref, ii_ref, jj_ref, scene_ref, cam_ref):
    """Common tile-ref parsing shared by the grad and fused kernels."""
    pixel_ids = ids_ref[0, :, :]                              # (1, R) uint32
    fi = ii_ref[0, :, :]
    fj = jj_ref[0, :, :]
    scene_mat = scene_ref[:, :]
    cx = scene_ref[:, COL_CX:COL_CX + 1]                      # (N, 1)
    cy = scene_ref[:, COL_CY:COL_CY + 1]
    cz = scene_ref[:, COL_CZ:COL_CZ + 1]
    rc = scene_ref[:, COL_RADIUS:COL_RADIUS + 1]
    active_col = scene_ref[:, COL_ACTIVE:COL_ACTIVE + 1]
    cam_vals = tuple(cam_ref[0, k] for k in range(_N_CAM))
    use_defocus = cam_ref[0, 18] > 0.5
    return (pixel_ids, fi, fj, scene_mat, cx, cy, cz, rc, active_col,
            cam_vals, use_defocus)


def _tile_grad_sweep(scene_mat, cx, cy, cz, rc, active_col, cam_vals,
                     use_defocus, pixel_ids, fi, fj, g, key, st_ref,
                     *, samples: int, max_depth: int, dtype,
                     remat: bool = False):
    """Per-tile gradient accumulation for an upstream image cotangent ``g``
    (Vec3 of (1, R) rows, accumulated-radiance domain): per-sample forward
    sweep parking residuals in ``st_ref``, then the reverse vjp sweep.

    ``remat=True`` wraps the bounce body in ``jax.checkpoint`` before the
    vjp: the transpose then recomputes the (N, R) hit-test intermediates
    near their use instead of keeping ~20 of them live across the
    forward/transpose boundary. Interpret-mode only for now: real Mosaic
    cannot lower remat2 inside a kernel (docs/UPSTREAM_ISSUES.md #9,
    benchmarks/results/bwd_remat.jsonl), so on hardware ray_tile stays
    VMEM-bounded at 256."""
    shape = pixel_ids.shape
    n, cols = scene_mat.shape
    ncol_zeros = jnp.zeros((n, 1), dtype)

    def one_sample(s_i, carry):
        d_scene_acc, d_cx_acc, d_cy_acc, d_cz_acc, d_r_acc, d_cam_acc = carry
        s_u = s_i.astype(jnp.uint32)

        def primary(vals):
            cam = _camera_from_scalars(vals, use_defocus)
            return primary_rays_from_ij(
                cam, fi, fj, pixel_ids, s_u, key, dtype
            )

        (o0, d0), vjp_primary = jax.vjp(primary, cam_vals)

        # ---- forward sweep: run the bounce chain, parking each bounce's
        # input state in the VMEM scratch ------------------------------
        def fwd_body(b, st):
            o, d, atten, alive_f = st
            st_ref[pl.ds(pl.multiple_of(b * _ST_ROWS, _ST_ROWS),
                         _ST_ROWS), :] = _pack_residual(o, d, atten, alive_f)
            (o2, d2, at2, al2), _ = _bounce_tile(
                scene_mat, cx, cy, cz, rc, active_col,
                o, d, atten, alive_f, pixel_ids, s_u,
                b.astype(jnp.uint32), key, dtype,
            )
            return (o2, d2, at2, al2)

        init = (
            o0, d0,
            Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
            jnp.ones(shape, dtype),
        )
        lax.fori_loop(0, max_depth, fwd_body, init)

        # ---- reverse sweep: vjp of each bounce at its stored state ----
        def rev_body(i, carry):
            (d_scene, d_cx, d_cy, d_cz, d_r,
             ct_o, ct_d, ct_at, ct_al) = carry
            b = max_depth - 1 - i
            blk = st_ref[pl.ds(pl.multiple_of(b * _ST_ROWS, _ST_ROWS),
                               _ST_ROWS), :]
            o, d, atten, alive_f = _unpack_residual(blk)
            b_u = b.astype(jnp.uint32)

            def f(sm, cx_, cy_, cz_, rc_, o_, d_, at_, al_):
                return _bounce_tile(
                    sm, cx_, cy_, cz_, rc_, active_col,
                    o_, d_, at_, al_, pixel_ids, s_u, b_u, key, dtype
                )

            if remat:
                f = jax.checkpoint(f)
            _, vjp_f = jax.vjp(f, scene_mat, cx, cy, cz, rc,
                               o, d, atten, alive_f)
            d_sm, d_cx_b, d_cy_b, d_cz_b, d_r_b, d_o, d_d, d_at, d_al = (
                vjp_f(((ct_o, ct_d, ct_at, ct_al), g))
            )
            return (d_scene + d_sm, d_cx + d_cx_b, d_cy + d_cy_b,
                    d_cz + d_cz_b, d_r + d_r_b, d_o, d_d, d_at, d_al)

        ct0 = (
            jnp.zeros((n, cols), dtype),
            ncol_zeros, ncol_zeros, ncol_zeros, ncol_zeros,
            Vec3.zeros(shape, dtype=dtype),   # ct origin
            Vec3.zeros(shape, dtype=dtype),   # ct direction
            Vec3.zeros(shape, dtype=dtype),   # ct attenuation
            jnp.zeros(shape, dtype),          # ct alive
        )
        (d_scene, d_cx, d_cy, d_cz, d_r, ct_o, ct_d, _, _) = lax.fori_loop(
            0, max_depth, rev_body, ct0
        )

        # cotangents of the primary ray flow into the camera scalars
        (d_cam_vals,) = vjp_primary((ct_o, ct_d))
        d_cam_new = tuple(
            d_cam_acc[k] + d_cam_vals[k] for k in range(_N_CAM)
        )
        return (d_scene_acc + d_scene, d_cx_acc + d_cx, d_cy_acc + d_cy,
                d_cz_acc + d_cz, d_r_acc + d_r, d_cam_new)

    zero_cam = tuple(jnp.zeros((), dtype) for _ in range(_N_CAM))
    return lax.fori_loop(
        0, samples, one_sample,
        (jnp.zeros((n, cols), dtype),
         ncol_zeros, ncol_zeros, ncol_zeros, ncol_zeros, zero_cam),
    )


def _write_grad_outputs(dscene_ref, dcx_ref, dcy_ref, dcz_ref, dr_ref,
                        dcam_ref, d_scene, d_cx, d_cy, d_cz, d_r, d_cam,
                        dtype):
    """Accumulate tile cotangents into the shared output blocks
    (zero-initialized at program 0; TPU grids are sequential)."""
    n, cols = d_scene.shape
    ncol_zeros = jnp.zeros((n, 1), dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscene_ref[:, :] = jnp.zeros((n, cols), dtype)
        dcx_ref[:, :] = ncol_zeros
        dcy_ref[:, :] = ncol_zeros
        dcz_ref[:, :] = ncol_zeros
        dr_ref[:, :] = ncol_zeros
        for k in range(_CAM_COLS):
            dcam_ref[0, k] = 0.0

    dscene_ref[:, :] = dscene_ref[:, :] + d_scene
    dcx_ref[:, :] = dcx_ref[:, :] + d_cx
    dcy_ref[:, :] = dcy_ref[:, :] + d_cy
    dcz_ref[:, :] = dcz_ref[:, :] + d_cz
    dr_ref[:, :] = dr_ref[:, :] + d_r
    for k in range(_N_CAM):
        dcam_ref[0, k] = dcam_ref[0, k] + d_cam[k]


def _grad_tile_kernel(
    ids_ref, ii_ref, jj_ref, gr_ref, gg_ref, gb_ref, scene_ref, cam_ref,
    dscene_ref, dcx_ref, dcy_ref, dcz_ref, dr_ref, dcam_ref, st_ref,
    *, samples: int, max_depth: int, seed: int, dtype, remat: bool,
):
    key = rtrng.key_from_seed(seed)
    (pixel_ids, fi, fj, scene_mat, cx, cy, cz, rc, active_col,
     cam_vals, use_defocus) = _read_tile_refs(
        ids_ref, ii_ref, jj_ref, scene_ref, cam_ref
    )
    g = Vec3(gr_ref[0, :, :], gg_ref[0, :, :], gb_ref[0, :, :])
    d_scene, d_cx, d_cy, d_cz, d_r, d_cam = _tile_grad_sweep(
        scene_mat, cx, cy, cz, rc, active_col, cam_vals, use_defocus,
        pixel_ids, fi, fj, g, key, st_ref,
        samples=samples, max_depth=max_depth, dtype=dtype, remat=remat,
    )
    _write_grad_outputs(dscene_ref, dcx_ref, dcy_ref, dcz_ref, dr_ref,
                        dcam_ref, d_scene, d_cx, d_cy, d_cz, d_r, d_cam,
                        dtype)


def _fused_tile_kernel(
    ids_ref, ii_ref, jj_ref, tr_ref, tg_ref, tb_ref, scene_ref, cam_ref,
    loss_ref, imr_ref, img_ref, imb_ref,
    dscene_ref, dcx_ref, dcy_ref, dcz_ref, dr_ref, dcam_ref, st_ref,
    *, samples: int, max_depth: int, seed: int, dtype, gamma: bool,
    num_pixels: int, remat: bool,
):
    """Fused MSE train step: ONE kernel computes the rendered tile, the
    MSE-vs-target loss contribution, AND the scene/camera cotangents.

    Three sweeps: (1) forward radiance accumulation (the render), (2) the
    in-kernel loss + upstream-cotangent chain (MSE through gamma and the
    1/spp scale), (3) the shared per-sample forward+reverse grad sweep
    (_tile_grad_sweep) with that cotangent. Replaces the two-program
    forward-then-backward train step — and because it is a single Mosaic
    kernel, the whole value_and_grad (plus an optimizer update) fits in
    ONE jitted program despite the compile service's one-kernel limit."""
    key = rtrng.key_from_seed(seed)
    (pixel_ids, fi, fj, scene_mat, cx, cy, cz, rc, active_col,
     cam_vals, use_defocus) = _read_tile_refs(
        ids_ref, ii_ref, jj_ref, scene_ref, cam_ref
    )
    shape = pixel_ids.shape
    cam = _camera_from_scalars(cam_vals, use_defocus)

    # ---- sweep 1: forward radiance accumulation (no residuals) --------
    def one_sample_fwd(s_i, acc):
        s_u = s_i.astype(jnp.uint32)
        o0, d0 = primary_rays_from_ij(cam, fi, fj, pixel_ids, s_u, key,
                                      dtype)

        def body(b, st):
            o, d, atten, alive_f, acc3 = st
            (o2, d2, at2, al2), contrib = _bounce_tile(
                scene_mat, cx, cy, cz, rc, active_col,
                o, d, atten, alive_f, pixel_ids, s_u,
                b.astype(jnp.uint32), key, dtype,
            )
            return (o2, d2, at2, al2, acc3 + contrib)

        init = (o0, d0, Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
                jnp.ones(shape, dtype), acc)
        return lax.fori_loop(0, max_depth, body, init)[4]

    acc = lax.fori_loop(0, samples, one_sample_fwd,
                        Vec3.zeros(shape, dtype=dtype))

    # ---- sweep 2 (pointwise): image, loss, upstream cotangent ---------
    inv_spp = 1.0 / samples
    lin = acc * inv_spp
    if gamma:
        img = Vec3(jnp.sqrt(jnp.maximum(lin.x, 0.0)),
                   jnp.sqrt(jnp.maximum(lin.y, 0.0)),
                   jnp.sqrt(jnp.maximum(lin.z, 0.0)))
    else:
        img = lin
    valid = pixel_ids < jnp.uint32(num_pixels)
    target = Vec3(tr_ref[0, :, :], tg_ref[0, :, :], tb_ref[0, :, :])
    diff = vec.where(valid, img - target, Vec3.zeros(shape, dtype=dtype))
    w = 1.0 / (num_pixels * 3)
    loss_tile = w * jnp.sum(diff.x * diff.x + diff.y * diff.y
                            + diff.z * diff.z)
    g_img = diff * (2.0 * w)
    if gamma:
        # d sqrt(x) = 0.5 / sqrt(x) = 0.5 / img; subgradient 0 at black
        # (same convention as make_diff_render's host chain)
        chain = lambda gc, ic: jnp.where(ic > 0, 0.5 * gc / jnp.where(
            ic > 0, ic, 1.0), 0.0)
        g_img = Vec3(chain(g_img.x, img.x), chain(g_img.y, img.y),
                     chain(g_img.z, img.z))
    g = g_img * inv_spp

    imr_ref[0, :, :] = img.x
    img_ref[0, :, :] = img.y
    imb_ref[0, :, :] = img.z

    # ---- sweep 3: the shared residual-store + reverse vjp sweep -------
    d_scene, d_cx, d_cy, d_cz, d_r, d_cam = _tile_grad_sweep(
        scene_mat, cx, cy, cz, rc, active_col, cam_vals, use_defocus,
        pixel_ids, fi, fj, g, key, st_ref,
        samples=samples, max_depth=max_depth, dtype=dtype, remat=remat,
    )
    _write_grad_outputs(dscene_ref, dcx_ref, dcy_ref, dcz_ref, dr_ref,
                        dcam_ref, d_scene, d_cx, d_cy, d_cz, d_r, d_cam,
                        dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init_loss():
        loss_ref[0, 0] = 0.0

    loss_ref[0, 0] = loss_ref[0, 0] + loss_tile


def render_pallas_grads(
    scene: Scene,
    cam_cfg: CameraConfig,
    g_acc: jnp.ndarray,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    dtype=jnp.float32,
    ray_tile: int = 256,
    remat: bool = False,
    mesh=None,
    interpret: bool = False,
):
    """Cotangents (d_scene_matrix (N,16), d_camera_row (1,24)) for an
    upstream cotangent ``g_acc`` (H, W, 3) expressed in the ACCUMULATED
    radiance domain (i.e. before the 1/spp scale and gamma — callers chain
    those on the host; see pallas_kernel.make_diff_render).

    Default ray_tile is 256, NOT the forward kernel's 512: the reverse
    sweep's vjp intermediates are ~2x the forward working set and a 512
    tile exceeds the 16 MB VMEM scoped limit (measured 17.65M). Measured
    v5e, 640x384x16spp/8b: rt256 = 1124 ms, rt128 = 1433 ms, vs oracle
    recompute-VJP 6985 ms (6.2x)."""
    cam = initialize(cam_cfg, img_width, img_height)
    num_pixels = img_width * img_height
    n_shards = (
        int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    )
    padded = _round_up(num_pixels, ray_tile * n_shards)
    n_tiles = padded // ray_tile

    ids = jnp.arange(padded, dtype=jnp.uint32)
    ii = (ids % jnp.uint32(img_width)).astype(dtype)
    jj = (ids // jnp.uint32(img_width)).astype(dtype)
    ids2 = ids.reshape(n_tiles, 1, ray_tile)
    ii2 = ii.reshape(n_tiles, 1, ray_tile)
    jj2 = jj.reshape(n_tiles, 1, ray_tile)

    g_flat = g_acc.reshape(num_pixels, 3).astype(dtype)
    g_pad = jnp.zeros((padded, 3), dtype).at[:num_pixels].set(g_flat)
    gr = g_pad[:, 0].reshape(n_tiles, 1, ray_tile)
    gg = g_pad[:, 1].reshape(n_tiles, 1, ray_tile)
    gb = g_pad[:, 2].reshape(n_tiles, 1, ray_tile)

    scene_mat = pack_scene_matrix(scene, dtype)
    cam_row = pack_camera(cam, dtype)
    n_spheres = scene_mat.shape[0]

    kernel = functools.partial(
        _grad_tile_kernel,
        samples=samples_per_pixel,
        max_depth=max_depth,
        seed=seed,
        dtype=dtype,
        remat=remat,
    )

    def run(ids_arr, ii_arr, jj_arr, g_r, g_g, g_b, scene_m, cam_r):
        tiles = ids_arr.shape[0]
        row_spec = pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        acc_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        ncol = (n_spheres, 1)
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                row_spec, row_spec, row_spec,
                row_spec, row_spec, row_spec,
                acc_spec((n_spheres, NUM_COLS)),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                acc_spec((n_spheres, NUM_COLS)),
                acc_spec(ncol), acc_spec(ncol), acc_spec(ncol),
                acc_spec(ncol),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_spheres, NUM_COLS), dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct((1, _CAM_COLS), dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((max_depth * _ST_ROWS, ray_tile), dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(
                    3 * samples_per_pixel * max_depth * padded
                    * n_spheres * 20
                ),
                bytes_accessed=int(padded) * 4 * 16,
                transcendentals=int(
                    2 * samples_per_pixel * max_depth * padded * 4
                ),
            ),
            interpret=interpret,
        )(ids_arr, ii_arr, jj_arr, g_r, g_g, g_b, scene_m, cam_r)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)

        def run_psum(*args):
            outs = run(*args)
            # every shard owns a pixel slice; scene/camera grads are sums
            # over all pixels -> all-reduce over the mesh (rides ICI)
            return tuple(lax.psum(o, axes) for o in outs)

        sharded = shard_map(
            run_psum, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes),
                      P(axes), P(axes), P(axes), P(), P()),
            out_specs=(P(), P(), P(), P(), P(), P()),
            check_vma=False,
        )
        outs = sharded(ids2, ii2, jj2, gr, gg, gb, scene_mat, cam_row)
    else:
        outs = run(ids2, ii2, jj2, gr, gg, gb, scene_mat, cam_row)

    d_sm, d_cx, d_cy, d_cz, d_r, d_cr = outs
    # fold the geometry-column cotangents (separate kernel outputs — see
    # module docstring) back into the packed-matrix cotangent
    d_sm = d_sm.at[:, COL_CX].add(d_cx[:, 0])
    d_sm = d_sm.at[:, COL_CY].add(d_cy[:, 0])
    d_sm = d_sm.at[:, COL_CZ].add(d_cz[:, 0])
    d_sm = d_sm.at[:, COL_RADIUS].add(d_r[:, 0])
    return d_sm, d_cr


def mse_train_pallas(
    scene: Scene,
    cam_cfg: CameraConfig,
    target: jnp.ndarray,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    dtype=jnp.float32,
    gamma: bool = True,
    ray_tile: int = 256,
    remat: bool = False,
    mesh=None,
    interpret: bool = False,
):
    """Fused MSE train step: ONE Mosaic kernel returning
    ``(loss, image, d_scene_matrix, d_camera_row)`` against a target
    image (H, W, 3).

    loss = mean((render - target)^2) over all pixel channels, with the
    render going through the standard 1/spp + gamma postprocess in-kernel.
    Compared with make_diff_render's two-program custom_vjp path this
    saves the separate forward program (the backward kernel re-traces
    forward anyway) and — because the whole value-and-grad is one
    kernel — composes with an optimizer update inside a single jit
    despite the compile service's one-Mosaic-kernel-per-program limit.
    Callers chain the cotangents to parameter pytrees with
    ``chain_to_params``."""
    cam = initialize(cam_cfg, img_width, img_height)
    num_pixels = img_width * img_height
    n_shards = (
        int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    )
    padded = _round_up(num_pixels, ray_tile * n_shards)
    n_tiles = padded // ray_tile

    ids = jnp.arange(padded, dtype=jnp.uint32)
    ii = (ids % jnp.uint32(img_width)).astype(dtype)
    jj = (ids // jnp.uint32(img_width)).astype(dtype)
    ids2 = ids.reshape(n_tiles, 1, ray_tile)
    ii2 = ii.reshape(n_tiles, 1, ray_tile)
    jj2 = jj.reshape(n_tiles, 1, ray_tile)

    t_flat = target.reshape(num_pixels, 3).astype(dtype)
    t_pad = jnp.zeros((padded, 3), dtype).at[:num_pixels].set(t_flat)
    tr = t_pad[:, 0].reshape(n_tiles, 1, ray_tile)
    tg = t_pad[:, 1].reshape(n_tiles, 1, ray_tile)
    tb = t_pad[:, 2].reshape(n_tiles, 1, ray_tile)

    scene_mat = pack_scene_matrix(scene, dtype)
    cam_row = pack_camera(cam, dtype)
    n_spheres = scene_mat.shape[0]

    kernel = functools.partial(
        _fused_tile_kernel,
        samples=samples_per_pixel,
        max_depth=max_depth,
        seed=seed,
        dtype=dtype,
        gamma=gamma,
        num_pixels=num_pixels,
        remat=remat,
    )

    def run(ids_arr, ii_arr, jj_arr, t_r, t_g, t_b, scene_m, cam_r):
        tiles = ids_arr.shape[0]
        row_spec = pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        acc_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        ncol = (n_spheres, 1)
        row_shape = jax.ShapeDtypeStruct((tiles, 1, ray_tile), dtype)
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                row_spec, row_spec, row_spec,
                row_spec, row_spec, row_spec,
                acc_spec((n_spheres, NUM_COLS)),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                row_spec, row_spec, row_spec,
                acc_spec((n_spheres, NUM_COLS)),
                acc_spec(ncol), acc_spec(ncol), acc_spec(ncol),
                acc_spec(ncol),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), dtype),
                row_shape, row_shape, row_shape,
                jax.ShapeDtypeStruct((n_spheres, NUM_COLS), dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct(ncol, dtype),
                jax.ShapeDtypeStruct((1, _CAM_COLS), dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((max_depth * _ST_ROWS, ray_tile), dtype),
            ],
            cost_estimate=pl.CostEstimate(
                # ~1.5x the grad kernel: sweeps 1+3 both trace forward
                flops=int(
                    4 * samples_per_pixel * max_depth * padded
                    * n_spheres * 20
                ),
                bytes_accessed=int(padded) * 4 * 16,
                transcendentals=int(
                    3 * samples_per_pixel * max_depth * padded * 4
                ),
            ),
            interpret=interpret,
        )(ids_arr, ii_arr, jj_arr, t_r, t_g, t_b, scene_m, cam_r)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)

        def run_psum(*args):
            loss, im_r, im_g, im_b, *grads = run(*args)
            # loss and scene/camera grads are sums over all pixels ->
            # all-reduce over the mesh (rides ICI); image rows stay
            # sharded by pixel tile
            return ((lax.psum(loss, axes), im_r, im_g, im_b)
                    + tuple(lax.psum(o, axes) for o in grads))

        sharded = shard_map(
            run_psum, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes),
                      P(axes), P(axes), P(axes), P(), P()),
            out_specs=(P(), P(axes), P(axes), P(axes),
                       P(), P(), P(), P(), P(), P()),
            check_vma=False,
        )
        outs = sharded(ids2, ii2, jj2, tr, tg, tb, scene_mat, cam_row)
    else:
        outs = run(ids2, ii2, jj2, tr, tg, tb, scene_mat, cam_row)

    loss, im_r, im_g, im_b, d_sm, d_cx, d_cy, d_cz, d_r, d_cr = outs
    img = jnp.stack(
        [im_r.reshape(padded)[:num_pixels],
         im_g.reshape(padded)[:num_pixels],
         im_b.reshape(padded)[:num_pixels]], axis=-1,
    ).reshape(img_height, img_width, 3)
    d_sm = d_sm.at[:, COL_CX].add(d_cx[:, 0])
    d_sm = d_sm.at[:, COL_CY].add(d_cy[:, 0])
    d_sm = d_sm.at[:, COL_CZ].add(d_cz[:, 0])
    d_sm = d_sm.at[:, COL_RADIUS].add(d_r[:, 0])
    return loss[0, 0], img, d_sm, d_cr


def make_mse_train(
    mat_type,
    active,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    gamma: bool = True,
    ray_tile: int = 256,
    remat: bool = False,
    mesh=None,
    interpret: bool = False,
):
    """User-facing fused train step builder.

    Returns jittable ``f(params, cam_cfg, target) ->
    (loss, image, (d_params, d_cam_cfg))`` — one program containing one
    Mosaic kernel, so it composes with an optimizer update in the same
    jit (see examples/inverse_rendering.py)."""

    def f(params, cam_cfg, target):
        scene = Scene(params=params, mat_type=mat_type, active=active)
        loss, img, d_sm, d_cr = mse_train_pallas(
            scene, cam_cfg, target, img_width, img_height,
            samples_per_pixel, max_depth, seed=seed, gamma=gamma,
            ray_tile=ray_tile, remat=remat, mesh=mesh,
            interpret=interpret,
        )
        d_params, d_cam = chain_to_params(
            d_sm, d_cr, params, cam_cfg, mat_type, active,
            img_width, img_height,
        )
        return loss, img, (d_params, d_cam)

    return f


def chain_to_params(
    d_scene_mat, d_cam_row, params, cam_cfg, mat_type, active,
    img_width: int, img_height: int, dtype=jnp.float32,
):
    """Host-side chain: packed-matrix/row cotangents -> SceneParams and
    CameraConfig cotangents (transposes pack_scene_matrix and the camera
    initialize() math)."""

    def pack_p(p):
        return pack_scene_matrix(
            Scene(params=p, mat_type=mat_type, active=active), dtype
        )

    def pack_c(c):
        return pack_camera(initialize(c, img_width, img_height), dtype)

    d_params = jax.vjp(pack_p, params)[1](d_scene_mat)[0]
    d_cam_cfg = jax.vjp(pack_c, cam_cfg)[1](d_cam_row)[0]
    return d_params, d_cam_cfg
