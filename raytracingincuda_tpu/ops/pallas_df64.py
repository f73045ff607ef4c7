"""Pallas double-float render kernel: fp64-class rendering on TPU.

The accelerator answer to the reference's GlobalDouble/ConstDouble
variants (``GlobalDoubleCUDAInOneWeekend/rtweekend.h:32-40`` — mechanical
float->double widenings of the float tracer, published as first-class
benchmark rows: 40 270 ms at the reference headline vs 2 879 float,
14x — its GPU runs fp64 at 1:64 rate). TPU has NO fp64 units, so this
kernel runs the same regeneration wavefront as ops/pallas_kernel.py with
every geometric/radiometric quantity in double-float arithmetic
(ops/df64.py: f32 hi/lo pairs, ~49 significand bits; algorithms in
ops/df64_trace.py, shared verbatim with interpret mode).

Scope (precision-comparison config, like the reference's doubles):
forward render only (no vjp), uniform sample budgets, parity estimator,
current-bounce sky; multi-pixel lanes supported (bit-equal any K). Correctness oracle: the native-f64 jnp
tracer on CPU (tests/test_df64.py — images agree to ~1e-9, vs f32's
~1e-3 knife-edge flips).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import CameraConfig
from ..models.scene import Scene
from . import df64 as dd
from . import rng as rtrng
from .df64 import D
from .df64_trace import (
    initialize_f64,
    pack_scene_matrix_df64,
    regen_trace_df64,
)
from .pallas_kernel import NUM_COLS, _lane_setup


# Smaller default tile than the f32 kernel's 512/1024: the df64 hit test
# holds ~2x the (N, R) intermediates (hi+lo per value) against the same
# 16 MB scoped-VMEM budget.
DEFAULT_DF64_RAY_TILE = 256


def _df64_tile_kernel(
    ids_ref, ii_ref, jj_ref, sm_hi_ref, sm_lo_ref, cam_hi_ref, cam_lo_ref,
    out_rh, out_gh, out_bh, out_rl, out_gl, out_bl,
    *, samples: int, max_depth: int, seed: int, trust_rounding: bool,
):
    # Mosaic can't lower reduce_precision and doesn't contract FMAs
    # (df64._rnd docs); interpret mode runs on XLA CPU, which DOES, so
    # it keeps the laundering. Values are identical either way.
    ctx = (dd.trusted_rounding() if trust_rounding
           else contextlib.nullcontext())
    with ctx:
        # the cam refs pass through UNMATERIALIZED: Mosaic only allows
        # SCALAR loads from SMEM, and unpack_camera_df64 reads cam[0, k]
        # one scalar at a time (a [:, :] row load here fails to lower)
        acc = regen_trace_df64(
            sm_hi_ref[:, :], sm_lo_ref[:, :],
            cam_hi_ref, cam_lo_ref,
            ids_ref[0, :, :], ii_ref[0, :, :], jj_ref[0, :, :],
            samples=samples, max_depth=max_depth, seed=seed,
        )
    out_rh[0, :, :] = acc.x.hi
    out_gh[0, :, :] = acc.y.hi
    out_bh[0, :, :] = acc.z.hi
    out_rl[0, :, :] = acc.x.lo
    out_gl[0, :, :] = acc.y.lo
    out_bl[0, :, :] = acc.z.lo


def _df64_tile_kernel_multi(
    ids_ref, ii_ref, jj_ref, sm_hi_ref, sm_lo_ref, cam_hi_ref, cam_lo_ref,
    out_rh, out_gh, out_bh, out_rl, out_gl, out_bl,
    *, samples: int, max_depth: int, seed: int, trust_rounding: bool,
    k_pixels: int,
):
    """K-pixels-per-lane df64 regen kernel (pallas_kernel._regen_body_multi
    ported to double-float): each lane works K pixels sequentially,
    pulling the next when the current one's samples are spent — the
    per-lane work statistic averages over K draws, shrinking the
    max-over-lanes tile tail. Uniform budgets, parity estimator (the df64
    scope), so the f32 version's budget rows / rr / legacy-sky branches
    drop out. Same per-pixel RNG streams => images bit-equal to K=1."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    from .df64_trace import (
        _d3_rows, _safe_radius_df64, gather_hit_df64, hit_world_df64,
        primary_rays_df64, scatter_df64, sky_color_df64,
        unpack_camera_df64,
    )

    ctx = (dd.trusted_rounding() if trust_rounding
           else contextlib.nullcontext())
    with ctx:
        K = k_pixels
        key = rtrng.key_from_seed(seed)
        cam = unpack_camera_df64(cam_hi_ref, cam_lo_ref)
        sm_hi = sm_hi_ref[:, :]
        sm_lo = sm_lo_ref[:, :]
        ids_blk = ids_ref[0, :, :]                    # (K, R) uint32
        ii_blk = ii_ref[0, :, :]
        jj_blk = jj_ref[0, :, :]
        r = ids_blk.shape[1]
        shape = (1, r)
        one_row = jnp.ones(shape, jnp.float32)
        zero_row = jnp.zeros(shape, jnp.float32)
        kf_done = float(K)
        budget = float(samples)

        def to_u32(f):
            return pltpu.bitcast(f.astype(jnp.int32), jnp.uint32)

        idsf_blk = pltpu.bitcast(ids_blk, jnp.int32).astype(jnp.float32)

        def row_of(blk, k_next):
            out = jnp.zeros(shape, jnp.float32)
            for k in range(K):
                out = out + jnp.where(k_next == float(k),
                                      blk[k:k + 1, :], zero_row)
            return out

        zeros_kr = jnp.zeros((K, r), jnp.float32)
        for ref in (out_rh, out_gh, out_bh, out_rl, out_gl, out_bl):
            ref[0, :, :] = zeros_kr

        pix_f0 = idsf_blk[0:1, :]
        fi0 = ii_blk[0:1, :]
        fj0 = jj_blk[0:1, :]
        s0 = jnp.zeros(shape, jnp.float32)
        o0, d0 = primary_rays_df64(cam, fi0, fj0, to_u32(pix_f0),
                                   to_u32(s0), key)
        max_waves = K * samples * max_depth

        def cond(carry):
            w, k_f = carry[0], carry[3]
            return (w < max_waves) & (jnp.min(k_f) < kf_done)

        def body(carry):
            (w, sample_f, bounce_f, k_f, pix_f, fi, fj,
             o, d, atten, acc) = carry
            active = k_f < kf_done
            pixel_ids = to_u32(pix_f)

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
            coin_u, _ = rtrng.uniform2(key, pixel_ids, s_u, b_u,
                                       rtrng.DRAW_COIN, jnp.float32)
            sc_dir, sc_att, sc_scattered = scatter_df64(
                d, normal, front_face, mat_f, albedo_h, fuzz_h, ior_h,
                dd.d3_of(ur), coin_u,
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
            complete = dies & (sample_next >= budget)

            def mk_flush(val):
                return jnp.concatenate(
                    [jnp.where(complete & (k_f == float(k)), val,
                               zero_row)
                     for k in range(K)],
                    axis=0,
                )

            out_rh[0, :, :] = out_rh[0, :, :] + mk_flush(acc.x.hi)
            out_gh[0, :, :] = out_gh[0, :, :] + mk_flush(acc.y.hi)
            out_bh[0, :, :] = out_bh[0, :, :] + mk_flush(acc.z.hi)
            out_rl[0, :, :] = out_rl[0, :, :] + mk_flush(acc.x.lo)
            out_gl[0, :, :] = out_gl[0, :, :] + mk_flush(acc.y.lo)
            out_bl[0, :, :] = out_bl[0, :, :] + mk_flush(acc.z.lo)
            acc = dd.d3_where(complete, zero3, acc)

            k_next = k_f + jnp.where(complete, one_row, zero_row)
            pull = complete & (k_next < kf_done)
            pix_f = jnp.where(pull, row_of(idsf_blk, k_next), pix_f)
            fi = jnp.where(pull, row_of(ii_blk, k_next), fi)
            fj = jnp.where(pull, row_of(jj_blk, k_next), fj)
            k_f = k_next
            sample_f = jnp.where(dies & ~complete, sample_next, sample_f)
            sample_f = jnp.where(complete, jnp.zeros(shape, jnp.float32),
                                 sample_f)

            regen = (dies & ~complete) | pull
            o_new, d_new = primary_rays_df64(
                cam, fi, fj, to_u32(pix_f), to_u32(sample_f), key
            )
            o = dd.d3_where(regen, o_new, o)
            d = dd.d3_where(regen, d_new, d)
            atten = dd.d3_where(regen, _d3_rows(shape, 1.0, 1.0, 1.0),
                                atten)
            bounce_f = jnp.where(regen, zero_row, bounce_f)

            return (w + 1, sample_f, bounce_f, k_f, pix_f, fi, fj,
                    o, d, atten, acc)

        init = (
            jnp.int32(0), s0, zero_row, zero_row, pix_f0, fi0, fj0,
            o0, d0, _d3_rows(shape, 1.0, 1.0, 1.0), _d3_rows(shape),
        )
        final = lax.while_loop(cond, body, init)
        # max_waves-cap parity with K=1: bank partial accumulation into
        # the current pixel's row
        k_f_end = final[3]
        acc_end = final[10]

        def mk_tail(val):
            return jnp.concatenate(
                [jnp.where(k_f_end == float(k), val, zero_row)
                 for k in range(K)],
                axis=0,
            )

        out_rh[0, :, :] = out_rh[0, :, :] + mk_tail(acc_end.x.hi)
        out_gh[0, :, :] = out_gh[0, :, :] + mk_tail(acc_end.y.hi)
        out_bh[0, :, :] = out_bh[0, :, :] + mk_tail(acc_end.z.hi)
        out_rl[0, :, :] = out_rl[0, :, :] + mk_tail(acc_end.x.lo)
        out_gl[0, :, :] = out_gl[0, :, :] + mk_tail(acc_end.y.lo)
        out_bl[0, :, :] = out_bl[0, :, :] + mk_tail(acc_end.z.lo)


def make_df64_render(
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    n_spheres: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    gamma: bool = True,
    ray_tile: int = DEFAULT_DF64_RAY_TILE,
    pixels_per_lane: int = 1,
    pixel_order=None,
    interpret: bool = False,
):
    """Build a JITTED ``fn(sm_hi, sm_lo, cam_rows) -> D`` render program.

    ``pixels_per_lane`` (K): multi-pixel lanes, the same tile-tail
    averaging as the f32 kernel — bit-equal images for any K (per-pixel
    sums are lane-local and sample order is unchanged).

    ``pixel_order``: optional difficulty ordering (padded uint32 ids,
    e.g. from the F32 kernel's measure_difficulty/difficulty_order
    prepass — ordering affects only speed, never values, so the cheap
    f32 probe is a valid hint for the df64 render; outputs are
    un-permuted exactly).

    The scene matrices and packed camera rows are jit ARGUMENTS, so a
    fresh same-shaped scene reuses the compiled program (the reference's
    per-run H2D is new data, not a new kernel), and the df64 postprocess
    chains (1/spp scale, gamma sqrt — dozens of f32 ops each) fuse into
    the one program instead of paying per-op tunnel RPC eagerly (the
    lesson of packed_resident.jsonl)."""
    rtrng.validate_stream_ids(samples_per_pixel, max_depth)
    kpl = pixels_per_lane
    (ids, ids2, ii2, jj2, _bud2, use_sort, num_pixels,
     padded) = _lane_setup(
        img_width, img_height, ray_tile, kpl, 1, pixel_order,
        samples_per_pixel, 0, None, jnp.float32,
    )

    if kpl > 1:
        kernel = functools.partial(
            _df64_tile_kernel_multi,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            trust_rounding=not interpret,
            k_pixels=kpl,
        )
    else:
        kernel = functools.partial(
            _df64_tile_kernel,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            trust_rounding=not interpret,
        )

    tiles = ids2.shape[0]
    blk = (1, kpl, ray_tile)
    row_spec = pl.BlockSpec(blk, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scene_spec = pl.BlockSpec((n_spheres, NUM_COLS), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    cam_spec = pl.BlockSpec((1, 24), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    row_shape = jax.ShapeDtypeStruct((tiles,) + blk[1:], jnp.float32)

    def run(sm_hi, sm_lo, cam_rows):
        outs = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[row_spec, row_spec, row_spec,
                      scene_spec, scene_spec, cam_spec, cam_spec],
            out_specs=(row_spec,) * 6,
            out_shape=(row_shape,) * 6,
            cost_estimate=pl.CostEstimate(
                # ~8x the f32 kernel's per-element cost (df64 mul ~28
                # flops)
                flops=int(samples_per_pixel * max_depth * padded
                          * n_spheres * 160),
                bytes_accessed=int(padded) * 4 * 32,
                transcendentals=int(samples_per_pixel * max_depth
                                    * padded * 4),
            ),
            interpret=interpret,
        )(ids2, ii2, jj2, sm_hi, sm_lo, cam_rows[0:1], cam_rows[1:2])
        rh, gh, bh, rl, gl, bl = outs

        def chan(hi, lo):
            h, l = hi.reshape(padded), lo.reshape(padded)
            if use_sort:
                # un-permute: lane i rendered pixel ids[i] (exact —
                # per-pixel sums are lane-local)
                idx = ids.astype(jnp.int32)
                h = jnp.zeros_like(h).at[idx].set(h)
                l = jnp.zeros_like(l).at[idx].set(l)
            return D(h[:num_pixels], l[:num_pixels])

        scale = dd.const(1.0 / samples_per_pixel)
        img = [dd.mul(chan(h, l), scale)
               for h, l in ((rh, rl), (gh, gl), (bh, bl))]
        if gamma:
            # linear_to_gamma = sqrt, 0 at 0 (color.h:10-13)
            img = [dd.sqrt(dd.maximum(c, dd.const(0.0))) for c in img]
        shape = (img_height, img_width)
        hi = jnp.stack([c.hi.reshape(shape) for c in img], axis=-1)
        lo = jnp.stack([c.lo.reshape(shape) for c in img], axis=-1)
        return D(hi, lo)

    return jax.jit(run)


def render_pallas_df64(
    scene: Scene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    gamma: bool = True,
    ray_tile: int = DEFAULT_DF64_RAY_TILE,
    pixels_per_lane: int = 1,
    pixel_order=None,
    interpret: bool = False,
) -> D:
    """Render in double-float. Returns a ``df64.D`` of (H, W, 3) f32
    arrays; ``df64.to_f64(result)`` reconstructs the float64 image
    exactly on the host. The 1/spp scale and gamma sqrt run in df64
    inside the same jittable program.

    ``scene`` and ``cam_cfg`` must be CONCRETE (not jit-traced): the
    scene pack and the f64 viewport math run host-side in numpy float64
    (the device is f32-only)."""
    sm_hi, sm_lo = pack_scene_matrix_df64(scene)
    cam_rows = jnp.asarray(initialize_f64(cam_cfg, img_width, img_height),
                           jnp.float32)
    fn = make_df64_render(
        img_width, img_height, samples_per_pixel, max_depth,
        sm_hi.shape[0], seed=seed, gamma=gamma, ray_tile=ray_tile,
        pixels_per_lane=pixels_per_lane, pixel_order=pixel_order,
        interpret=interpret,
    )
    return fn(sm_hi, sm_lo, cam_rows)
