"""Pallas backward (VJP) kernel for STREAMING-HBM scenes.

The key observation making a streaming backward tractable (first built
here, later adopted by the VMEM backward too — ops/pallas_backward.py):
under the detached-sampler convention the min-over-spheres hit select
has gradients only through the WINNING sphere (the subgradient of min),
so the reverse sweep never needs the scene at all — it needs each
bounce's winner. A full-scan transpose would be impossible anyway when
the scene is 100k spheres streamed from HBM.

Structure per ray tile:
  * forward sweep (per sample, per bounce): the SAME double-buffered HBM
    block walk as the forward kernel (_hit_world_stream) finds the
    winner; its parameters AND its stream-slot id (STREAM_COL_SID, which
    rides along with the winner gather) are parked in the VMEM residual
    scratch together with the ray state.
  * reverse sweep: a winner-restricted bounce replay — the winner's
    quadratic recomputed differentiably from its stored center/radius,
    the same scatter math as the forward (identical inputs => identical
    branch decisions), transposed with in-kernel jax.vjp. No DMA.
  * gradient scatter: per bounce, the winner cotangent rows (16, R) are
    scattered into a VMEM-resident accumulator by a block loop:
    one-hot(local ids == sid - base) on the MXU (_scatter_matmul_t),
    skipped with a cheap sid-range test per block (Morton-sorted scenes
    keep a tile's winners in few blocks). The accumulator is stored
    TRANSPOSED as (16, N) — lane-dense; an (N, 16) layout tiles to
    T(8,128) and pads 16 lanes to 128, an 8x VMEM bloat that silently
    capped N at ~25k (scoped-vmem compile OOM at 50k). VMEM-resident it
    bounds N at ~200k (the 16 MB scoped limit; 300k wants 18.9M —
    round-4 stream_bwd_ceiling rows); above the auto threshold the
    accumulator moves to an HBM output window-RMW'd through a VMEM
    staging tile (``acc='hbm'``, round 5), which removes the VMEM cap —
    the differentiable ceiling then matches the forward's (1M+ spheres,
    a 64 MB buffer). Bitwise-identical gradients either way (same adds,
    same order).

Gradients come back in STREAM order; ``stream_grads_to_scene_mat`` maps
them to Scene slot order via StreamScene.perm. Camera cotangents follow
the VMEM backward's 18-scalar SMEM convention.

The reference has no backward at all (SURVEY.md §4); this completes
differentiability for the "global memory" (HBM) layout axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import CameraConfig, initialize
from . import rng as rtrng
from . import pallas_backward
from .pallas_backward import (
    _CAM_COLS,
    _N_CAM,
    _ST_ROWS,
    _ST_ROWS_SAMPLE,
    _camera_from_scalars,
    _hbm_park_render,
    _hbm_reverse,
    _pack_residual,
    _regen_render_k,
    _scatter_matmul,
    _scatter_matmul_t,
    _unpack_residual,
    _wave_grad_sweep,
    _winner_bounce,
)
from .pallas_kernel import NUM_COLS, _round_up, pack_camera
from .pallas_stream import (
    STREAM_COLS,
    StreamScene,
    _RAY_ROWS,
    _hit_world_stream,
)
from . import vec
from .tracer import primary_rays_from_ij
from .vec import Vec3

# The residual layout (_R_*/_ST_ROWS), the pack/unpack helpers, and the
# winner-restricted bounce replay (_winner_bounce) live in
# pallas_backward (the VMEM backward adopted the same winner-replay
# reverse sweep that was first built here); imported above as the single
# shared implementation.


def _stream_grad_kernel(
    ids_ref, ii_ref, jj_ref, gr_ref, gg_ref, gb_ref, scene_hbm,
    bounds_ref, cam_ref,
    loss_ref, dscene_ref, dcam_ref, *rest,
    samples: int, max_depth: int, seed: int, dtype, block: int,
    n_blocks: int, n_groups: int, mse: bool = False,
    num_pixels: int = 0, sweep: str = "sample", window: int = 32,
    rr_start=None, k_pixels: int = 1, park: str = "",
    acc_hbm: bool = False, loss_kind: str = "mse",
    huber_delta: float = 1.0,
):
    """``mse=False``: gr/gg/gb rows are the upstream cotangent g_acc;
    loss output stays 0. ``mse=True`` (the FUSED train step): gr/gg/gb
    rows carry the TARGET image instead; a render pass (same walk, same
    RNG streams) accumulates the radiance, derives the MSE cotangent
    in-kernel, and banks the tile's partial loss — one Mosaic program
    for the whole value_and_grad (the two-program composition pays a
    tunnel dispatch per phase; see make_mse_train's 14x for the VMEM
    analog).

    ``sweep='wave'``: the SHARED wave-reversed regenerating sweep
    (pallas_backward._wave_grad_sweep) with the HBM block walk injected
    as its closest-hit and the block-looped ref write as its scatter.
    Each parked wave is a full O(N) block walk, so removing the
    per-sample lane-MAX path-length tail removes whole walks — the win
    is LARGER here than on the VMEM kernel. Gradients equal the
    per-sample sweep's up to reassociation (same replay math and RNG
    streams; wave-order accumulation).

    ``rr_start``: differentiate the Russian-roulette estimator from
    that bounce (replays the forward's RR streams bitwise — see
    pallas_backward._winner_bounce).

    ``park='hbm'`` (mse only): the FULL-PARK fused step — the render
    pass parks every wave to the HBM ``park_ref`` output and the grad
    sweep is REVERSE-ONLY (pallas_backward._hbm_park_render /
    _hbm_reverse with the stream scatter). Worth even more here than on
    the VMEM kernel: the removed re-trace was a full O(N) HBM block
    walk PER WAVE — the reverse never touches the scene at all."""
    hbm_park = park == "hbm"
    rest = list(rest)
    if acc_hbm:
        # appended LAST by the driver so every other scratch index
        # stays put: the accumulator RMW staging tile + its semaphore
        asem = rest.pop()
        astage = rest.pop()
    if hbm_park:
        park_ref, buf0, buf1, sem0, sem1, *scratch = rest
    else:
        park_ref = None
        buf0, buf1, sem0, sem1, *scratch = rest
    ray_scr = scratch[0]
    t_refs = list(scratch[1:1 + n_groups])
    p_refs = list(scratch[1 + n_groups:1 + 2 * n_groups])
    if hbm_park:
        acc_ref, pstage0, pstage1, psem0, psem1 = (
            scratch[1 + 2 * n_groups:]
        )
        st_ref = None
    else:
        st_ref = scratch[1 + 2 * n_groups]
        acc_ref = (
            scratch[2 + 2 * n_groups] if (mse and k_pixels > 1) else None
        )
    key = rtrng.key_from_seed(seed)
    pixel_ids = ids_ref[0, :, :]
    fi = ii_ref[0, :, :]
    fj = jj_ref[0, :, :]
    shape = pixel_ids.shape
    cam_vals = tuple(cam_ref[0, k] for k in range(_N_CAM))
    use_defocus = cam_ref[0, 18] > 0.5
    n_total = n_blocks * block
    # lane-dense accumulator padded so scatter windows stay
    # lane-tile-aligned for ANY block size (the transposed layout
    # slices LANES; widths/offsets must be 128-multiples — block=64
    # stores at offset 64, or a 488-wide one-block resident scene,
    # are not Mosaic-legal)
    wblock = block if block % 128 == 0 else _round_up(max(block, 128),
                                                      128)
    n_pad = _round_up(n_total, wblock)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        if acc_hbm:
            # zero the HBM accumulator window by window through the
            # staging tile (one-time; grid steps are sequential so no
            # later step can observe a partial zero)
            astage[0, :, :] = jnp.zeros((NUM_COLS, wblock), dtype)

            def zero_win(w, _):
                cp = pltpu.make_async_copy(
                    astage, dscene_ref.at[pl.ds(w, 1)], asem)
                cp.start()
                cp.wait()
                return 0

            lax.fori_loop(0, n_pad // wblock, zero_win, 0)
        else:
            dscene_ref[:, :] = jnp.zeros((NUM_COLS, n_pad), dtype)
        for k in range(_CAM_COLS):
            dcam_ref[0, k] = 0.0
        loss_ref[0, 0] = 0.0

    def hit_stream(o, d):
        return _hit_world_stream(
            scene_hbm, bounds_ref, (buf0, buf1), (sem0, sem1),
            o, d, n_blocks, block, dtype, t_refs, p_refs, ray_scr,
        )

    if mse:
        # ---- render pass: accumulate radiance, derive the cotangent.
        # REGENERATING (round 3, mirrors pallas_backward's fused
        # regen_render; K-pixel lanes via the shared _regen_render_k
        # when k_pixels > 1): lanes stream their samples back-to-back,
        # so the
        # per-sample lane-MAX path tail — each wave here a full O(N) HBM
        # block walk — disappears. Per-lane accumulation order equals
        # the per-sample loop's (samples sequential, path order; idle
        # lanes add exact +0.0): radiance, loss, and the cotangent are
        # bit-identical (pinned by test_stream_train's fused-vs-
        # two-program check). -----------------------------------------
        target = Vec3(gr_ref[0, :, :], gg_ref[0, :, :], gb_ref[0, :, :])
        cam_primal = _camera_from_scalars(cam_vals, use_defocus)
        zero_row0 = jnp.zeros(shape, dtype)
        one_row0 = jnp.ones(shape, dtype)
        budget_f = float(samples)

        def to_u32_r(f):
            return pltpu.bitcast(f.astype(jnp.int32), jnp.uint32)

        def rcond(c):
            sample_f, alive_f = c[0], c[5]
            return (jnp.max(jnp.where(sample_f < budget_f, 1.0, 0.0))
                    > 0.5) | (jnp.max(alive_f) > 0.5)

        def rbody(c):
            sample_f, bounce_f, o, d, atten, alive_f, ax, ay, az = c
            regen = (alive_f < 0.5) & (sample_f < budget_f)
            o_n, d_n = primary_rays_from_ij(
                cam_primal, fi, fj, pixel_ids, to_u32_r(sample_f), key,
                dtype,
            )
            o = vec.where(regen, o_n, o)
            d = vec.where(regen, d_n, d)
            atten = vec.where(regen, Vec3(one_row0, one_row0, one_row0),
                              atten)
            bounce_f = jnp.where(regen, zero_row0, bounce_f)
            alive_f = jnp.where(regen, one_row0, alive_f)
            active = alive_f > 0.5

            (hit_raw, _t, wc, wr, walb, wfuzz, wior, wmat, sid) = (
                hit_stream(o, d)
            )
            hit = hit_raw & active
            (o2, d2, at2, al2), contrib = _winner_bounce(
                wc, wr, walb, wfuzz, wior, wmat, hit,
                o, d, atten, alive_f, pixel_ids, to_u32_r(sample_f),
                to_u32_r(bounce_f), key, dtype, rr_start=rr_start,
            )
            at_cap = (al2 > 0.5) & (bounce_f >= (max_depth - 1))
            al3 = jnp.where(at_cap, 0.0, al2).astype(dtype)
            dies = active & (al3 < 0.5)
            continues = active & (al3 > 0.5)
            o3 = vec.where(continues, o2, o)
            d3 = vec.where(continues, d2, d)
            at3 = vec.where(continues, at2, atten)
            bounce3 = jnp.where(continues, bounce_f + 1.0, bounce_f)
            sample3 = sample_f + jnp.where(dies, one_row0, zero_row0)
            alive3 = jnp.where(continues, 1.0, 0.0).astype(dtype)
            return (sample3, bounce3, o3, d3, at3, alive3,
                    ax + contrib.x, ay + contrib.y, az + contrib.z)

        w_end_hbm = None
        if hbm_park:
            # FULL-PARK: the render pass parks every wave to HBM; the
            # reverse below never re-walks the scene
            def hit_fn_r(o, d):
                (hit, _t, wc, wr, walb, wfuzz, wior, wmat,
                 sid) = hit_stream(o, d)
                return hit, wc, wr, walb, wfuzz, wior, wmat, sid

            acc_v, w_end_hbm = _hbm_park_render(
                hit_fn_r, cam_primal, pixel_ids, fi, fj, key, acc_ref,
                park_ref, pstage0, pstage1, psem0, psem1,
                samples=samples, max_depth=max_depth, dtype=dtype,
                rr_start=rr_start, k_pixels=k_pixels,
            )
            acc = (acc_v.x, acc_v.y, acc_v.z)
        elif k_pixels > 1:
            # K-pixel regenerating render (shared with the VMEM fused
            # kernel): per-pixel radiance bit-identical to K=1
            def hit_fn_r(o, d):
                (hit, _t, wc, wr, walb, wfuzz, wior, wmat,
                 sid) = hit_stream(o, d)
                return hit, wc, wr, walb, wfuzz, wior, wmat, sid

            acc_v = _regen_render_k(
                hit_fn_r, cam_primal, pixel_ids, fi, fj, key, acc_ref,
                samples=samples, max_depth=max_depth, dtype=dtype,
                rr_start=rr_start, k_pixels=k_pixels,
            )
            acc = (acc_v.x, acc_v.y, acc_v.z)
        else:
            zero = jnp.zeros(shape, dtype)
            rinit = (zero, zero,
                     Vec3.zeros(shape, dtype=dtype),
                     Vec3.zeros(shape, dtype=dtype),
                     Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
                     zero, zero, zero, zero)
            rfin = lax.while_loop(rcond, rbody, rinit)
            acc = (rfin[6], rfin[7], rfin[8])
        inv_spp = 1.0 / samples
        img = Vec3(acc[0] * inv_spp, acc[1] * inv_spp, acc[2] * inv_spp)
        valid = (pixel_ids < jnp.uint32(num_pixels)).astype(dtype)
        dx = (img.x - target.x) * valid
        dy = (img.y - target.y) * valid
        dz = (img.z - target.z) * valid
        inv_n = 1.0 / (num_pixels * 3)
        # per-pixel loss family (round 5, mirrors _fused_tile_kernel;
        # the stream step renders in LINEAR radiance, so no gamma chain)
        if loss_kind == "mse":
            scale = 2.0 * inv_n * inv_spp   # dL/dimg chained to acc
            g = Vec3(dx * scale, dy * scale, dz * scale)
            loss_val = (dx * dx + dy * dy + dz * dz) * inv_n
        elif loss_kind == "l1":
            scale = inv_n * inv_spp
            g = Vec3(jnp.sign(dx) * scale, jnp.sign(dy) * scale,
                     jnp.sign(dz) * scale)
            loss_val = (jnp.abs(dx) + jnp.abs(dy)
                        + jnp.abs(dz)) * inv_n
        elif loss_kind == "huber":
            hd = float(huber_delta)

            def _h(d):
                a = jnp.abs(d)
                return jnp.where(a <= hd, 0.5 * d * d,
                                 hd * (a - 0.5 * hd))

            scale = inv_n * inv_spp
            g = Vec3(jnp.clip(dx, -hd, hd) * scale,
                     jnp.clip(dy, -hd, hd) * scale,
                     jnp.clip(dz, -hd, hd) * scale)
            loss_val = (_h(dx) + _h(dy) + _h(dz)) * inv_n
        elif loss_kind == "relmse":
            eps = 1e-2

            def _den(t):
                return t * t + eps

            scale = 2.0 * inv_n * inv_spp
            g = Vec3(dx * scale / _den(target.x),
                     dy * scale / _den(target.y),
                     dz * scale / _den(target.z))
            loss_val = (dx * dx / _den(target.x)
                        + dy * dy / _den(target.y)
                        + dz * dz / _den(target.z)) * inv_n
        else:
            raise ValueError(f"unknown loss {loss_kind!r}")
        loss_ref[0, 0] = loss_ref[0, 0] + jnp.sum(loss_val)
    else:
        g = Vec3(gr_ref[0, :, :], gg_ref[0, :, :], gb_ref[0, :, :])

    # scatter windows: 128-multiple wide so the dynamic lane-dim store
    # offsets stay tile-aligned (block < 128 coarsens the skip
    # granularity to 2+ blocks per window; padding columns collect
    # nothing — sids are < n_total)
    n_win = n_pad // wblock

    def _scatter_rows(d_rows, sid_v):
        """Window-looped MXU scatter of (16, R) cotangent rows into the
        lane-dense (16, N) accumulator, skipping windows with no
        winner (Morton-sorted scenes keep a tile's winners in few
        blocks). The loop bounds come from the wave's winner sid RANGE
        (round 5): at 1M spheres a full 0..n_win walk is ~976 window
        tests per reverse wave — Morton locality keeps a wave's
        winners in few CONSECUTIVE windows, so [min_sid, max_sid]
        bounds the visit. The f32 divisions are widened by one window
        each side (exactness margin); the per-window in_win test stays
        EXACT, so skipped windows are provably empty and the adds —
        and therefore the gradients — are bitwise unchanged."""
        valid = sid_v >= 0.0
        smin = jnp.min(jnp.where(valid, sid_v, 1e9))    # no winner ->
        smax = jnp.max(sid_v)                           # zero-trip loop
        w_lo = jnp.maximum(
            jnp.floor(smin / wblock).astype(jnp.int32) - 1, 0)
        w_hi = jnp.minimum(
            jnp.floor(smax / wblock).astype(jnp.int32) + 2, n_win)

        def scatter_win(win_i, _):
            base = win_i * wblock
            base_f = base.astype(dtype)
            in_win = (sid_v >= base_f) & (sid_v < base_f + wblock)

            @pl.when(jnp.max(in_win.astype(dtype)) > 0.0)
            def _():
                # iota must be integer-typed on real Mosaic (f32 iota
                # fails MLIR verification); cast after
                local = jax.lax.broadcasted_iota(
                    jnp.int32, (wblock, 1), 0
                ).astype(dtype)                        # (W, 1)
                one_hot = (
                    (sid_v - base_f) == local
                ).astype(dtype)                        # (W, R)
                # one-side bf16x3 split: f32-exact scatter without
                # HIGHEST's both-side 6-pass cost (see
                # pallas_backward._scatter_matmul)
                d_blk = _scatter_matmul_t(one_hot, d_rows)  # (16, W)
                if acc_hbm:
                    # HBM read-modify-write through the staging tile:
                    # race-free because TPU grid steps run sequentially
                    # and both copies complete before the next window.
                    # Only windows holding a winner pay the round trip
                    # (Morton order keeps a tile's winners in few
                    # windows — the same locality the VMEM skip uses).
                    cp = pltpu.make_async_copy(
                        dscene_ref.at[pl.ds(win_i, 1)], astage, asem)
                    cp.start()
                    cp.wait()
                    astage[0, :, :] = astage[0, :, :] + d_blk
                    cp2 = pltpu.make_async_copy(
                        astage, dscene_ref.at[pl.ds(win_i, 1)], asem)
                    cp2.start()
                    cp2.wait()
                else:
                    ds = pl.ds(pl.multiple_of(base, wblock), wblock)
                    dscene_ref[:, ds] = dscene_ref[:, ds] + d_blk

            return 0

        lax.fori_loop(w_lo, w_hi, scatter_win, 0)

    def one_sample(s_i, d_cam_acc):
        s_u = s_i.astype(jnp.uint32)

        def primary(vals):
            cam = _camera_from_scalars(vals, use_defocus)
            return primary_rays_from_ij(
                cam, fi, fj, pixel_ids, s_u, key, dtype
            )

        (o0, d0), vjp_primary = jax.vjp(primary, cam_vals)

        # ---- forward sweep: HBM block walk per bounce, park winner.
        # Early exit once every lane is dead: bounces >= b_exit are
        # exact no-ops (zero contrib, identity state => cotangent
        # pass-through) and each skipped one is an O(N) block walk; the
        # reverse sweep walks only the parked [0, b_exit) blocks. ------
        def fwd_cond(st):
            b, _o, _d, _atten, alive_f = st
            return (b < max_depth) & (jnp.max(alive_f) > 0.5)

        def fwd_body(st):
            b, o, d, atten, alive_f = st
            b_u = b.astype(jnp.uint32)
            (hit, t, wc, wr, walb, wfuzz, wior, wmat, sid) = (
                _hit_world_stream(
                    scene_hbm, bounds_ref, (buf0, buf1), (sem0, sem1),
                    o, d, n_blocks, block, dtype, t_refs, p_refs,
                    ray_scr,
                )
            )
            hit_f = hit.astype(dtype)
            st_ref[pl.ds(pl.multiple_of(b * _ST_ROWS_SAMPLE,
                                        _ST_ROWS_SAMPLE),
                         _ST_ROWS_SAMPLE), :] = _pack_residual(
                o, d, atten, alive_f, hit_f, wc, wr, walb, wfuzz,
                wior, wmat, sid,
            )
            (o2, d2, at2, al2), _ = _winner_bounce(
                wc, wr, walb, wfuzz, wior, wmat, hit,
                o, d, atten, alive_f, pixel_ids, s_u, b_u, key, dtype,
                rr_start=rr_start,
            )
            return (b + 1, o2, d2, at2, al2)

        init = (jnp.int32(0), o0, d0,
                Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
                jnp.ones(shape, dtype))
        b_exit = lax.while_loop(fwd_cond, fwd_body, init)[0]

        # ---- reverse sweep: winner replay vjp + block scatter ----------
        def rev_body(i, carry):
            ct_o, ct_d, ct_at, ct_al = carry
            b = b_exit - 1 - i
            blk = st_ref[pl.ds(pl.multiple_of(b * _ST_ROWS_SAMPLE,
                                              _ST_ROWS_SAMPLE),
                               _ST_ROWS_SAMPLE), :]
            (o, d, atten, alive_f, hit_f, wc, wr, walb, wfuzz, wior,
             wmat, sid) = _unpack_residual(blk)
            hit = hit_f > 0.5
            b_u = b.astype(jnp.uint32)

            def f(wc_, wr_, walb_, wfuzz_, wior_, o_, d_, at_, al_):
                return _winner_bounce(
                    wc_, wr_, walb_, wfuzz_, wior_, wmat, hit,
                    o_, d_, at_, al_, pixel_ids, s_u, b_u, key, dtype,
                    rr_start=rr_start,
                )

            _, vjp_f = jax.vjp(f, wc, wr, walb, wfuzz, wior,
                               o, d, atten, alive_f)
            (d_wc, d_wr, d_walb, d_wfuzz, d_wior,
             d_o, d_d, d_at, d_al) = vjp_f(
                ((ct_o, ct_d, ct_at, ct_al), g)
            )

            # winner cotangents -> (16, R) rows in scene-matrix column
            # order (pack_scene_matrix cols 0-8; mat/active cols get 0)
            zero = jnp.zeros(shape, dtype)
            d_rows = jnp.concatenate(
                [d_wc.x, d_wc.y, d_wc.z, d_wr,
                 d_walb.x, d_walb.y, d_walb.z, d_wfuzz, d_wior]
                + [zero] * (NUM_COLS - 9),
                axis=0,
            )                                             # (16, R)
            valid = hit & (alive_f > 0.5)
            sid_v = jnp.where(valid, sid, -1.0)           # never scatters
            _scatter_rows(d_rows, sid_v)
            return (d_o, d_d, d_at, d_al)

        ct0 = (Vec3.zeros(shape, dtype=dtype),
               Vec3.zeros(shape, dtype=dtype),
               Vec3.zeros(shape, dtype=dtype),
               jnp.zeros(shape, dtype))
        ct_o, ct_d, _, _ = lax.fori_loop(0, b_exit, rev_body, ct0)

        (d_cam_vals,) = vjp_primary((ct_o, ct_d))
        return tuple(d_cam_acc[k] + d_cam_vals[k] for k in range(_N_CAM))

    zero_cam = tuple(jnp.zeros((), dtype) for _ in range(_N_CAM))

    if hbm_park:
        # reverse-only from the parked waves; the stream scatter is the
        # block-looped accumulator write (dummy scalar carry)
        def scatter_fn_h(d_rows, sid_v, carry):
            _scatter_rows(d_rows, sid_v)
            return carry

        _, d_cam = _hbm_reverse(
            scatter_fn_h, jnp.zeros((), dtype), cam_vals, use_defocus,
            g, key, w_end_hbm, park_ref, pstage0, pstage1, psem0, psem1,
            max_depth=max_depth, dtype=dtype, rr_start=rr_start,
            k_pixels=k_pixels,
        )
    elif sweep == "wave":
        # shared wave-reversed regenerating sweep with stream bindings:
        # the HBM block walk as the closest-hit, the block-looped ref
        # write as the scatter (dummy scalar carry)
        def hit_fn(o, d):
            hit, _t, wc, wr, walb, wfuzz, wior, wmat, sid = hit_stream(
                o, d
            )
            return hit, wc, wr, walb, wfuzz, wior, wmat, sid

        def scatter_fn(d_rows, sid_v, carry):
            _scatter_rows(d_rows, sid_v)
            return carry

        _, d_cam = _wave_grad_sweep(
            hit_fn, scatter_fn, jnp.zeros((), dtype), cam_vals,
            use_defocus, pixel_ids, fi, fj, g, key, st_ref,
            samples=samples, max_depth=max_depth, dtype=dtype,
            window=window, rr_start=rr_start, k_pixels=k_pixels,
        )
    else:
        d_cam = lax.fori_loop(0, samples, one_sample, zero_cam)

    for k in range(_N_CAM):
        dcam_ref[0, k] = dcam_ref[0, k] + d_cam[k]


def _stream_grad_program(
    stream: StreamScene,
    cam_cfg: CameraConfig,
    rows3: jnp.ndarray,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    mse: bool,
    seed: int = rtrng.DEFAULT_SEED,
    dtype=jnp.float32,
    ray_tile: int = 256,
    lane_group: int = 0,
    mesh=None,
    interpret: bool = False,
    sweep=None,
    window: int = 0,
    rr_start=None,
    pixels_per_lane=None,
    park=None,
    acc=None,
    loss: str = "mse",
    huber_delta: float = 1.0,
):
    """Shared driver for both grad entry points. ``rows3`` (H, W, 3) is
    the upstream cotangent g_acc (mse=False) or the target image
    (mse=True). Returns (loss (1,1), d_stream_matrix (N, 16) in STREAM
    row order, d_camera_row (1, 24)).

    ``acc`` (None = auto): where the (16, N) lane-dense gradient
    accumulator lives. 'vmem' = the scoped-VMEM resident accumulator
    (fastest scatter, but caps the scene at ~200k spheres — the 16 MB
    scoped limit, round-4 stream_bwd_ceiling rows). 'hbm' = an HBM
    accumulator output, window-RMW'd through a (16, wblock) VMEM
    staging tile per scatter — removes the VMEM cap entirely (the
    differentiable sphere ceiling moves to HBM size: 1M spheres is a
    64 MB buffer), at a small per-wave DMA cost only on windows that
    hold winners. Identical gradients BITWISE (same adds in the same
    order, different residence). Auto picks 'hbm' when the accumulator
    would exceed a ~9 MB share of the scoped budget (N_pad > ~144k).

    ``park`` (mse only; None = auto): 'hbm' runs the FULL-PARK fused
    step — render parks every wave to an HBM buffer, grad sweep is
    reverse-only (no per-wave O(N) block re-walk). Auto picks it
    whenever the true-bound K*spp*depth buffer fits the shared HBM
    budget (pallas_backward._HBM_BUDGET, 12.5 GiB on this 16 GB part),
    shrinking K to fit; pass park=False to force the re-tracing sweep.

    ``sweep='wave'`` (default — measured on v5e at 10k spheres
    640x384x4spp: d6 1361 -> 1305 ms, d12 2756 -> 1945, −29%;
    stream_wave.jsonl): wave-reversed regenerating sweep (kernel
    docstring); ``window`` = parked waves per round (0 = auto by the
    same ~10 MB scratch budget as the VMEM backward).

    ``pixels_per_lane`` (wave sweep only; None = auto K=32 shrunk for
    small images): multi-pixel lanes for both the fused render pass
    (per-pixel flush into a (3K, R) accumulator, bit-identical
    per-pixel radiance to K=1) and the grad sweep — worth even more
    here than on the VMEM backward, since every drain-tail wave is a
    full O(N) HBM block walk."""
    explicit_sweep = sweep is not None
    if sweep is None:
        sweep = "wave"
    if sweep not in ("wave", "sample"):
        raise ValueError("sweep must be 'wave' or 'sample'")
    rr_start = rtrng.validate_rr_start(rr_start)
    num_pixels = img_width * img_height
    n_shards = (
        int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    )
    _HBM_BUDGET = pallas_backward.hbm_budget()   # shared with the VMEM
    # fused step / standalone grads; device-derived with the measured
    # 16 GB-part constant as fallback (ADVICE r4 dedup)
    if pixels_per_lane is None:
        if sweep == "wave":
            # K=32 is the stream knee (matching the forward kernel's),
            # not the VMEM backward's 16: every drain-tail wave here is
            # an O(N) block walk (stream_wave.jsonl 10k@640x384x4spp:
            # grads d12 K16 1047 -> K32 1014 ms, fused d12 1947 -> 1868)
            per = max(1, num_pixels // (ray_tile * n_shards))
            pixels_per_lane = 1
            while pixels_per_lane < 32 and pixels_per_lane * 2 <= per:
                pixels_per_lane *= 2
        else:
            pixels_per_lane = 1
    _bytes_per_k = samples_per_pixel * max_depth * _ST_ROWS * ray_tile * 4
    if mse and park is None and not explicit_sweep and not window:
        # full-park auto (round 4, mirrors mse_train_pallas): shrink K
        # until the true-bound buffer fits, else fall back to re-trace.
        # Skipped when the caller pinned a sweep OR a window — park
        # ignores both, so the auto would silently override the request
        # (ADVICE r4 + round-5 review).
        # integer K fit, mirroring mse_train_pallas's auto (K3-style
        # non-doubling fits are production there)
        _k = min(pixels_per_lane, max(1, int(_HBM_BUDGET // _bytes_per_k)))
        if _k * _bytes_per_k <= _HBM_BUDGET:
            park = "hbm"
            pixels_per_lane = _k
    hbm_park = park == "hbm"
    if hbm_park and not mse:
        raise ValueError(
            "park='hbm' is the fused (mse) step's mode — the standalone "
            "grad program has no render pass to park from"
        )
    if hbm_park:
        # explicit park='hbm' mirrors the auto: shrink K to the integer
        # buffer fit and fail fast if even K=1 cannot fit — not a
        # 100+ GiB runtime allocation failure (round-5 review; the VMEM
        # twin got the same guard from ADVICE r4)
        pixels_per_lane = min(pixels_per_lane,
                              max(1, int(_HBM_BUDGET // _bytes_per_k)))
        if pixels_per_lane * _bytes_per_k > _HBM_BUDGET:
            raise ValueError(
                f"park='hbm' needs a K*{samples_per_pixel}*{max_depth}"
                f"*{_ST_ROWS}-row park buffer within the "
                f"{_HBM_BUDGET / 2**30:.1f} GiB HBM budget even at K=1; "
                f"lower ray_tile/samples/depth or pass park=False"
            )
    kpl = pixels_per_lane
    if kpl > 1 and sweep != "wave":
        raise ValueError(
            "pixels_per_lane > 1 requires sweep='wave' (the per-sample "
            "sweep has no multi-pixel machinery)"
        )
    if sweep == "wave" and not window:
        budget_waves = int(10e6 // (_ST_ROWS * ray_tile * 4))
        window = max(8, budget_waves - max_depth)
    scratch_waves = window + max_depth if sweep == "wave" else max_depth
    cam = initialize(cam_cfg, img_width, img_height)
    padded = _round_up(num_pixels, kpl * ray_tile * n_shards)
    n_tiles = padded // (kpl * ray_tile)
    if (kpl > 1 or sweep == "wave") and padded >= (1 << 24):
        # the wave sweep (any K) carries pixel ids as f32 — ids >= 2^24
        # would round silently and desync the RNG streams
        raise ValueError(
            "pixels_per_lane > 1 and sweep='wave' support images with "
            "< 16M (padded) pixels only — pixel ids ride lanes as f32; "
            "use sweep='sample' with pixels_per_lane=1 for larger images"
        )

    ids = jnp.arange(padded, dtype=jnp.uint32)
    ii = (ids % jnp.uint32(img_width)).astype(dtype)
    jj = (ids // jnp.uint32(img_width)).astype(dtype)
    ids2 = ids.reshape(n_tiles, kpl, ray_tile)
    ii2 = ii.reshape(n_tiles, kpl, ray_tile)
    jj2 = jj.reshape(n_tiles, kpl, ray_tile)

    g_flat = rows3.reshape(num_pixels, 3).astype(dtype)
    g_pad = jnp.zeros((padded, 3), dtype).at[:num_pixels].set(g_flat)
    gr = g_pad[:, 0].reshape(n_tiles, kpl, ray_tile)
    gg = g_pad[:, 1].reshape(n_tiles, kpl, ray_tile)
    gb = g_pad[:, 2].reshape(n_tiles, kpl, ray_tile)

    cam_row = pack_camera(cam, dtype)
    block = stream.block
    n_blocks = stream.n_blocks
    n_total = n_blocks * block
    _wb = block if block % 128 == 0 else _round_up(max(block, 128), 128)
    n_total_pad = _round_up(n_total, _wb)   # scatter-window lane alignment
    if acc is None:
        # leave the walk buffers/residual scratch most of the 16 MB
        # scoped budget: resident accumulator up to ~9 MB (~144k slots)
        acc = ("hbm" if NUM_COLS * n_total_pad * 4 > 9 * 2**20
               else "vmem")
    if acc not in ("vmem", "hbm"):
        raise ValueError("acc must be None (auto), 'vmem', or 'hbm'")
    acc_hbm = acc == "hbm"
    n_win = n_total_pad // _wb
    nb_pad = stream.bounds.shape[0]
    if stream.scene_mat.shape[1] != STREAM_COLS:
        raise ValueError(
            "the stream backward walks scenes over the HBM DMA path, "
            "which needs the 128-lane layout — dense (16-column) stream "
            "scenes are forward/resident-only"
        )
    if n_blocks % 2 != 0:
        raise ValueError(
            f"stream scene must have an even block count, got {n_blocks}"
        )
    if 0 < lane_group < ray_tile and ray_tile % lane_group != 0:
        raise ValueError(
            f"lane_group ({lane_group}) must divide ray_tile ({ray_tile})"
        )
    n_groups = (
        ray_tile // lane_group if 0 < lane_group < ray_tile else 1
    )
    g_size = ray_tile // n_groups

    kernel = functools.partial(
        _stream_grad_kernel,
        samples=samples_per_pixel,
        max_depth=max_depth,
        seed=seed,
        dtype=dtype,
        block=block,
        n_blocks=n_blocks,
        n_groups=n_groups,
        mse=mse,
        num_pixels=num_pixels,
        sweep=sweep,
        window=window,
        rr_start=rr_start,
        k_pixels=kpl,
        park=("hbm" if hbm_park else ""),
        acc_hbm=acc_hbm,
        loss_kind=loss,
        huber_delta=huber_delta,
    )
    hbm_waves = kpl * samples_per_pixel * max_depth

    def run(ids_arr, ii_arr, jj_arr, g_r, g_g, g_b, scene_m, bounds_m,
            cam_r):
        tiles = ids_arr.shape[0]
        row_spec = pl.BlockSpec((1, kpl, ray_tile), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                row_spec, row_spec, row_spec,
                row_spec, row_spec, row_spec,
                pl.BlockSpec(memory_space=pltpu.HBM),  # scene PINNED to
                # HBM: ANY let the backward-kernel compile place
                # the whole scene in VMEM (~51 MB at 100k spheres
                # -> scoped-vmem OOM; the forward's ANY happens to
                # place in HBM, but placement is per-program)
                pl.BlockSpec((nb_pad, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                (pl.BlockSpec(memory_space=pltpu.HBM) if acc_hbm
                 else pl.BlockSpec((NUM_COLS, n_total_pad),
                                   lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ) + ((pl.BlockSpec(memory_space=pltpu.HBM),)
                 if hbm_park else ()),
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), dtype),
                (jax.ShapeDtypeStruct((n_win, NUM_COLS, _wb), dtype)
                 if acc_hbm
                 else jax.ShapeDtypeStruct((NUM_COLS, n_total_pad),
                                           dtype)),
                jax.ShapeDtypeStruct((1, _CAM_COLS), dtype),
            ) + ((jax.ShapeDtypeStruct(
                (hbm_waves * _ST_ROWS, ray_tile), dtype),)
                if hbm_park else ()),
            scratch_shapes=(
                [
                    pltpu.VMEM((block, STREAM_COLS), dtype),
                    pltpu.VMEM((block, STREAM_COLS), dtype),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ]
                + [pltpu.VMEM((_RAY_ROWS * n_groups, g_size), dtype)]
                + [pltpu.VMEM((1, g_size), dtype)] * n_groups
                + [pltpu.VMEM((STREAM_COLS, g_size), dtype)] * n_groups
                + (
                    [
                        pltpu.VMEM((3 * kpl, ray_tile), dtype),
                        pltpu.VMEM((_ST_ROWS, ray_tile), dtype),
                        pltpu.VMEM((_ST_ROWS, ray_tile), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                    ]
                    if hbm_park
                    else [pltpu.VMEM(
                        (scratch_waves
                         * (_ST_ROWS if sweep == "wave"
                            else _ST_ROWS_SAMPLE), ray_tile), dtype)]
                    + (
                        [pltpu.VMEM((3 * kpl, ray_tile), dtype)]
                        if (mse and kpl > 1) else []
                    )
                )
                + (
                    # LAST (kernel pops from the end): HBM-accumulator
                    # RMW staging tile + its DMA semaphore
                    [pltpu.VMEM((1, NUM_COLS, _wb), dtype),
                     pltpu.SemaphoreType.DMA]
                    if acc_hbm else []
                )
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(2 * samples_per_pixel * max_depth * padded
                          * n_total * 20),
                bytes_accessed=int(
                    2 * samples_per_pixel * max_depth
                    * stream.scene_mat.size * 4
                ),
                transcendentals=int(
                    2 * samples_per_pixel * max_depth * padded * 4
                ),
            ),
            interpret=interpret,
        )(ids_arr, ii_arr, jj_arr, g_r, g_g, g_b, scene_m, bounds_m,
          cam_r)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)

        def run_psum(*args):
            loss, d_stream, d_cam, *rest_o = run(*args)
            return (lax.psum(loss, axes), lax.psum(d_stream, axes),
                    lax.psum(d_cam, axes)) + tuple(rest_o)

        sharded = shard_map(
            run_psum, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes),
                      P(axes), P(axes), P(axes), P(), P(), P()),
            out_specs=(P(), P(), P())
            + ((P(axes),) if hbm_park else ()),
            check_vma=False,
        )
    def _to_public(d_t):
        # kernel accumulates lane-dense — (16, N_pad) resident, or
        # (n_win, 16, wblock) window-major in HBM; public contract is
        # (N, 16)
        if acc_hbm:
            d_t = d_t.transpose(1, 0, 2).reshape(NUM_COLS, n_total_pad)
        return d_t[:, :n_total].T

    if mesh is not None:
        loss, d_t, d_cam = sharded(
            ids2, ii2, jj2, gr, gg, gb, stream.scene_mat,
            stream.bounds, cam_row)[:3]
        return loss, _to_public(d_t), d_cam
    loss, d_t, d_cam = run(ids2, ii2, jj2, gr, gg, gb, stream.scene_mat,
                           stream.bounds, cam_row)[:3]
    return loss, _to_public(d_t), d_cam


def render_pallas_stream_grads(
    stream: StreamScene,
    cam_cfg: CameraConfig,
    g_acc: jnp.ndarray,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    **kw,
):
    """Cotangents for an upstream ``g_acc`` (H, W, 3) in the ACCUMULATED
    radiance domain: (d_stream_matrix (N, 16) in STREAM row order,
    d_camera_row (1, 24)). Map the former back to Scene order with
    stream_grads_to_scene_mat. Pass ``rr_start`` to differentiate the
    Russian-roulette estimator (matching the forward render's
    rr_start), ``sweep='wave'`` for the regenerating sweep."""
    _, d_stream, d_cam = _stream_grad_program(
        stream, cam_cfg, g_acc, img_width, img_height,
        samples_per_pixel, max_depth, mse=False, **kw,
    )
    return d_stream, d_cam


def mse_train_stream(
    stream: StreamScene,
    cam_cfg: CameraConfig,
    target: jnp.ndarray,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    **kw,
):
    """FUSED streaming MSE value-and-grad: ONE Mosaic program renders
    (linear radiance, gamma off), computes the MSE loss vs ``target``
    (H, W, 3), derives the cotangent in-kernel, and runs the
    winner-replay reverse sweep. Returns (loss scalar, d_stream_matrix
    (N, 16) STREAM order, d_camera_row (1, 24)). Saves a per-phase
    tunnel dispatch vs composing the forward and grad programs (the
    VMEM analog, make_mse_train, measured 14x on v5e)."""
    loss, d_stream, d_cam = _stream_grad_program(
        stream, cam_cfg, target, img_width, img_height,
        samples_per_pixel, max_depth, mse=True, **kw,
    )
    return loss[0, 0], d_stream, d_cam


def stream_grads_to_scene_mat(d_stream: jnp.ndarray, stream: StreamScene,
                              n_slots: int) -> jnp.ndarray:
    """Map stream-order cotangents (N_stream, 16) back to Scene slot
    order (n_slots, 16) via the Morton-sort permutation (inactive slots
    get zero — they have no gradient by construction)."""
    n_act = stream.perm.shape[0]
    return jnp.zeros((n_slots, NUM_COLS), d_stream.dtype).at[
        stream.perm].set(d_stream[:n_act])
