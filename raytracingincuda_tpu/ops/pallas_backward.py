"""Pallas backward (VJP) kernel for the wavefront tracer.

Replaces the oracle recompute-VJP (pallas_kernel.make_diff_render's default
backward) with an in-kernel reverse pass: the whole bounce chain of a ray
tile is re-traced forward with per-bounce state parked in VMEM, then walked
in reverse accumulating cotangents for the packed scene matrix (N, 16) and
the camera scalars. No HBM roundtrips between bounces — the same property
that makes the forward kernel fast applies to the backward sweep.

Design notes:
  * WINNER REPLAY (the same trick as the streaming backward,
    ops/pallas_stream_backward.py, where it was first built): under the
    detached-sampler convention the min-over-spheres hit select has
    gradients only through the WINNING sphere (the subgradient of min),
    so the reverse sweep never touches the (N, R) hit scan at all. The
    forward sweep finds each bounce's winner with the shared
    ``_hit_select`` and parks its parameters + slot id in the VMEM
    residual scratch; the reverse sweep replays a winner-restricted
    bounce (``_winner_bounce`` — the winner's quadratic recomputed from
    its stored center/radius, bitwise-equal primal) and transposes THAT
    with in-kernel ``jax.vjp`` — O(R) work per bounce instead of the
    O(N·R) transpose of the full scan. (The first version of this kernel
    vjp'd the full _bounce_tile scan: 6.4x the oracle VJP but ~12x the
    forward cost, and its (N, R) vjp intermediates capped ray_tile at
    256 under the 16 MB VMEM limit — see git history and
    benchmarks/results/bwd_remat.jsonl for the dead ends.)
  * Detached-sampler convention (ops/grad.py): RNG draws are integer
    Threefry streams (zero tangent by construction) and every discrete
    decision (hit winner one-hot, material select, Schlick coin, liveness)
    enters through comparisons/casts whose tangents JAX already treats as
    symbolically zero — the vjp graph contains exactly the continuous
    chain.
  * Gradient scatter into spheres: the winner cotangent rows (16, R) are
    scattered into the (N, 16) accumulator by one_hot(slot id) @ d_rows^T
    on the MXU — not a serialized scatter (the TPU answer to
    atomicAdd-style gradient accumulation). The slot id rides the packed
    scene matrix as a spare column (COL_SID, exact in f32 to 2^24) so the
    winner gather fetches it for free.
  * Mosaic cannot lower the transpose of LANE-dim slicing (pad/concat at
    unaligned lane offsets -> "offset mismatch on non-concat dimension").
    Every lane-sliced quantity therefore enters the vjp'd function as its
    OWN (1, R) primal (sublane slices of the residual scratch are fine);
    the camera enters as 18 SMEM scalars whose cotangents are full-lane
    reductions (supported) written to an SMEM output row.
  * Per-bounce residuals are (o, d, atten, alive, hit, winner params,
    slot id) = 22 rows of (1, R) f32 in a (max_depth*32, R) VMEM
    scratch — 25 bounces x 512 lanes = 1.6 MB; everything else is
    recomputed in the reverse sweep.
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
from .intersect import T_MIN
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
    _gather_params,
    _hit_select,
    _round_up,
    pack_camera,
    pack_scene_matrix,
)
from .tracer import (_sky_color, primary_ray_draws,
                     primary_rays_from_ij)
from .vec import Vec3

# per-bounce residual rows in the VMEM state scratch (padded to 32
# sublanes per bounce); shared with the streaming backward
_R_O = 0        # 0-2 origin
_R_D = 3        # 3-5 direction
_R_A = 6        # 6-8 attenuation
_R_ALIVE = 9
_R_HIT = 10
_R_WC = 11      # 11-13 winner center
_R_WR = 14      # winner radius
_R_WALB = 15    # 15-17 winner albedo
_R_WFUZZ = 18
_R_WIOR = 19
_R_WMAT = 20
_R_SID = 21
# wave-sweep extras (sweep='wave' parks by WAVE index, so each lane's
# (sample, bounce, died-here) must ride its parked row)
_R_DIES = 22
_R_SAMPLE = 23
_R_BOUNCE = 24
# multi-pixel-lane extras (k_pixels > 1: a lane's CURRENT pixel — and
# hence its upstream cotangent row — changes as it pulls new pixels, so
# they must ride the parked row too; K=1 skips these writes)
_R_PIX = 25
_R_FI = 26
_R_FJ = 27
_R_GX = 28
_R_GY = 29
_R_GZ = 30
# parked detached RNG draw rows (round 4): the per-bounce draws the
# forward already computed — scatter unit vector, coin, rr survival.
# The reverse replay reads them from the park instead of re-running
# Threefry, which the ablation measured at ~30% of the bounce-vjp op
# count (bwd_rev_ablate.jsonl; jaxpr: ~420 of 1472 row-ops).
_R_URX = 31
_R_URY = 32
_R_URZ = 33
_R_COIN = 34
_R_URR = 35
# parked PRIMARY-ray draws (full-park layout only): pixel jitter +
# defocus disk, functions of (pixel, sample) — so a row parked at ANY
# bounce carries its path's primary draws, and the reverse's camera
# vjp skips the Threefry + disk-map recompute (~half its ops). The
# render already computes them every wave (round-start regen), so
# parking them is free compute.
_R_CU0 = 36
_R_CU1 = 37
_R_CPX = 38
_R_CPY = 39
_ST_ROWS = 40     # all 40 used in the full-park layout; 8-aligned so
                  # wave-slot DMA offsets stay sublane-tile-aligned
# the per-SAMPLE sweep's residual layout stops at row 21 (no dies/
# sample/bounce rows — the sample loop tracks the bounce index
# directly, and no draws are parked there): pad to the next sublane
# tile instead of charging the legacy path the full 40-row wave layout
# (which shifted park_all budgets and wasted 45% of its VMEM scratch)
_ST_ROWS_SAMPLE = 24

# full-park HBM buffer budget, shared by the fused step, the standalone
# gradient program, and the stream backward: 16 GB HBM chip; a 13.1 GB
# park buffer measured allocatable (hbmpark_knobs rt1024_k16) — 12.5
# leaves alloc headroom
_HBM_BUDGET = int(12.5 * 2**30)


def hbm_budget() -> int:
    """Park-buffer budget for the device actually in use.

    The 12.5 GiB constant assumes the measured 16 GB v5e part; on a
    smaller-HBM part that gate would over-commit (ADVICE r4). When the
    backend reports a memory limit, cap the budget at 78% of it (the
    constant's own fraction of 16 GiB); otherwise — CPU meshes,
    interpret mode, plugins without memory_stats — keep the constant.
    Never raises: auto-gating must work everywhere the kernels do.
    """
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        if limit:
            return min(_HBM_BUDGET, int(int(limit) * 0.78))
    except Exception:  # noqa: BLE001 — stats are best-effort
        pass
    return _HBM_BUDGET
_CAM_COLS = 24
_N_CAM = 18   # differentiable camera scalars (pack_camera rows 0..17)

# spare packed-matrix column carrying each slot's own index (f32, exact
# to 2^24 — far beyond the VMEM kernel's ~5k-sphere ceiling). Same index
# the stream layout uses for its slot id (pallas_stream.STREAM_COL_SID).
COL_SID = 11

# Measurement instrument (benchmarks/bwd_rev_ablate_probe.py): trace-time
# flags that stub individual reverse-phase cost centers so a same-day A/B
# can attribute the reverse walk's per-wave cost. NEVER set in production
# — gradients are WRONG under any flag (stubs keep shapes and consume
# their inputs with ~0-weight mixes so XLA cannot dead-code the
# surrounding dataflow, but the values are meaningless). Flags:
#   "rev"         skip the whole reverse walk (park-only sweep)
#   "bounce_vjp"  stub the per-wave jax.vjp(_winner_bounce) replay
#   "cam_vjp"     skip the per-wave primary-ray camera vjp
#   "scatter"     stub the one-hot build AND the scatter matmul
#   "scatter_mm"  stub only the scatter matmul (one-hot still built)
_ABLATE: frozenset = frozenset()


def _order_ids(pixel_order, padded: int) -> jnp.ndarray:
    """(padded,) uint32 lane->pixel map from an optional permutation.

    A permutation padded for a DIFFERENT tile layout is adapted: shorter
    ones are extended with the missing trailing padding ids; longer ones
    (e.g. a forward order at a non-dividing ray_tile) are compacted to
    the entries < padded — those are exactly a permutation of
    [0, padded) since every id >= padded is a padding id. The compaction
    is a stable counting scatter (jit-safe: no boolean indexing)."""
    if pixel_order is None:
        return jnp.arange(padded, dtype=jnp.uint32)
    po = jnp.asarray(pixel_order, jnp.uint32).reshape(-1)
    if po.shape[0] > padded:
        keep = po < jnp.uint32(padded)
        rank = jnp.cumsum(keep) - 1
        rank = jnp.where(keep, rank, po.shape[0])    # OOB -> dropped
        po = jnp.zeros((padded,), jnp.uint32).at[rank].set(
            po, mode="drop"
        )
    elif po.shape[0] < padded:
        po = jnp.concatenate(
            [po, jnp.arange(po.shape[0], padded, dtype=jnp.uint32)]
        )
    return po


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


def _hit_winner(scene_mat, cx, cy, cz, rc, active_col, o: Vec3, d: Vec3):
    """Full (detached) hit scan for a (1, R) lane row batch: winner
    parameters + slot id via the shared _hit_select and the MXU gather.
    Nothing here is differentiated — the reverse sweep replays the
    winner only (_winner_bounce)."""
    a = jnp.maximum(vec.length_sq(d), 1e-12)                  # (1, R)
    d_dot_o = vec.dot(d, o)
    o2 = vec.length_sq(o)
    c_dot_d = cx * d.x + cy * d.y + cz * d.z                  # (N, R)
    c_dot_o = cx * o.x + cy * o.y + cz * o.z
    hit, _t, one_hot = _hit_select(
        cx, cy, cz, rc, active_col, a, d_dot_o, o2, c_dot_d, c_dot_o
    )
    params = _gather_params(scene_mat, one_hot)                # (16, R)
    row = lambda k: params[k:k + 1, :]
    wc = Vec3(row(COL_CX), row(COL_CY), row(COL_CZ))
    walb = Vec3(row(COL_ALB_R), row(COL_ALB_G), row(COL_ALB_B))
    return (hit, wc, row(COL_RADIUS), walb, row(COL_FUZZ),
            row(COL_IOR), row(COL_MAT), row(COL_SID))


def _bounce_draws(pixel_ids, s_u, b_u, key, dtype, rr: bool):
    """The per-bounce detached RNG draws (scatter unit vector, coin,
    rr survival) from the counter streams — bitwise the draws
    _winner_bounce historically made inline (same streams, same
    order). Hoisted so the wave-parking sweeps can PARK them (rows
    _R_URX.._R_URR) and the reverse replay can skip the Threefry
    recompute (~30% of the bounce-vjp op count, bwd_rev_ablate.jsonl)."""
    unit_rand = rtrng.random_unit_vector(
        key, pixel_ids, s_u, b_u, rtrng.DRAW_SCATTER, dtype
    )
    coin_u, _ = rtrng.uniform2(
        key, pixel_ids, s_u, b_u, rtrng.DRAW_COIN, dtype
    )
    if rr:
        u_rr, _ = rtrng.uniform2(
            key, pixel_ids, s_u, b_u, rtrng.DRAW_RR, dtype
        )
    else:
        u_rr = jnp.zeros_like(coin_u)
    return unit_rand, coin_u, u_rr


def _winner_bounce(wc: Vec3, wr, walb: Vec3, wfuzz, wior, wmat_f, hit,
                   o: Vec3, d: Vec3, atten: Vec3, alive_f,
                   pixel_ids, s_u, b_u, key, dtype, rr_start=None,
                   draws=None):
    """One bounce of the estimator restricted to the stored
    winner sphere, for a (1, R) lane row batch.

    ``rr_start``: enable Russian roulette from that bounce — identical
    streams (DRAW_RR) and float association as the forward kernels
    (_regen_body) and the oracle (tracer.trace_sample), so the replayed
    primal (survival decisions, attenuation scales) is bitwise the
    forward's. The kill DECISION is detached (comparison), while the
    1/p_surv weight is a continuous function of attenuation and carries
    gradients — the detached-sampler convention applied to RR.

    Differentiable in (wc, wr, walb, wfuzz, wior, o, d, atten): the
    winner's root is recomputed from its quadratic with the same
    numerator-domain association as _hit_select, so the primal is
    bitwise the full scan's closest hit (the MXU one-hot gather copies
    the winner's parameters exactly); the scatter math is the shared
    materials.scatter (identical inputs => identical branch decisions).
    The ``hit`` flag is the stored (detached) forward decision.
    Returns ((o', d', atten', alive_f'), contrib) where contrib is the
    radiance banked THIS bounce (miss lanes: atten * sky) — identical
    semantics to the forward kernels' bounce bodies (camera.h:78-128).
    """
    shape = alive_f.shape
    alive = alive_f > 0.5
    if draws is None:
        draws = _bounce_draws(pixel_ids, s_u, b_u, key, dtype,
                              rr_start is not None)
    unit_rand, coin_u, u_rr = draws

    a = jnp.maximum(vec.length_sq(d), 1e-12)
    h = vec.dot(wc, d) - vec.dot(d, o)
    c2r2 = vec.length_sq(wc) - wr * wr
    c = (c2r2 + vec.length_sq(o)) - 2.0 * vec.dot(wc, o)
    disc = h * h - a * c
    sqrtd = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    tmin_a = T_MIN * a
    near_num = h - sqrtd
    root_num = jnp.where(near_num > tmin_a, near_num, h + sqrtd)
    t = root_num * (1.0 / a)

    # NaN hygiene for the REVERSE pass: miss lanes gather the all-zero
    # one-hot (radius 0, ior 0), whose downstream math overflows to inf in
    # forward intermediates; the forward kernels mask those values out, but
    # reverse-mode chain terms multiply cotangents (0 on miss lanes) by
    # those primals — and 0 * inf = NaN poisons the whole tile. Clamp the
    # gathered params to finite neutral values on miss lanes; their
    # cotangents are identically zero, so live-lane gradients are
    # unchanged (same argument as the oracle's garbage-but-finite gather,
    # intersect.gather_hit_params).
    wr_safe = jnp.where(hit, wr, 1.0)
    ior_safe = jnp.where(hit, wior, 1.0)
    t_safe = jnp.where(hit, t, 1.0)

    p = o + d * t_safe
    outward = (p - wc) / vec.safe_radius(wr_safe)
    front_face = vec.dot(d, outward) < 0.0
    normal = vec.where(front_face, outward, -outward)

    sc = materials.scatter(
        d, normal, front_face, wmat_f.astype(jnp.int32), walb, wfuzz,
        ior_safe, unit_rand, coin_u,
    )

    sky = _sky_color(d, dtype)
    miss_now = alive & ~hit
    zero = Vec3.zeros(shape, dtype=dtype)
    contrib = vec.where(miss_now, atten * sky, zero)

    scattered_alive = alive & hit & sc.scattered
    atten_upd = atten * sc.attenuation
    if rr_start is not None:
        p_surv = jnp.clip(
            jnp.maximum(jnp.maximum(atten_upd.x, atten_upd.y),
                        atten_upd.z),
            0.05, 1.0,
        )
        # integer-domain zone test: Mosaic cannot lower uint32->f32
        # casts (the oracle's bounce.astype(dtype) >= float(rr_start)
        # decides identically for integer bounces)
        rr_zone = b_u >= jnp.uint32(rr_start)
        rr_kill = scattered_alive & rr_zone & (u_rr >= p_surv)
        scattered_alive = scattered_alive & ~rr_kill
        atten_upd = atten_upd * jnp.where(rr_zone, 1.0 / p_surv, 1.0)
    atten2 = vec.where(scattered_alive, atten_upd, atten)
    o2 = vec.where(scattered_alive, p, o)
    d2 = vec.where(scattered_alive, sc.direction, d)
    alive2 = jnp.where(scattered_alive, 1.0, 0.0).astype(dtype)
    return (o2, d2, atten2, alive2), contrib


def _pack_residual(o, d, atten, alive_f, hit_f, wc, wr, walb, wfuzz,
                   wior, wmat, sid):
    rows = [o.x, o.y, o.z, d.x, d.y, d.z, atten.x, atten.y, atten.z,
            alive_f, hit_f, wc.x, wc.y, wc.z, wr,
            walb.x, walb.y, walb.z, wfuzz, wior, wmat, sid]
    rows += [jnp.zeros_like(alive_f)] * (_ST_ROWS_SAMPLE - len(rows))
    return jnp.concatenate(rows, axis=0)                      # (24, R)


def _unpack_residual(blk):
    r1 = lambda k: blk[k:k + 1, :]
    r3 = lambda k: Vec3(r1(k), r1(k + 1), r1(k + 2))
    return (r3(_R_O), r3(_R_D), r3(_R_A), r1(_R_ALIVE), r1(_R_HIT),
            r3(_R_WC), r1(_R_WR), r3(_R_WALB), r1(_R_WFUZZ),
            r1(_R_WIOR), r1(_R_WMAT), r1(_R_SID))


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


def _reverse_sweep(st_ref, blk0, b_exit, g, pixel_ids, s_u, key, dtype,
                   n, cols, iota_n, rr_start=None):
    """Winner-replay reverse vjp over parked residual blocks
    [blk0, blk0 + b_exit) of ``st_ref`` (32 rows per bounce). Returns
    (d_scene (N, 16), ct_o, ct_d) — the camera chain happens outside."""
    shape = pixel_ids.shape

    def rev_body(i, carry):
        d_scene, ct_o, ct_d, ct_at, ct_al = carry
        b = b_exit - 1 - i
        blk = st_ref[pl.ds(pl.multiple_of((blk0 + b) * _ST_ROWS_SAMPLE,
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
        # order (pack_scene_matrix cols 0-8; mat/active/sid cols get 0)
        zero = jnp.zeros(shape, dtype)
        d_rows = jnp.concatenate(
            [d_wc.x, d_wc.y, d_wc.z, d_wr,
             d_walb.x, d_walb.y, d_walb.z, d_wfuzz, d_wior]
            + [zero] * (cols - 9),
            axis=0,
        )                                             # (16, R)
        valid = hit & (alive_f > 0.5)
        sid_v = jnp.where(valid, sid, -1.0)           # never scatters
        one_hot = (sid_v == iota_n).astype(dtype)     # (N, R)
        d_blk = _scatter_matmul(one_hot, d_rows)      # (N, 16)
        return (d_scene + d_blk, d_o, d_d, d_at, d_al)

    ct0 = (
        jnp.zeros((n, cols), dtype),
        Vec3.zeros(shape, dtype=dtype),   # ct origin
        Vec3.zeros(shape, dtype=dtype),   # ct direction
        Vec3.zeros(shape, dtype=dtype),   # ct attenuation
        jnp.zeros(shape, dtype),          # ct alive
    )
    d_scene, ct_o, ct_d, _, _ = lax.fori_loop(0, b_exit, rev_body, ct0)
    return d_scene, ct_o, ct_d


def _tile_grad_sweep(scene_mat, cx, cy, cz, rc, active_col, cam_vals,
                     use_defocus, pixel_ids, fi, fj, g, key, st_ref,
                     *, samples: int, max_depth: int, dtype,
                     sample_offset: int = 0, rr_start=None):
    """Per-tile gradient accumulation for an upstream image cotangent ``g``
    (Vec3 of (1, R) rows, accumulated-radiance domain): per-sample forward
    sweep (full hit scan, detached) parking each bounce's winner in
    ``st_ref``, then the winner-replay reverse vjp sweep (module
    docstring). Returns (d_scene (N, 16), d_cam 18-tuple).

    ``sample_offset`` selects the global sample-id window
    [offset, offset+samples) — d_acc is a SUM over samples, so chunked
    sweeps over disjoint windows add up exactly to the full-range sweep
    (the counter RNG keys streams on the global ids). This is how >100 s
    of backward work stays under the single-dispatch ceiling
    (docs/UPSTREAM_ISSUES.md #10)."""
    shape = pixel_ids.shape
    n, cols = scene_mat.shape
    iota_n = lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(dtype)

    def one_sample(s_i, carry):
        d_scene_acc, d_cam_acc = carry
        s_u = s_i.astype(jnp.uint32)

        def primary(vals):
            cam = _camera_from_scalars(vals, use_defocus)
            return primary_rays_from_ij(
                cam, fi, fj, pixel_ids, s_u, key, dtype
            )

        (o0, d0), vjp_primary = jax.vjp(primary, cam_vals)

        # ---- forward sweep: full hit scan per bounce, park the winner.
        # Early exit once every lane is dead (most paths die in a few
        # bounces at depth 25): bounces >= b_exit are exact no-ops —
        # contrib is zero and the state update is the identity, so their
        # vjp is cotangent pass-through — and the reverse sweep below
        # walks only the parked [0, b_exit) blocks. ---------------------
        def fwd_cond(st):
            b, _o, _d, _atten, alive_f = st
            return (b < max_depth) & (jnp.max(alive_f) > 0.5)

        def fwd_body(st):
            b, o, d, atten, alive_f = st
            b_u = b.astype(jnp.uint32)
            hit, wc, wr, walb, wfuzz, wior, wmat, sid = _hit_winner(
                scene_mat, cx, cy, cz, rc, active_col, o, d
            )
            st_ref[pl.ds(pl.multiple_of(b * _ST_ROWS_SAMPLE,
                                        _ST_ROWS_SAMPLE),
                         _ST_ROWS_SAMPLE), :] = _pack_residual(
                o, d, atten, alive_f, hit.astype(dtype),
                wc, wr, walb, wfuzz, wior, wmat, sid,
            )
            (o2, d2, at2, al2), _ = _winner_bounce(
                wc, wr, walb, wfuzz, wior, wmat, hit,
                o, d, atten, alive_f, pixel_ids, s_u, b_u, key, dtype,
                rr_start=rr_start,
            )
            return (b + 1, o2, d2, at2, al2)

        init = (
            jnp.int32(0), o0, d0,
            Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
            jnp.ones(shape, dtype),
        )
        b_exit = lax.while_loop(fwd_cond, fwd_body, init)[0]

        # ---- reverse sweep: winner-replay vjp + MXU one-hot scatter ----
        d_scene, ct_o, ct_d = _reverse_sweep(
            st_ref, 0, b_exit, g, pixel_ids, s_u, key, dtype, n, cols,
            iota_n, rr_start=rr_start,
        )

        # cotangents of the primary ray flow into the camera scalars
        (d_cam_vals,) = vjp_primary((ct_o, ct_d))
        d_cam_new = tuple(
            d_cam_acc[k] + d_cam_vals[k] for k in range(_N_CAM)
        )
        return (d_scene_acc + d_scene, d_cam_new)

    zero_cam = tuple(jnp.zeros((), dtype) for _ in range(_N_CAM))
    return lax.fori_loop(
        sample_offset, sample_offset + samples, one_sample,
        (jnp.zeros((n, cols), dtype), zero_cam),
    )


def _write_grad_outputs(dscene_ref, dcam_ref, d_scene, d_cam, dtype):
    """Accumulate tile cotangents into the shared output blocks
    (zero-initialized at program 0; TPU grids are sequential)."""
    n, cols = d_scene.shape

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscene_ref[:, :] = jnp.zeros((n, cols), dtype)
        for k in range(_CAM_COLS):
            dcam_ref[0, k] = 0.0

    dscene_ref[:, :] = dscene_ref[:, :] + d_scene
    for k in range(_N_CAM):
        dcam_ref[0, k] = dcam_ref[0, k] + d_cam[k]


def _grad_tile_kernel(
    ids_ref, ii_ref, jj_ref, gr_ref, gg_ref, gb_ref, scene_ref, cam_ref,
    dscene_ref, dcam_ref, st_ref,
    *, samples: int, max_depth: int, seed: int, dtype,
    sample_offset: int = 0, rr_start=None,
):
    key = rtrng.key_from_seed(seed)
    (pixel_ids, fi, fj, scene_mat, cx, cy, cz, rc, active_col,
     cam_vals, use_defocus) = _read_tile_refs(
        ids_ref, ii_ref, jj_ref, scene_ref, cam_ref
    )
    g = Vec3(gr_ref[0, :, :], gg_ref[0, :, :], gb_ref[0, :, :])
    d_scene, d_cam = _tile_grad_sweep(
        scene_mat, cx, cy, cz, rc, active_col, cam_vals, use_defocus,
        pixel_ids, fi, fj, g, key, st_ref,
        samples=samples, max_depth=max_depth, dtype=dtype,
        sample_offset=sample_offset, rr_start=rr_start,
    )
    _write_grad_outputs(dscene_ref, dcam_ref, d_scene, d_cam, dtype)


def _wave_pack_residual(o, d, atten, alive_f, hit_f, wc, wr, walb, wfuzz,
                        wior, wmat, sid, dies_f, sample_f, bounce_f,
                        pix_f=None, fi_r=None, fj_r=None, g_r=None,
                        draws=None, cam_draws=None):
    zero = jnp.zeros_like(alive_f)
    rows = [o.x, o.y, o.z, d.x, d.y, d.z, atten.x, atten.y, atten.z,
            alive_f, hit_f, wc.x, wc.y, wc.z, wr,
            walb.x, walb.y, walb.z, wfuzz, wior, wmat, sid,
            dies_f, sample_f, bounce_f]
    if pix_f is not None:
        # multi-pixel lanes: the row's pixel identity + cotangent rows
        rows += [pix_f, fi_r, fj_r, g_r.x, g_r.y, g_r.z]
    else:
        rows += [zero] * 6            # keep the draw rows at 31-35
    if draws is not None:
        unit_rand, coin_u, u_rr = draws
        rows += [unit_rand.x, unit_rand.y, unit_rand.z, coin_u, u_rr]
    if cam_draws is not None:
        rows += [jnp.broadcast_to(r, alive_f.shape) for r in cam_draws]
    rows += [zero] * (_ST_ROWS - len(rows))
    return jnp.concatenate(rows, axis=0)                      # (40, R)


def _wave_grad_sweep(hit_fn, scatter_fn, d_scene0, cam_vals,
                     use_defocus, ids_blk, ii_blk, jj_blk, g_blk, key,
                     st_ref, *, samples: int, max_depth: int, dtype,
                     sample_offset: int = 0, window: int = 32,
                     rr_start=None, k_pixels: int = 1):
    """Wave-reversed REGENERATING gradient sweep, shared by the grad
    kernel, the fused train kernel, AND the streaming backward (which
    inject their own closest-hit and gradient-scatter):

      hit_fn(o, d) -> (hit, wc, wr, walb, wfuzz, wior, wmat, sid)
        the full (detached) closest-hit — the VMEM (N, R) scan or the
        streaming HBM block walk.
      scatter_fn(d_rows, sid_v, carry) -> carry'
        lands the (16, R) winner cotangent rows at slot ids ``sid_v``
        (-1 = never scatters) — a carried (N, 16) one-hot matmul
        accumulation (VMEM) or a direct block-looped write into the
        output ref (stream; the carry is a dummy scalar).
      d_scene0: initial scatter carry.

    ``ids_blk``/``ii_blk``/``jj_blk`` are (K, R) lane->pixel blocks and
    ``g_blk`` the matching (K, R) upstream-cotangent rows, K =
    ``k_pixels``. K > 1 = MULTI-PIXEL LANES (the forward kernel's
    _regen_body_multi, applied to the backward): each lane works K
    pixels sequentially, averaging the per-lane total-work statistic
    that sets each drain's tail — the lane's current pixel id / fi/fj /
    g row ride the carry, are re-selected on pixel pull (row_of — K
    cheap (1, R) selects), and are PARKED with each wave so the reverse
    walk replays the right pixel's RNG streams and cotangent row.

    Returns (d_scene_carry, d_cam 18-tuple).

    The per-sample sweep (_tile_grad_sweep) pays the lane-MAX path
    length per sample twice (forward park + reverse walk): measured 4.2x
    the production forward's wave count at d25 and worse at d50 — the
    production forward smooths exactly this tail with ray regeneration
    (bwd_decomp.jsonl: the fwd sweep alone is 71% of backward time).

    This sweep applies the same regeneration to the backward. Lanes
    stream their pixels' samples back-to-back, parking each wave's
    pre-bounce state + winner by WAVE index (a scalar row offset — the
    per-lane bounce index never indexes memory, which is what makes
    this SIMD-expressible). When the parking window fills, regeneration
    pauses, live paths DRAIN to death (<= max_depth extra waves), and
    the whole window is walked backward: reversing wave order reverses
    every lane's path stream simultaneously; the per-lane cotangent
    carry resets where the parked died-here flag is set (each path's
    chain is independent), and path-start rows (parked bounce == 0)
    route their origin/direction cotangents through the primary-ray vjp
    into the camera scalars. Rounds repeat until every lane's sample
    budget is spent. Per-path results are identical to the per-sample
    sweep (same _hit_winner/_winner_bounce replay, same RNG streams);
    only accumulation order differs (float reassociation).
    """
    K = k_pixels
    multi = K > 1
    r = ii_blk.shape[1]
    shape = (1, r)
    budget = float(sample_offset + samples)
    s_off_f = float(sample_offset)
    zero_row = jnp.zeros(shape, dtype)
    one_row = jnp.ones(shape, dtype)
    zero3 = Vec3.zeros(shape, dtype=dtype)
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

    def primary_from(cvals, fi_r, fj_r, pix_u, s_u):
        cam = _camera_from_scalars(cvals, use_defocus)
        return primary_rays_from_ij(cam, fi_r, fj_r, pix_u, s_u, key,
                                    dtype)

    # fixed per-lane pixel rows when K == 1 (no pull machinery traced)
    pix0 = idsf_blk[0:1, :]
    fi0 = ii_blk[0:1, :]
    fj0 = jj_blk[0:1, :]
    g0 = Vec3(g_blk.x[0:1, :], g_blk.y[0:1, :], g_blk.z[0:1, :])

    def unpack(state):
        if multi:
            (sample_f, bounce_f, o, d, atten, alive_f,
             k_f, pix_f, fi_r, fj_r, gx, gy, gz) = state
            return (sample_f, bounce_f, o, d, atten, alive_f, k_f,
                    pix_f, fi_r, fj_r, Vec3(gx, gy, gz))
        sample_f, bounce_f, o, d, atten, alive_f = state
        return (sample_f, bounce_f, o, d, atten, alive_f, zero_row,
                pix0, fi0, fj0, g0)

    def pack(sample_f, bounce_f, o, d, atten, alive_f, k_f, pix_f,
             fi_r, fj_r, g_r):
        if multi:
            return (sample_f, bounce_f, o, d, atten, alive_f, k_f,
                    pix_f, fi_r, fj_r, g_r.x, g_r.y, g_r.z)
        return (sample_f, bounce_f, o, d, atten, alive_f)

    def fwd_phase(state):
        """Park-and-advance until the window fills and live paths drain.
        Returns (W_end, state')."""
        (sample_f, bounce_f, o, d, atten, alive_f, k_f, pix_f, fi_r,
         fj_r, g_r) = unpack(state)

        # round-start regeneration: lanes idled by the previous round's
        # drain pull their next sample (their pixel rows are already
        # loaded — pulls happen at death below)
        has_work = sample_f < budget
        if multi:
            has_work = has_work & (k_f < kf_done)
        regen0 = (alive_f < 0.5) & has_work
        o_n, d_n = primary_from(cam_vals, fi_r, fj_r, to_u32(pix_f),
                                to_u32(sample_f))
        o = vec.where(regen0, o_n, o)
        d = vec.where(regen0, d_n, d)
        atten = vec.where(regen0, Vec3(one_row, one_row, one_row), atten)
        bounce_f = jnp.where(regen0, zero_row, bounce_f)
        alive_f = jnp.where(regen0, one_row, alive_f)

        def cond(c):
            w = c[0]
            alive_c = c[6]                      # pack index 5 (+1 for w)
            return (w < window + max_depth) & (jnp.max(alive_c) > 0.5)

        def body(c):
            w = c[0]
            (sample_f, bounce_f, o, d, atten, alive_f, k_f, pix_f,
             fi_r, fj_r, g_r) = unpack(c[1:])
            active = alive_f > 0.5
            hit_raw, wc, wr, walb, wfuzz, wior, wmat, sid = hit_fn(o, d)
            hit = hit_raw & active
            s_u = to_u32(sample_f)
            b_u = to_u32(bounce_f)
            pix_u = to_u32(pix_f)
            draws = _bounce_draws(pix_u, s_u, b_u, key, dtype,
                                  rr_start is not None)
            (o2, d2, at2, al2), _ = _winner_bounce(
                wc, wr, walb, wfuzz, wior, wmat, hit,
                o, d, atten, alive_f, pix_u, s_u, b_u, key, dtype,
                rr_start=rr_start, draws=draws,
            )
            # scattering at the depth cap exits black (camera.h:126-127)
            at_cap = (al2 > 0.5) & (bounce_f >= (max_depth - 1))
            al3 = jnp.where(at_cap, 0.0, al2).astype(dtype)
            dies = active & (al3 < 0.5)
            dies_f = jnp.where(dies, 1.0, 0.0).astype(dtype)

            st_ref[pl.ds(pl.multiple_of(w * _ST_ROWS, _ST_ROWS),
                         _ST_ROWS), :] = _wave_pack_residual(
                o, d, atten, alive_f, hit.astype(dtype),
                wc, wr, walb, wfuzz, wior, wmat, sid,
                dies_f, sample_f, bounce_f,
                *((pix_f, fi_r, fj_r, g_r) if multi else (None,) * 4),
                draws=draws,
            )

            # advance: continue, regenerate (window permitting), or idle
            continues = active & (al3 > 0.5)
            sample_next = sample_f + jnp.where(dies, one_row, zero_row)
            if multi:
                # pixel complete -> advance k and load the next pixel's
                # rows (bookkeeping only; the regeneration itself is
                # still window-gated)
                complete = dies & (sample_next >= budget)
                k_next = k_f + jnp.where(complete, one_row, zero_row)
                pull = complete & (k_next < kf_done)
                pix_f = jnp.where(pull, row_of(idsf_blk, k_next), pix_f)
                fi_r = jnp.where(pull, row_of(ii_blk, k_next), fi_r)
                fj_r = jnp.where(pull, row_of(jj_blk, k_next), fj_r)
                g_r = Vec3(
                    jnp.where(pull, row_of(g_blk.x, k_next), g_r.x),
                    jnp.where(pull, row_of(g_blk.y, k_next), g_r.y),
                    jnp.where(pull, row_of(g_blk.z, k_next), g_r.z),
                )
                k_f = k_next
                sample3 = jnp.where(
                    complete, jnp.full(shape, s_off_f, dtype),
                    jnp.where(dies, sample_next, sample_f),
                )
                work = (sample3 < budget) & (k_f < kf_done)
            else:
                sample3 = jnp.where(dies, sample_next, sample_f)
                work = sample3 < budget
            pull_ok = (w + 1) < window
            regen = dies & work & pull_ok
            o3 = vec.where(continues, o2, o)
            d3 = vec.where(continues, d2, d)
            at3 = vec.where(continues, at2, atten)
            o_n, d_n = primary_from(cam_vals, fi_r, fj_r, to_u32(pix_f),
                                    to_u32(sample3))
            o3 = vec.where(regen, o_n, o3)
            d3 = vec.where(regen, d_n, d3)
            at3 = vec.where(regen, Vec3(one_row, one_row, one_row), at3)
            bounce3 = jnp.where(continues, bounce_f + 1.0,
                                jnp.where(regen, zero_row, bounce_f))
            alive3 = jnp.where(continues | regen, 1.0, 0.0).astype(dtype)
            return (w + 1,) + pack(sample3, bounce3, o3, d3, at3,
                                   alive3, k_f, pix_f, fi_r, fj_r, g_r)

        init = (jnp.int32(0),) + pack(sample_f, bounce_f, o, d, atten,
                                      alive_f, k_f, pix_f, fi_r, fj_r,
                                      g_r)
        out = lax.while_loop(cond, body, init)
        return out[0], out[1:]

    def rev_phase(w_end, carry):
        """Walk parked waves w_end-1 .. 0; returns (d_scene, d_cam')."""
        d_scene0, d_cam0 = carry

        def body(i, c):
            d_scene, d_cam, ct_o, ct_d, ct_at, ct_al = c
            w = w_end - 1 - i
            blk = st_ref[pl.ds(pl.multiple_of(w * _ST_ROWS, _ST_ROWS),
                               _ST_ROWS), :]
            (o, d, atten, alive_f, hit_f, wc, wr, walb, wfuzz, wior,
             wmat, sid) = _unpack_residual(blk)
            r1 = lambda k: blk[k:k + 1, :]
            dies_f = r1(_R_DIES)
            sample_row = r1(_R_SAMPLE)
            bounce_row = r1(_R_BOUNCE)
            if multi:
                pix_row = r1(_R_PIX)
                fi_row = r1(_R_FI)
                fj_row = r1(_R_FJ)
                g_here = Vec3(r1(_R_GX), r1(_R_GY), r1(_R_GZ))
            else:
                pix_row, fi_row, fj_row, g_here = pix0, fi0, fj0, g0
            hit = hit_f > 0.5
            s_u = to_u32(sample_row)
            b_u = to_u32(bounce_row)
            pix_u = to_u32(pix_row)
            # parked detached draws: skip the Threefry replay entirely
            pk_draws = (Vec3(r1(_R_URX), r1(_R_URY), r1(_R_URZ)),
                        r1(_R_COIN), r1(_R_URR))

            # died-here rows end their path's chain: the incoming state
            # cotangent is zero (radiance flows in through ``g`` at every
            # bounce, as in the per-sample reverse)
            ended = dies_f > 0.5
            ct_o_in = vec.where(ended, zero3, ct_o)
            ct_d_in = vec.where(ended, zero3, ct_d)
            ct_at_in = vec.where(ended, zero3, ct_at)
            ct_al_in = jnp.where(ended, zero_row, ct_al)

            if "bounce_vjp" in _ABLATE:
                eps = jnp.asarray(1e-30, dtype)
                mix = (wc.x + wr + walb.x + wfuzz + wior + wmat
                       + o.x + d.x + atten.x + g_here.x) * eps
                d_wc = Vec3(ct_o_in.x + mix, ct_o_in.y, ct_o_in.z)
                d_walb = ct_at_in
                d_wr = d_wfuzz = d_wior = ct_al_in
                d_o, d_d, d_at, d_al = (ct_o_in, ct_d_in, ct_at_in,
                                        ct_al_in)
            else:
                def f(wc_, wr_, walb_, wfuzz_, wior_, o_, d_, at_, al_):
                    return _winner_bounce(
                        wc_, wr_, walb_, wfuzz_, wior_, wmat, hit,
                        o_, d_, at_, al_, pix_u, s_u, b_u, key, dtype,
                        rr_start=rr_start, draws=pk_draws,
                    )

                _, vjp_f = jax.vjp(f, wc, wr, walb, wfuzz, wior,
                                   o, d, atten, alive_f)
                (d_wc, d_wr, d_walb, d_wfuzz, d_wior,
                 d_o, d_d, d_at, d_al) = vjp_f(
                    ((ct_o_in, ct_d_in, ct_at_in, ct_al_in), g_here)
                )

            # winner cotangents -> (16, R) rows (scene-matrix col order)
            d_rows = jnp.concatenate(
                [d_wc.x, d_wc.y, d_wc.z, d_wr,
                 d_walb.x, d_walb.y, d_walb.z, d_wfuzz, d_wior]
                + [zero_row] * (NUM_COLS - 9),
                axis=0,
            )
            valid = hit & (alive_f > 0.5)
            sid_v = jnp.where(valid, sid, -1.0)
            d_scene = scatter_fn(d_rows, sid_v, d_scene)

            # path-start rows: o/d cotangents flow into the camera.
            # (NOT cond-gated on any-start: measured 315 -> 470 ms at
            # 640x384x16spp/d25 — the per-wave lax.cond costs far more
            # than the unconditional primary-ray vjp it skips, the same
            # law as the forward's pl.when flush gating. bwd_wave.jsonl
            # *_camgate rows.)
            start = (bounce_row < 0.5) & (alive_f > 0.5)

            if "cam_vjp" not in _ABLATE:
                def prim(cvals):
                    return primary_from(cvals, fi_row, fj_row, pix_u,
                                        s_u)

                _, vjp_p = jax.vjp(prim, cam_vals)
                ct_o_m = vec.where(start, d_o, zero3)
                ct_d_m = vec.where(start, d_d, zero3)
                (d_cam_vals,) = vjp_p((ct_o_m, ct_d_m))
                d_cam = tuple(d_cam[k] + d_cam_vals[k]
                              for k in range(_N_CAM))

            # carry to the previous wave; path boundaries cut the chain
            ct_o2 = vec.where(start, zero3, d_o)
            ct_d2 = vec.where(start, zero3, d_d)
            ct_at2 = vec.where(start, zero3, d_at)
            ct_al2 = jnp.where(start, zero_row, d_al)
            return (d_scene, d_cam, ct_o2, ct_d2, ct_at2, ct_al2)

        init = (d_scene0, d_cam0, zero3, zero3, zero3, zero_row)
        out = lax.fori_loop(0, w_end, body, init)
        return out[0], out[1]

    plen = 13 if multi else 6

    def outer_cond(c):
        (sample_f, _b, _o, _d, _at, alive_f, k_f, _p, _fi, _fj,
         _g) = unpack(c[:plen])
        work = sample_f < budget
        if multi:
            work = work & (k_f < kf_done)
        return (jnp.max(jnp.where(work, 1.0, 0.0)) > 0.5) | (
            jnp.max(alive_f) > 0.5
        )

    def outer_body(c):
        state = c[:plen]
        d_scene, d_cam = c[plen], c[plen + 1]
        w_end, state2 = fwd_phase(state)
        if "rev" not in _ABLATE:
            d_scene, d_cam = rev_phase(w_end, (d_scene, d_cam))
        return tuple(state2) + (d_scene, d_cam)

    zero_cam = tuple(jnp.zeros((), dtype) for _ in range(_N_CAM))
    init = pack(
        jnp.full(shape, s_off_f, dtype),                # sample_f
        zero_row,                                       # bounce_f
        zero3, zero3,                                   # o, d
        Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),   # atten
        zero_row,                                       # alive_f
        zero_row, pix0, fi0, fj0, g0,                   # k/pixel rows
    ) + (d_scene0, zero_cam)
    final = lax.while_loop(outer_cond, outer_body, init)
    return final[plen], final[plen + 1]


def _regen_render_k(
    hit_fn, cam, pixel_ids, fi, fj, key, acc_ref,
    *, samples: int, max_depth: int, dtype, rr_start=None,
    k_pixels: int, park_fn=None,
):
    """K-pixel regenerating render pass shared by the fused train
    kernels (the forward kernel's _regen_body_multi recurrence with the
    winner-replay bounce): lanes work K pixels sequentially, flushing
    each completed pixel's radiance into the (3K, R) ``acc_ref`` VMEM
    scratch. Per-pixel sums are bit-identical to K=1 (the per-lane
    accumulation order is unchanged; flushes add complete-pixel sums).

    ``hit_fn(o, d) -> (hit, wc, wr, walb, wfuzz, wior, wmat, sid)`` is
    the same closest-hit binding convention as _wave_grad_sweep — the
    VMEM (N, R) scan or the streaming HBM block walk. ``pixel_ids``,
    ``fi``, ``fj`` are the tile's (K, R) pixel blocks. Returns the
    (K, R) radiance Vec3 (views of acc_ref) — plus the wave count when
    parking (below).

    ``park_fn(w, blk)``: optional per-wave residual parking (the
    FULL-PARK fused step, _hbm_park_render) — called with the wave
    index and the packed (32, R) pre-bounce residual rows; a wave
    counter joins the carry and the function returns (acc, w_end).
    park_fn=None traces the exact historical recurrence (bit-identity
    with the non-parked fused render is pinned by
    test_fused_hbm_park_matches_wave)."""
    K = k_pixels
    r = pixel_ids.shape[1]
    rshape = (1, r)
    zero_row = jnp.zeros(rshape, dtype)
    one_row = jnp.ones(rshape, dtype)
    zero3r = Vec3.zeros(rshape, dtype=dtype)
    kf_done = float(K)
    budget_f = float(samples)
    idsf_blk = pltpu.bitcast(pixel_ids, jnp.int32).astype(dtype)
    parking = park_fn is not None

    def to_u32(f):
        return pltpu.bitcast(f.astype(jnp.int32), jnp.uint32)

    def row_of(blk, k_next):
        out = jnp.zeros(rshape, dtype)
        for k in range(K):
            out = out + jnp.where(k_next == float(k),
                                  blk[k:k + 1, :], zero_row)
        return out

    acc_ref[:, :] = jnp.zeros((3 * K, r), dtype)

    def cond(c):
        if parking:
            c = c[1:]
        sample_f, k_f, alive_f = c[0], c[2], c[9]
        work = (k_f < kf_done) & (sample_f < budget_f)
        return (jnp.max(jnp.where(work, 1.0, 0.0)) > 0.5) | (
            jnp.max(alive_f) > 0.5
        )

    def body(c):
        if parking:
            w, c = c[0], c[1:]
        (sample_f, bounce_f, k_f, pix_f, fi_r, fj_r, o, d, atten,
         alive_f, acc3) = c
        has_work = (k_f < kf_done) & (sample_f < budget_f)
        regen = (alive_f < 0.5) & has_work
        # primary draws for the CURRENT (pixel, sample) ids — used by
        # the regen ray AND parked (they are what the row's own path
        # start drew, whatever this row's bounce is)
        pdraws = primary_ray_draws(to_u32(pix_f), to_u32(sample_f),
                                   key, dtype)
        o_n, d_n = primary_rays_from_ij(
            cam, fi_r, fj_r, to_u32(pix_f), to_u32(sample_f), key,
            dtype, draws=pdraws,
        )
        o = vec.where(regen, o_n, o)
        d = vec.where(regen, d_n, d)
        atten = vec.where(regen, Vec3(one_row, one_row, one_row),
                          atten)
        bounce_f = jnp.where(regen, zero_row, bounce_f)
        alive_f = jnp.where(regen, one_row, alive_f)
        active = alive_f > 0.5

        hit_raw, wc, wr, walb, wfuzz, wior, wmat, sid = hit_fn(o, d)
        hit = hit_raw & active
        draws = _bounce_draws(to_u32(pix_f), to_u32(sample_f),
                              to_u32(bounce_f), key, dtype,
                              rr_start is not None)
        (o2, d2, at2, al2), contrib = _winner_bounce(
            wc, wr, walb, wfuzz, wior, wmat, hit,
            o, d, atten, alive_f, to_u32(pix_f), to_u32(sample_f),
            to_u32(bounce_f), key, dtype, rr_start=rr_start,
            draws=draws,
        )
        acc3 = acc3 + contrib
        # scattering at the depth cap exits black (camera.h:126-127)
        at_cap = (al2 > 0.5) & (bounce_f >= (max_depth - 1))
        al3 = jnp.where(at_cap, 0.0, al2).astype(dtype)
        dies = active & (al3 < 0.5)
        continues = active & (al3 > 0.5)

        if parking:
            dies_f = jnp.where(dies, 1.0, 0.0).astype(dtype)
            park_fn(w, _wave_pack_residual(
                o, d, atten, alive_f, hit.astype(dtype),
                wc, wr, walb, wfuzz, wior, wmat, sid,
                dies_f, sample_f, bounce_f,
                pix_f, fi_r, fj_r, Vec3(k_f, zero_row, zero_row),
                draws=draws, cam_draws=pdraws,
            ))

        sample_next = sample_f + jnp.where(dies, one_row, zero_row)
        complete = dies & (sample_next >= budget_f)

        # flush completed pixels' radiance into their (K, R) rows
        def mk_flush(val):
            return jnp.concatenate(
                [jnp.where(complete & (k_f == float(k)), val,
                           zero_row) for k in range(K)],
                axis=0,
            )

        acc_ref[0:K, :] = acc_ref[0:K, :] + mk_flush(acc3.x)
        acc_ref[K:2 * K, :] = acc_ref[K:2 * K, :] + mk_flush(acc3.y)
        acc_ref[2 * K:3 * K, :] = (acc_ref[2 * K:3 * K, :]
                                   + mk_flush(acc3.z))
        acc3 = vec.where(complete, zero3r, acc3)

        k_next = k_f + jnp.where(complete, one_row, zero_row)
        pull = complete & (k_next < kf_done)
        pix_f = jnp.where(pull, row_of(idsf_blk, k_next), pix_f)
        fi_r = jnp.where(pull, row_of(fi, k_next), fi_r)
        fj_r = jnp.where(pull, row_of(fj, k_next), fj_r)
        k_f = k_next
        sample3 = jnp.where(
            complete, zero_row,
            jnp.where(dies, sample_next, sample_f),
        )
        o3 = vec.where(continues, o2, o)
        d3 = vec.where(continues, d2, d)
        at3 = vec.where(continues, at2, atten)
        bounce3 = jnp.where(continues, bounce_f + 1.0, bounce_f)
        alive3 = jnp.where(continues, 1.0, 0.0).astype(dtype)
        out = (sample3, bounce3, k_f, pix_f, fi_r, fj_r,
               o3, d3, at3, alive3, acc3)
        return ((w + 1,) + out) if parking else out

    init = (
        jnp.zeros(rshape, dtype), jnp.zeros(rshape, dtype),
        jnp.zeros(rshape, dtype),
        idsf_blk[0:1, :], fi[0:1, :], fj[0:1, :],
        Vec3.zeros(rshape, dtype=dtype),
        Vec3.zeros(rshape, dtype=dtype),
        Vec3.full(rshape, 1.0, 1.0, 1.0, dtype=dtype),
        jnp.zeros(rshape, dtype),
        Vec3.zeros(rshape, dtype=dtype),
    )
    if parking:
        init = (jnp.int32(0),) + init
    final = lax.while_loop(cond, body, init)
    acc = Vec3(acc_ref[0:K, :], acc_ref[K:2 * K, :],
               acc_ref[2 * K:3 * K, :])
    return (acc, final[0]) if parking else acc


def _hbm_park_render(
    hit_fn, cam, pixel_ids, fi, fj, key, acc_ref, park_ref,
    stage0, stage1, sem0, sem1,
    *, samples: int, max_depth: int, dtype, rr_start=None,
    k_pixels: int,
):
    """Phase A of the FULL-PARK fused step: the K-pixel regenerating
    render (_regen_render_k's exact recurrence — bit-identical radiance)
    that ALSO parks every wave's pre-bounce state + winner rows to the
    HBM ``park_ref`` through a two-slot VMEM staging ring
    (double-buffered DMA: wave w waits the copy issued at wave w-2 on
    its slot, writes, and starts its own copy — DMA latency hides
    behind the ~4-9 us wave).

    Parked layout = _wave_pack_residual with the lane's CURRENT K index
    in the _R_GX slot (the g rows cannot be parked here — the upstream
    cotangent does not exist until the whole tile's render completes;
    the reverse re-selects g by the parked k instead).

    Mosaic cannot allocate HBM scratch ("only vmem, smem,
    semaphore_mem"), so ``park_ref`` is an extra kernel OUTPUT with
    memory_space=ANY that all grid steps share (sequential grid =
    sound reuse; its returned value is dropped by the host wrapper).
    Capacity must be the TRUE bound K*samples*max_depth waves: each
    lane advances one (pixel, sample, bounce) per wave, so a tile can
    never park more.

    Returns (acc Vec3 of (K, R) views, w_end int32). The render
    recurrence itself is _regen_render_k's (shared — bit-identity with
    the non-parked fused render is structural, not coincidental); this
    wrapper only owns the DMA staging ring."""

    def _hbm_slot(v):
        return park_ref.at[
            pl.ds(pl.multiple_of(v * _ST_ROWS, _ST_ROWS), _ST_ROWS), :
        ]

    def _park_copy(v, start):
        # slot parity picks the staging buffer + its semaphore
        @pl.when(v % 2 == 0)
        def _():
            cp = pltpu.make_async_copy(stage0, _hbm_slot(v), sem0)
            cp.start() if start else cp.wait()

        @pl.when(v % 2 == 1)
        def _():
            cp = pltpu.make_async_copy(stage1, _hbm_slot(v), sem1)
            cp.start() if start else cp.wait()

    def park_fn(w, blk):
        # wait the slot's previous copy (issued at wave w-2), stage,
        # start this wave's copy — DMA hides behind the next wave
        @pl.when(w >= 2)
        def _():
            _park_copy(w - 2, start=False)

        @pl.when(w % 2 == 0)
        def _():
            stage0[:, :] = blk

        @pl.when(w % 2 == 1)
        def _():
            stage1[:, :] = blk

        _park_copy(w, start=True)

    acc, w_end = _regen_render_k(
        hit_fn, cam, pixel_ids, fi, fj, key, acc_ref,
        samples=samples, max_depth=max_depth, dtype=dtype,
        rr_start=rr_start, k_pixels=k_pixels, park_fn=park_fn,
    )

    # drain the (up to two) outstanding park copies, oldest first
    @pl.when(w_end >= 2)
    def _():
        _park_copy(w_end - 2, start=False)

    @pl.when(w_end >= 1)
    def _():
        _park_copy(w_end - 1, start=False)

    return acc, w_end


def _hbm_reverse(
    scatter_fn, d_scene0, cam_vals, use_defocus, g_blk, key, w_end,
    park_ref, stage0, stage1, sem0, sem1,
    *, max_depth: int, dtype, rr_start=None, k_pixels: int,
):
    """Phase B of the full-park fused step: walk the parked waves
    w_end-1 .. 0 straight from HBM (two-slot prefetch: wave w's copy was
    started one iteration earlier; w-1's copy starts before w is
    processed). Reverse math is _wave_grad_sweep.rev_phase's, with the
    upstream cotangent re-selected per wave from the parked K index
    (row _R_GX) against the (K, R) cotangent block ``g_blk`` computed
    after the render. Returns (d_scene, d_cam 18-tuple)."""
    K = k_pixels
    r = g_blk.x.shape[1]
    shape = (1, r)
    zero_row = jnp.zeros(shape, dtype)
    zero3 = Vec3.zeros(shape, dtype=dtype)
    if "rev" in _ABLATE:   # before the first prefetch: no dangling DMA
        return d_scene0, tuple(jnp.zeros((), dtype)
                               for _ in range(_N_CAM))

    def to_u32(f):
        return pltpu.bitcast(f.astype(jnp.int32), jnp.uint32)

    def _hbm_slot(v):
        return park_ref.at[
            pl.ds(pl.multiple_of(v * _ST_ROWS, _ST_ROWS), _ST_ROWS), :
        ]

    def _fetch(v, start):
        @pl.when(v % 2 == 0)
        def _():
            cp = pltpu.make_async_copy(_hbm_slot(v), stage0, sem0)
            cp.start() if start else cp.wait()

        @pl.when(v % 2 == 1)
        def _():
            cp = pltpu.make_async_copy(_hbm_slot(v), stage1, sem1)
            cp.start() if start else cp.wait()

    def row_of(blk_v, k_row):
        out = jnp.zeros(shape, dtype)
        for k in range(K):
            out = out + jnp.where(k_row == float(k),
                                  blk_v[k:k + 1, :], zero_row)
        return out

    def primary_from(cvals, fi_r, fj_r, pix_u, s_u, draws=None):
        cam = _camera_from_scalars(cvals, use_defocus)
        return primary_rays_from_ij(cam, fi_r, fj_r, pix_u, s_u, key,
                                    dtype, draws=draws)

    @pl.when(w_end >= 1)
    def _():
        _fetch(w_end - 1, start=True)

    def body(i, c):
        d_scene, d_cam, ct_o, ct_d, ct_at, ct_al = c
        w = w_end - 1 - i
        _fetch(w, start=False)
        blk = jnp.where((w % 2) == 0, stage0[:, :], stage1[:, :])

        @pl.when(w >= 1)
        def _():
            _fetch(w - 1, start=True)

        (o, d, atten, alive_f, hit_f, wc, wr, walb, wfuzz, wior,
         wmat, sid) = _unpack_residual(blk)
        r1 = lambda k: blk[k:k + 1, :]
        dies_f = r1(_R_DIES)
        sample_row = r1(_R_SAMPLE)
        bounce_row = r1(_R_BOUNCE)
        pix_row = r1(_R_PIX)
        fi_row = r1(_R_FI)
        fj_row = r1(_R_FJ)
        k_row = r1(_R_GX)          # K index parked in the g.x slot
        g_here = Vec3(row_of(g_blk.x, k_row), row_of(g_blk.y, k_row),
                      row_of(g_blk.z, k_row))
        hit = hit_f > 0.5
        s_u = to_u32(sample_row)
        b_u = to_u32(bounce_row)
        pix_u = to_u32(pix_row)
        # parked detached draws: skip the Threefry replay entirely
        pk_draws = (Vec3(r1(_R_URX), r1(_R_URY), r1(_R_URZ)),
                    r1(_R_COIN), r1(_R_URR))
        pk_cam = (r1(_R_CU0), r1(_R_CU1), r1(_R_CPX), r1(_R_CPY))

        ended = dies_f > 0.5
        ct_o_in = vec.where(ended, zero3, ct_o)
        ct_d_in = vec.where(ended, zero3, ct_d)
        ct_at_in = vec.where(ended, zero3, ct_at)
        ct_al_in = jnp.where(ended, zero_row, ct_al)

        if "bounce_vjp" in _ABLATE:
            eps = jnp.asarray(1e-30, dtype)
            mix = (wc.x + wr + walb.x + wfuzz + wior + wmat
                   + o.x + d.x + atten.x + g_here.x) * eps
            d_wc = Vec3(ct_o_in.x + mix, ct_o_in.y, ct_o_in.z)
            d_walb = ct_at_in
            d_wr = d_wfuzz = d_wior = ct_al_in
            d_o, d_d, d_at, d_al = (ct_o_in, ct_d_in, ct_at_in,
                                    ct_al_in)
        else:
            def f(wc_, wr_, walb_, wfuzz_, wior_, o_, d_, at_, al_):
                return _winner_bounce(
                    wc_, wr_, walb_, wfuzz_, wior_, wmat, hit,
                    o_, d_, at_, al_, pix_u, s_u, b_u, key, dtype,
                    rr_start=rr_start, draws=pk_draws,
                )

            _, vjp_f = jax.vjp(f, wc, wr, walb, wfuzz, wior,
                               o, d, atten, alive_f)
            (d_wc, d_wr, d_walb, d_wfuzz, d_wior,
             d_o, d_d, d_at, d_al) = vjp_f(
                ((ct_o_in, ct_d_in, ct_at_in, ct_al_in), g_here)
            )

        d_rows = jnp.concatenate(
            [d_wc.x, d_wc.y, d_wc.z, d_wr,
             d_walb.x, d_walb.y, d_walb.z, d_wfuzz, d_wior]
            + [zero_row] * (NUM_COLS - 9),
            axis=0,
        )
        valid = hit & (alive_f > 0.5)
        sid_v = jnp.where(valid, sid, -1.0)
        d_scene = scatter_fn(d_rows, sid_v, d_scene)

        start = (bounce_row < 0.5) & (alive_f > 0.5)

        if "cam_vjp" not in _ABLATE:
            def prim(cvals):
                return primary_from(cvals, fi_row, fj_row, pix_u, s_u,
                                    draws=pk_cam)

            _, vjp_p = jax.vjp(prim, cam_vals)
            ct_o_m = vec.where(start, d_o, zero3)
            ct_d_m = vec.where(start, d_d, zero3)
            (d_cam_vals,) = vjp_p((ct_o_m, ct_d_m))
            d_cam = tuple(d_cam[k] + d_cam_vals[k]
                          for k in range(_N_CAM))

        ct_o2 = vec.where(start, zero3, d_o)
        ct_d2 = vec.where(start, zero3, d_d)
        ct_at2 = vec.where(start, zero3, d_at)
        ct_al2 = jnp.where(start, zero_row, d_al)
        return (d_scene, d_cam, ct_o2, ct_d2, ct_at2, ct_al2)

    zero_cam = tuple(jnp.zeros((), dtype) for _ in range(_N_CAM))
    init = (d_scene0, zero_cam, zero3, zero3, zero3, zero_row)
    out = lax.fori_loop(0, w_end, body, init)
    return out[0], out[1]


def _vmem_wave_bindings(scene_mat, cx, cy, cz, rc, active_col, dtype):
    """(hit_fn, scatter_fn, d_scene0) for _wave_grad_sweep over a
    VMEM-resident scene: the full (N, R) hit scan and the carried
    one-hot MXU scatter (the streaming backward injects the HBM block
    walk and a direct block-looped ref write instead)."""
    n, cols = scene_mat.shape
    iota_n = lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(dtype)

    def hit_fn(o, d):
        return _hit_winner(scene_mat, cx, cy, cz, rc, active_col, o, d)

    def scatter_fn(d_rows, sid_v, carry):
        if "scatter" in _ABLATE:
            return carry + (jnp.max(d_rows) + jnp.max(sid_v)) * 1e-30
        one_hot = (sid_v == iota_n).astype(dtype)
        if "scatter_mm" in _ABLATE:
            return carry + (jnp.max(one_hot) + jnp.max(d_rows)) * 1e-30
        return carry + _scatter_matmul(one_hot, d_rows)

    return hit_fn, scatter_fn, jnp.zeros((n, cols), dtype)


def _grad_tile_kernel_wave(
    ids_ref, ii_ref, jj_ref, gr_ref, gg_ref, gb_ref, scene_ref, cam_ref,
    dscene_ref, dcam_ref, st_ref,
    *, samples: int, max_depth: int, seed: int, dtype,
    sample_offset: int = 0, window: int = 32, rr_start=None,
    k_pixels: int = 1,
):
    """Wave-reversed regenerating gradient kernel (see _wave_grad_sweep)."""
    key = rtrng.key_from_seed(seed)
    (pixel_ids, fi, fj, scene_mat, cx, cy, cz, rc, active_col,
     cam_vals, use_defocus) = _read_tile_refs(
        ids_ref, ii_ref, jj_ref, scene_ref, cam_ref
    )
    # with k_pixels > 1 these are (K, R) blocks (BlockSpec (1, K, R))
    g = Vec3(gr_ref[0, :, :], gg_ref[0, :, :], gb_ref[0, :, :])
    hit_fn, scatter_fn, d_scene0 = _vmem_wave_bindings(
        scene_mat, cx, cy, cz, rc, active_col, dtype
    )
    d_scene, d_cam = _wave_grad_sweep(
        hit_fn, scatter_fn, d_scene0, cam_vals, use_defocus,
        pixel_ids, fi, fj, g, key, st_ref,
        samples=samples, max_depth=max_depth, dtype=dtype,
        sample_offset=sample_offset, window=window, rr_start=rr_start,
        k_pixels=k_pixels,
    )
    _write_grad_outputs(dscene_ref, dcam_ref, d_scene, d_cam, dtype)


def _grad_tile_kernel_hbm(
    ids_ref, ii_ref, jj_ref, gr_ref, gg_ref, gb_ref, scene_ref, cam_ref,
    dscene_ref, dcam_ref, park_ref,
    acc_ref, stage0, stage1, sem0, sem1,
    *, samples: int, max_depth: int, seed: int, dtype,
    rr_start=None, k_pixels: int = 1,
):
    """FULL-PARK standalone gradient kernel: the regenerating render
    recurrence parks every wave to HBM (_hbm_park_render) and the
    reverse walk replays it (_hbm_reverse) — no windows, no drain
    rounds, no re-trace. The upstream cotangent rows arrive as INPUTS
    here (g is per-pixel data for the standalone program, unlike the
    fused step where it must be derived from the finished render), so
    this is the fused kernel's phase A + phase B with the loss
    derivation dropped; the radiance accumulator is scratch."""
    key = rtrng.key_from_seed(seed)
    (pixel_ids, fi, fj, scene_mat, cx, cy, cz, rc, active_col,
     cam_vals, use_defocus) = _read_tile_refs(
        ids_ref, ii_ref, jj_ref, scene_ref, cam_ref
    )
    g_blk = Vec3(gr_ref[0, :, :], gg_ref[0, :, :], gb_ref[0, :, :])
    hit_fn, scatter_fn, d_scene0 = _vmem_wave_bindings(
        scene_mat, cx, cy, cz, rc, active_col, dtype
    )
    cam = _camera_from_scalars(cam_vals, use_defocus)
    _acc, w_end = _hbm_park_render(
        hit_fn, cam, pixel_ids, fi, fj, key, acc_ref, park_ref,
        stage0, stage1, sem0, sem1,
        samples=samples, max_depth=max_depth, dtype=dtype,
        rr_start=rr_start, k_pixels=k_pixels,
    )
    d_scene, d_cam = _hbm_reverse(
        scatter_fn, d_scene0, cam_vals, use_defocus, g_blk, key, w_end,
        park_ref, stage0, stage1, sem0, sem1,
        max_depth=max_depth, dtype=dtype, rr_start=rr_start,
        k_pixels=k_pixels,
    )
    _write_grad_outputs(dscene_ref, dcam_ref, d_scene, d_cam, dtype)


def _fused_tile_kernel(
    ids_ref, ii_ref, jj_ref, tr_ref, tg_ref, tb_ref, scene_ref, cam_ref,
    loss_ref, imr_ref, img_ref, imb_ref,
    dscene_ref, dcam_ref, *scratch,
    samples: int, max_depth: int, seed: int, dtype, gamma: bool,
    num_pixels: int, park_all: bool = False, sweep: str = "sample",
    window: int = 32, rr_start=None, k_pixels: int = 1,
    park: str = "", loss: str = "mse", huber_delta: float = 1.0,
):
    """Fused per-pixel-loss train step: ONE kernel computes the
    rendered tile, the loss-vs-target contribution (``loss``: 'mse' |
    'l1' | 'huber' | 'relmse'), AND the scene/camera cotangents.

    Three sweeps: (1) forward radiance accumulation (the render), (2) the
    in-kernel loss + upstream-cotangent chain (MSE through gamma and the
    1/spp scale), (3) the grad sweep with that cotangent. Replaces the
    two-program forward-then-backward train step — and because it is a
    single Mosaic kernel, the whole value_and_grad (plus an optimizer
    update) fits in ONE jitted program despite the compile service's
    one-kernel limit.

    ``park_all`` (auto when samples*depth*32*R residual rows fit VMEM):
    sweep 1 parks EVERY sample's per-bounce winner residuals (+ per-
    sample exit depths in SMEM), so sweep 3 is reverse-only — removing
    the second forward trace, ~1/3 of the fused cost. Identical
    arithmetic either way: sweep 3's recompute replays exactly what
    sweep 1 computed.

    ``sweep`` (when not park_all): 'wave' runs sweep 3 as the
    wave-reversed regenerating sweep (_wave_grad_sweep — removes the
    per-sample lane-max tail; the win grows with depth), 'sample' the
    original per-sample re-trace.

    ``k_pixels`` (wave sweep, not park_all): multi-pixel lanes for BOTH
    the regenerating render (per-pixel flush into a (3K, R) accumulator
    scratch, like the forward's _regen_body_multi) and the grad sweep.
    Per-pixel radiance is bit-identical to K=1 (per-lane accumulation
    order unchanged; flushes add complete-pixel sums).

    ``park`` = 'hbm': FULL parking at any scale — the render sweep
    parks every wave to an HBM buffer (extra ANY-space output, sized at
    the true K*samples*max_depth bound) through a double-buffered DMA
    staging ring, and the grad sweep is REVERSE-ONLY straight from HBM
    (_hbm_park_render/_hbm_reverse). Removes the fused kernel's
    re-trace entirely: cost = render+park + reverse instead of render +
    re-trace + reverse. The upstream cotangent g still needs the
    finished tile image, which is exactly why the reverse can only
    start after the render — parked rows carry the lane's K index and
    the reverse re-selects its g row from the post-render (K, R)
    cotangent block."""
    key = rtrng.key_from_seed(seed)
    park_hbm = park == "hbm"
    acc_ref = None
    park_ref = stage0 = stage1 = sem0 = sem1 = None
    if park_hbm:
        park_ref, acc_ref, stage0, stage1, sem0, sem1 = scratch
        st_ref = bexit_ref = None
    elif park_all:
        st_ref, bexit_ref = scratch
    else:
        bexit_ref = None
        if k_pixels > 1:
            st_ref, acc_ref = scratch
        else:
            (st_ref,) = scratch
    (pixel_ids, fi, fj, scene_mat, cx, cy, cz, rc, active_col,
     cam_vals, use_defocus) = _read_tile_refs(
        ids_ref, ii_ref, jj_ref, scene_ref, cam_ref
    )
    shape = pixel_ids.shape
    cam = _camera_from_scalars(cam_vals, use_defocus)

    # ---- sweep 1: forward radiance accumulation (residuals parked per
    # (sample, bounce) when park_all) --------------------------------
    def one_sample_fwd(s_i, acc):
        s_u = s_i.astype(jnp.uint32)
        o0, d0 = primary_rays_from_ij(cam, fi, fj, pixel_ids, s_u, key,
                                      dtype)

        # early exit once every lane is dead (dead bounces bank exactly
        # zero radiance) — same trip count as the grad sweep's forward
        def cond(st):
            b, _o, _d, _atten, alive_f, _acc3 = st
            return (b < max_depth) & (jnp.max(alive_f) > 0.5)

        def body(st):
            b, o, d, atten, alive_f, acc3 = st
            hit, wc, wr, walb, wfuzz, wior, wmat, sid = _hit_winner(
                scene_mat, cx, cy, cz, rc, active_col, o, d
            )
            if park_all:
                st_ref[pl.ds(pl.multiple_of(
                    (s_i * max_depth + b) * _ST_ROWS_SAMPLE,
                    _ST_ROWS_SAMPLE),
                    _ST_ROWS_SAMPLE), :] = _pack_residual(
                    o, d, atten, alive_f, hit.astype(dtype),
                    wc, wr, walb, wfuzz, wior, wmat, sid,
                )
            (o2, d2, at2, al2), contrib = _winner_bounce(
                wc, wr, walb, wfuzz, wior, wmat, hit,
                o, d, atten, alive_f, pixel_ids, s_u,
                b.astype(jnp.uint32), key, dtype, rr_start=rr_start,
            )
            return (b + 1, o2, d2, at2, al2, acc3 + contrib)

        init = (jnp.int32(0), o0, d0,
                Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
                jnp.ones(shape, dtype), acc)
        final = lax.while_loop(cond, body, init)
        if park_all:
            bexit_ref[s_i] = final[0]
        return final[5]

    def regen_render():
        """Regenerating render (the production forward's recurrence):
        lanes stream their samples back-to-back instead of paying each
        sample's lane-MAX path length — total waves drop from
        sum-of-per-sample-maxima to ~samples x E[path length]. Per-lane
        accumulation order is identical to the per-sample loop's
        (samples sequential, bounces in path order; idle lanes add
        exact +0.0), so the radiance — and hence loss/image/cotangent
        ``g`` — is BIT-IDENTICAL."""
        zero_row = jnp.zeros(shape, dtype)
        one_row = jnp.ones(shape, dtype)
        budget_f = float(samples)

        def to_u32(f):
            return pltpu.bitcast(f.astype(jnp.int32), jnp.uint32)

        def cond(c):
            sample_f, alive_f = c[0], c[5]
            return (jnp.max(jnp.where(sample_f < budget_f, 1.0, 0.0))
                    > 0.5) | (jnp.max(alive_f) > 0.5)

        def body(c):
            sample_f, bounce_f, o, d, atten, alive_f, acc3 = c
            # idle lanes with budget pull their next sample
            regen = (alive_f < 0.5) & (sample_f < budget_f)
            o_n, d_n = primary_rays_from_ij(
                cam, fi, fj, pixel_ids, to_u32(sample_f), key, dtype
            )
            o = vec.where(regen, o_n, o)
            d = vec.where(regen, d_n, d)
            atten = vec.where(regen, Vec3(one_row, one_row, one_row),
                              atten)
            bounce_f = jnp.where(regen, zero_row, bounce_f)
            alive_f = jnp.where(regen, one_row, alive_f)
            active = alive_f > 0.5

            hit_raw, wc, wr, walb, wfuzz, wior, wmat, sid = _hit_winner(
                scene_mat, cx, cy, cz, rc, active_col, o, d
            )
            hit = hit_raw & active
            (o2, d2, at2, al2), contrib = _winner_bounce(
                wc, wr, walb, wfuzz, wior, wmat, hit,
                o, d, atten, alive_f, pixel_ids, to_u32(sample_f),
                to_u32(bounce_f), key, dtype, rr_start=rr_start,
            )
            # scattering at the depth cap exits black (camera.h:126-127)
            at_cap = (al2 > 0.5) & (bounce_f >= (max_depth - 1))
            al3 = jnp.where(at_cap, 0.0, al2).astype(dtype)
            dies = active & (al3 < 0.5)
            continues = active & (al3 > 0.5)
            o3 = vec.where(continues, o2, o)
            d3 = vec.where(continues, d2, d)
            at3 = vec.where(continues, at2, atten)
            bounce3 = jnp.where(continues, bounce_f + 1.0, bounce_f)
            sample3 = sample_f + jnp.where(dies, one_row, zero_row)
            alive3 = jnp.where(continues, 1.0, 0.0).astype(dtype)
            return (sample3, bounce3, o3, d3, at3, alive3,
                    acc3 + contrib)

        init = (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                Vec3.zeros(shape, dtype=dtype),
                Vec3.zeros(shape, dtype=dtype),
                Vec3.full(shape, 1.0, 1.0, 1.0, dtype=dtype),
                jnp.zeros(shape, dtype),
                Vec3.zeros(shape, dtype=dtype))
        return lax.while_loop(cond, body, init)[6]

    w_end_hbm = None
    if park_hbm:
        acc, w_end_hbm = _hbm_park_render(
            lambda o, d: _hit_winner(scene_mat, cx, cy, cz, rc,
                                     active_col, o, d),
            cam, pixel_ids, fi, fj, key, acc_ref, park_ref,
            stage0, stage1, sem0, sem1,
            samples=samples, max_depth=max_depth, dtype=dtype,
            rr_start=rr_start, k_pixels=k_pixels,
        )
    elif park_all:
        # parking needs per-(sample, bounce) residual rows — keep the
        # per-sample loop (its lane-max tail is what the parked reverse
        # avoids re-tracing anyway)
        acc = lax.fori_loop(0, samples, one_sample_fwd,
                            Vec3.zeros(shape, dtype=dtype))
    elif k_pixels > 1:
        # K-pixel regenerating render (shared with the stream fused
        # kernel), flushing complete-pixel sums into the (3K, R) scratch
        acc = _regen_render_k(
            lambda o, d: _hit_winner(scene_mat, cx, cy, cz, rc,
                                     active_col, o, d),
            cam, pixel_ids, fi, fj, key, acc_ref,
            samples=samples, max_depth=max_depth, dtype=dtype,
            rr_start=rr_start, k_pixels=k_pixels,
        )
    else:
        acc = regen_render()

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
    # static per-pixel loss family (round 5): anything per-pixel-local
    # fuses the same way MSE does — the tile's cotangent is known the
    # moment its render finishes. loss/grad pairs below are the
    # standard subgradient conventions (L1: sign, 0 at 0; Huber:
    # clipped linear; relMSE: per-channel target-relative, the common
    # inverse-rendering robustifier for high-dynamic-range targets).
    if loss == "mse":
        loss_tile = w * jnp.sum(diff.x * diff.x + diff.y * diff.y
                                + diff.z * diff.z)
        g_img = diff * (2.0 * w)
    elif loss == "l1":
        loss_tile = w * jnp.sum(jnp.abs(diff.x) + jnp.abs(diff.y)
                                + jnp.abs(diff.z))
        g_img = Vec3(jnp.sign(diff.x) * w, jnp.sign(diff.y) * w,
                     jnp.sign(diff.z) * w)
    elif loss == "huber":
        hd = float(huber_delta)

        def _h(d):
            a = jnp.abs(d)
            return jnp.where(a <= hd, 0.5 * d * d, hd * (a - 0.5 * hd))

        loss_tile = w * jnp.sum(_h(diff.x) + _h(diff.y) + _h(diff.z))
        g_img = Vec3(jnp.clip(diff.x, -hd, hd) * w,
                     jnp.clip(diff.y, -hd, hd) * w,
                     jnp.clip(diff.z, -hd, hd) * w)
    elif loss == "relmse":
        eps = 1e-2     # standard relMSE floor; keeps black pixels finite

        def _den(t):
            return t * t + eps

        loss_tile = w * jnp.sum(diff.x * diff.x / _den(target.x)
                                + diff.y * diff.y / _den(target.y)
                                + diff.z * diff.z / _den(target.z))
        g_img = Vec3(diff.x * (2.0 * w) / _den(target.x),
                     diff.y * (2.0 * w) / _den(target.y),
                     diff.z * (2.0 * w) / _den(target.z))
    else:
        raise ValueError(f"unknown loss {loss!r}")
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

    # ---- sweep 3: reverse vjp sweep (reverse-only from the parked
    # residuals, or the shared re-trace + reverse grad sweep) -----------
    if park_hbm:
        _hf, scatter_fn, d_scene0 = _vmem_wave_bindings(
            scene_mat, cx, cy, cz, rc, active_col, dtype
        )
        d_scene, d_cam = _hbm_reverse(
            scatter_fn, d_scene0, cam_vals, use_defocus, g, key,
            w_end_hbm, park_ref, stage0, stage1, sem0, sem1,
            max_depth=max_depth, dtype=dtype, rr_start=rr_start,
            k_pixels=k_pixels,
        )
    elif park_all:
        n, cols = scene_mat.shape
        iota_n = lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(dtype)

        def one_sample_rev(s_i, carry):
            d_scene_acc, d_cam_acc = carry
            s_u = s_i.astype(jnp.uint32)

            def primary(vals):
                cam2 = _camera_from_scalars(vals, use_defocus)
                return primary_rays_from_ij(
                    cam2, fi, fj, pixel_ids, s_u, key, dtype
                )

            _, vjp_primary = jax.vjp(primary, cam_vals)
            d_scene, ct_o, ct_d = _reverse_sweep(
                st_ref, s_i * max_depth, bexit_ref[s_i], g, pixel_ids,
                s_u, key, dtype, n, cols, iota_n, rr_start=rr_start,
            )
            (d_cam_vals,) = vjp_primary((ct_o, ct_d))
            d_cam_new = tuple(
                d_cam_acc[k] + d_cam_vals[k] for k in range(_N_CAM)
            )
            return (d_scene_acc + d_scene, d_cam_new)

        zero_cam = tuple(jnp.zeros((), dtype) for _ in range(_N_CAM))
        d_scene, d_cam = lax.fori_loop(
            0, samples, one_sample_rev,
            (jnp.zeros((n, cols), dtype), zero_cam),
        )
    elif sweep == "wave":
        hit_fn, scatter_fn, d_scene0 = _vmem_wave_bindings(
            scene_mat, cx, cy, cz, rc, active_col, dtype
        )
        d_scene, d_cam = _wave_grad_sweep(
            hit_fn, scatter_fn, d_scene0, cam_vals, use_defocus,
            pixel_ids, fi, fj, g, key, st_ref,
            samples=samples, max_depth=max_depth, dtype=dtype,
            window=window, rr_start=rr_start, k_pixels=k_pixels,
        )
    else:
        d_scene, d_cam = _tile_grad_sweep(
            scene_mat, cx, cy, cz, rc, active_col, cam_vals, use_defocus,
            pixel_ids, fi, fj, g, key, st_ref,
            samples=samples, max_depth=max_depth, dtype=dtype,
            rr_start=rr_start,
        )
    _write_grad_outputs(dscene_ref, dcam_ref, d_scene, d_cam, dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init_loss():
        loss_ref[0, 0] = 0.0

    loss_ref[0, 0] = loss_ref[0, 0] + loss_tile


def _scatter_matmul(one_hot: jnp.ndarray, d_rows: jnp.ndarray):
    """Gradient scatter (N, R) one-hot @ (C, R) cotangent rows -> (N, C)
    at ~f32 precision for half of HIGHEST's cost.

    A DEFAULT-precision MXU matmul would round the cotangents to bf16
    (~2^-9 relative — interpret-mode tests cannot see it); HIGHEST
    splits BOTH operands bf16x6. The one-hot side is 0/1 — exact in
    bf16 — so splitting only the cotangent side into bf16 hi/lo/lo2
    (hi+lo+lo2 carries ~24 mantissa bits) and running ONE triple-width
    DEFAULT matmul recovers f32-exact scatters in 3 MXU passes.
    Measured: HIGHEST cost the d8 backward +21%; this costs ~half that.
    """
    cols = d_rows.shape[0]
    out = lax.dot_general(
        one_hot, _bf16x3_split(d_rows),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (N, 3C)
    return out[:, :cols] + out[:, cols:2 * cols] + out[:, 2 * cols:]


def _bf16x3_split(d_rows: jnp.ndarray) -> jnp.ndarray:
    """One-side bf16 hi/lo/lo2 limbs stacked on sublanes (3C, R) — the
    shared split behind both scatter matmuls. Clamp the hi term to
    max-finite bf16: an f32 value above it would round to inf and
    poison rem with NaN (NaN hygiene); the clipped difference lands in
    lo exactly. Subnormal rems flush to zero on TPU — absolute error
    <= ~1.2e-38, fine for cotangents."""
    f32 = jnp.float32
    bmax = jnp.asarray(3.3895313892515355e38, f32)
    hi = jnp.clip(d_rows, -bmax, bmax).astype(jnp.bfloat16).astype(f32)
    rem = d_rows - hi
    lo = jnp.clip(rem, -bmax, bmax).astype(jnp.bfloat16).astype(f32)
    lo2 = rem - lo
    return jnp.concatenate([hi, lo, lo2], axis=0)          # (3C, R)


def _scatter_matmul_t(one_hot: jnp.ndarray, d_rows: jnp.ndarray):
    """_scatter_matmul with the output TRANSPOSED: (C, N) not (N, C).

    The streaming backward accumulates into a (16, N) buffer: a (N, 16)
    VMEM array tiles to T(8,128), padding its 16 lanes to 128 — an 8x
    memory bloat (51 MB at 100k spheres, past the 16 MB scoped limit,
    which silently capped the streaming backward at ~25k spheres) —
    while (16, N) is lane-dense. Same one-side bf16x3 split and the
    same MXU pass count (the contraction is symmetric)."""
    cols = d_rows.shape[0]
    out = lax.dot_general(
        _bf16x3_split(d_rows), one_hot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (3C, N)
    return out[:cols] + out[cols:2 * cols] + out[2 * cols:]


def _prepare_grad_inputs(scene, cam_cfg, rows3, img_width, img_height,
                         ray_tile, pixel_order, mesh, dtype, kpl=1,
                         wave_ids=False):
    """Shared host-side setup for both grad entry points: tile-shaped
    lane->pixel maps, the (per-lane-permuted) payload rows (upstream
    cotangent or target image), and the packed scene/camera with the
    slot-id column stamped (the winner gather fetches sids for free).
    ``kpl`` pixels per lane -> (n_tiles, kpl, ray_tile) tile blocks
    (the wave sweep's multi-pixel lanes; mirrors the forward's
    _lane_setup)."""
    cam = initialize(cam_cfg, img_width, img_height)
    num_pixels = img_width * img_height
    n_shards = (
        int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    )
    padded = _round_up(num_pixels, kpl * ray_tile * n_shards)
    n_tiles = padded // (kpl * ray_tile)
    if (kpl > 1 or wave_ids) and padded >= (1 << 24):
        # multi-pixel lanes AND the wave sweep (any K) carry the current
        # pixel id as f32 — ids >= 2^24 would round silently and desync
        # the counter-based RNG streams
        raise ValueError(
            "pixels_per_lane > 1 and sweep='wave' support images with "
            "< 16M (padded) pixels only — pixel ids ride lanes as f32; "
            "use sweep='sample' with pixels_per_lane=1 for larger images"
        )

    ids = _order_ids(pixel_order, padded)
    ii = (ids % jnp.uint32(img_width)).astype(dtype)
    jj = (ids // jnp.uint32(img_width)).astype(dtype)
    ids2 = ids.reshape(n_tiles, kpl, ray_tile)
    ii2 = ii.reshape(n_tiles, kpl, ray_tile)
    jj2 = jj.reshape(n_tiles, kpl, ray_tile)

    flat = rows3.reshape(num_pixels, 3).astype(dtype)
    pad = jnp.zeros((padded, 3), dtype).at[:num_pixels].set(flat)
    if pixel_order is not None:
        pad = pad[ids.astype(jnp.int32)]       # lane i's pixel is ids[i]
    rows = tuple(
        pad[:, k].reshape(n_tiles, kpl, ray_tile) for k in range(3)
    )

    scene_mat = pack_scene_matrix(scene, dtype)
    n_spheres = scene_mat.shape[0]
    scene_mat = scene_mat.at[:, COL_SID].set(
        jnp.arange(n_spheres, dtype=dtype)
    )
    cam_row = pack_camera(cam, dtype)
    return (ids, ids2, ii2, jj2, rows, scene_mat, cam_row, n_spheres,
            num_pixels, padded, n_tiles)


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
    ray_tile=None,
    pixel_order=None,
    sample_offset: int = 0,
    mesh=None,
    interpret: bool = False,
    sweep: str = "wave",
    window: int = 0,
    rr_start=None,
    pixels_per_lane=None,
    park=None,
):
    """Cotangents (d_scene_matrix (N,16), d_camera_row (1,24)) for an
    upstream cotangent ``g_acc`` (H, W, 3) expressed in the ACCUMULATED
    radiance domain (i.e. before the 1/spp scale and gamma — callers chain
    those on the host; see pallas_kernel.make_diff_render).

    ``sample_offset``: first global sample id of this sweep's window —
    cotangents are sums over samples, so chunked calls over disjoint
    windows add up exactly (keeps each dispatch under the ~100 s worker
    ceiling at very high spp).

    ``pixel_order``: optional permutation of pixel ids (as in
    render_pallas) — grouping pixels by expected path depth lets whole
    tiles hit the all-dead early exit together. Scene/camera cotangents
    are order-invariant up to float reassociation (tile-sum order).

    ``sweep``: 'wave' (default) = the regenerating wave-reversed sweep
    (_grad_tile_kernel_wave — lanes stream samples like the forward
    kernel, windows of parked waves are walked backward; removes the
    per-sample lane-max tail that made the d50 backward ~12x the
    forward); 'sample' = the original per-sample sweep. Same gradients
    up to float reassociation. ``window``: parked waves per round for
    'wave' (0 = auto by VMEM budget).

    ``rr_start``: differentiate the Russian-roulette estimator from that
    bounce (must match the forward render's rr_start — identical RNG
    streams make the replayed survival decisions bitwise the forward's).
    RR shortens paths, so the backward speeds up with the forward.

    ``park`` (None = auto): 'hbm' = FULL-PARK — the regenerating sweep
    parks every wave to an HBM buffer and the reverse walk replays it
    (the fused step's round-4 mechanism; _hbm_park_render/_hbm_reverse
    with the cotangent as an input): no windows, no drain rounds, no
    re-trace. Auto-selected whenever sweep='wave', sample_offset == 0,
    no explicit ``window`` was given, and the K*spp*depth*40-row
    buffer fits the HBM budget (K integer-fit). False = never.

    ``pixels_per_lane`` (wave sweep only): K pixels per lane, worked
    sequentially — the forward kernel's multi-pixel lanes applied to
    the backward: averages the per-lane total-work statistic that sets
    each window drain's tail. Same gradients (streams key on pixel id;
    assignment is bookkeeping) up to reassociation. None = auto:
    K=16 — the measured knee (640x384x16spp rt512: d8 311 -> 206 ms,
    d25 428 -> 249, bwd_wave.jsonl K-ladder) — shrunk for images too
    small to fill K*ray_tile lanes per shard."""
    if sweep not in ("wave", "sample"):
        raise ValueError("sweep must be 'wave' or 'sample'")
    if park not in (None, False, "hbm"):
        raise ValueError("park must be None (auto), False, or 'hbm'")
    if ray_tile is None:
        # auto (round-5 hardware ladder, standalone_ab.jsonl): under
        # FULL-PARK rt1024 wins at every measured shape up to d25
        # (640x384x16spp d8 173.7 vs rt512 186.0, d25 189.9 vs 209.6;
        # headline 1280x768x100spp/d25 4002 vs 4452 ms, rr2 3019 vs
        # 3320 — no parking window to squeeze); at d50/500spp the knee
        # flips slightly (rt512 12.83 s vs rt1024 13.05, grads_d50
        # rows) — the deep residual working set squeezes the larger
        # tile, same direction as the windowed d50 rule. The WINDOWED
        # sweep keeps the rt512 knee everywhere (rt512/w128 312 ms vs
        # rt1024/w32 365, bwd_wave.jsonl): a smaller tile buys a
        # deeper window under the same VMEM scratch budget.
        # the SAME eligibility predicate gates the actual hbm_park
        # decision below — _park_eligible is computed once so the two
        # can never drift (round-5 review)
        _budget = hbm_budget()
        _park_eligible = (
            sweep == "wave" and sample_offset == 0 and park is not False
            and not window
        )
        ray_tile = 1024 if (
            _park_eligible and max_depth <= 28
            and samples_per_pixel * max_depth * _ST_ROWS * 1024 * 4
            <= _budget
        ) else 512
    else:
        _budget = hbm_budget()
        _park_eligible = (
            sweep == "wave" and sample_offset == 0 and park is not False
            and not window
        )
    rr_start = rtrng.validate_rr_start(rr_start)
    # FULL-PARK auto (round 4.2): park every wave to an HBM buffer and
    # run the reverse walk straight from it — the standalone analog of
    # the fused step's mode (same _hbm_park_render/_hbm_reverse; the
    # cotangent is an input here). Removes the windowed sweep's
    # re-trace rounds entirely. Requires sample_offset == 0 (the park
    # recurrence regenerates from sample 0) and sweep='wave' semantics.
    hbm_park = False
    # an explicit window opts into the windowed sweep (its only knob)
    if _park_eligible:
        _k_fit = max(1, int(_budget
                            // (samples_per_pixel * max_depth
                                * _ST_ROWS * ray_tile * 4)))
        _k1_fits = (samples_per_pixel * max_depth * _ST_ROWS
                    * ray_tile * 4 <= _budget)
        if park == "hbm" or _k1_fits:
            hbm_park = _k1_fits
            if park == "hbm" and not _k1_fits:
                raise ValueError(
                    "park='hbm' needs a K*spp*depth*40-row park buffer "
                    "within the HBM budget; lower ray_tile/spp/depth"
                )
    elif park == "hbm":
        raise ValueError(
            "park='hbm' requires sweep='wave' and sample_offset == 0 "
            "(the park recurrence regenerates from sample 0)"
        )
    if pixels_per_lane is None:
        if sweep == "wave":
            n_shards = (
                int(np.prod(list(mesh.shape.values())))
                if mesh is not None else 1
            )
            per = max(1, (img_width * img_height)
                      // (ray_tile * n_shards))
            pixels_per_lane = 1
            while pixels_per_lane < 16 and pixels_per_lane * 2 <= per:
                pixels_per_lane *= 2
        else:
            pixels_per_lane = 1
    if hbm_park:
        # integer fit, as in mse_train_pallas (K3-style non-doublings);
        # K cap 8 under full-park (round-5 ladder: grads_park rr2
        # headline K8 2977 vs K16 3020 ms, standalone_ab.jsonl)
        pixels_per_lane = min(pixels_per_lane, _k_fit, 8)
    if pixels_per_lane > 1 and sweep != "wave":
        raise ValueError("pixels_per_lane > 1 requires sweep='wave'")
    (ids, ids2, ii2, jj2, (gr, gg, gb), scene_mat, cam_row, n_spheres,
     num_pixels, padded, n_tiles) = _prepare_grad_inputs(
        scene, cam_cfg, g_acc, img_width, img_height, ray_tile,
        pixel_order, mesh, dtype, kpl=pixels_per_lane,
        wave_ids=(sweep == "wave"),
    )

    scratch_waves = 0
    if hbm_park:
        kernel = functools.partial(
            _grad_tile_kernel_hbm,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            dtype=dtype,
            rr_start=rr_start,
            k_pixels=pixels_per_lane,
        )
    elif sweep == "wave":
        if not window:
            # scratch budget ~10 MB: rows = window + max_depth waves of
            # (32, ray_tile) f32 (a path pulled at the window edge still
            # parks <= max_depth more waves while draining). Measured
            # knee at 640x384x16spp/d25: rt512 w64 339 ms -> w96 318 ->
            # w128 312 (10 MB, fits beside the (N, R) scan); rt1024
            # plateaus worse (w16 427, w32 365) — bwd_wave.jsonl.
            budget_waves = int(10e6 // (_ST_ROWS * ray_tile * 4))
            window = max(8, budget_waves - max_depth)
        scratch_waves = window + max_depth
        kernel = functools.partial(
            _grad_tile_kernel_wave,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            dtype=dtype,
            sample_offset=sample_offset,
            window=window,
            rr_start=rr_start,
            k_pixels=pixels_per_lane,
        )
    else:
        scratch_waves = max_depth
        kernel = functools.partial(
            _grad_tile_kernel,
            samples=samples_per_pixel,
            max_depth=max_depth,
            seed=seed,
            dtype=dtype,
            sample_offset=sample_offset,
            rr_start=rr_start,
        )

    def run(ids_arr, ii_arr, jj_arr, g_r, g_g, g_b, scene_m, cam_r):
        tiles = ids_arr.shape[0]
        row_spec = pl.BlockSpec((1, pixels_per_lane, ray_tile),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        acc_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
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
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ) + ((pl.BlockSpec(memory_space=pltpu.HBM),)
                 if hbm_park else ()),
            out_shape=(
                jax.ShapeDtypeStruct((n_spheres, NUM_COLS), dtype),
                jax.ShapeDtypeStruct((1, _CAM_COLS), dtype),
            ) + ((jax.ShapeDtypeStruct(
                (pixels_per_lane * samples_per_pixel * max_depth
                 * _ST_ROWS, ray_tile), dtype),)
                if hbm_park else ()),
            scratch_shapes=(
                [
                    pltpu.VMEM((3 * pixels_per_lane, ray_tile), dtype),
                    pltpu.VMEM((_ST_ROWS, ray_tile), dtype),
                    pltpu.VMEM((_ST_ROWS, ray_tile), dtype),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ]
                if hbm_park
                else [
                    pltpu.VMEM((scratch_waves
                                * (_ST_ROWS if sweep == "wave"
                                   else _ST_ROWS_SAMPLE), ray_tile),
                               dtype),
                ]
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(
                    2 * samples_per_pixel * max_depth * padded
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
            # over all pixels -> all-reduce over the mesh (rides ICI);
            # the park buffer (if any) stays per-shard
            return tuple(lax.psum(o, axes) for o in outs[:2]) + tuple(
                outs[2:]
            )

        sharded = shard_map(
            run_psum, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes),
                      P(axes), P(axes), P(axes), P(), P()),
            out_specs=(P(), P()) + ((P(axes),) if hbm_park else ()),
            check_vma=False,
        )
        outs = sharded(ids2, ii2, jj2, gr, gg, gb, scene_mat, cam_row)
    else:
        outs = run(ids2, ii2, jj2, gr, gg, gb, scene_mat, cam_row)

    # d_sm's mat/active/sid columns are structurally zero (d_rows pads
    # them); pack_scene_matrix's vjp drops spare-column cotangents
    # anyway. outs[2] (hbm park buffer) is scratch-by-contract: dropped.
    return outs[:2]


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
    ray_tile=None,
    pixel_order=None,
    mesh=None,
    interpret: bool = False,
    park_residuals=None,
    sweep=None,
    window: int = 0,
    rr_start=None,
    pixels_per_lane=None,
    tile_chunk=None,
    loss: str = "mse",
    huber_delta: float = 1.0,
):
    """Fused per-pixel-loss train step: ONE Mosaic kernel returning
    ``(loss, image, d_scene_matrix, d_camera_row)`` against a target
    image (H, W, 3).

    ``loss`` selects the per-pixel loss family (round 5) — anything
    per-pixel-local fuses exactly like MSE (the tile's cotangent is
    known the moment its render finishes):
      'mse'    mean((img - target)^2)                       [default]
      'l1'     mean(|img - target|)            (sign subgradient, 0@0)
      'huber'  mean(huber_{huber_delta}(img - target))
      'relmse' mean((img - target)^2 / (target^2 + 1e-2))  — the
               standard HDR inverse-rendering robustifier
    All means are over num_pixels*3 channels; chunked/tiled partial
    sums stay exact for every member (they are pixel sums).

    ``tile_chunk=(start, count)``: process only that static range of
    ray tiles — the escape hatch for configs where one full-frame
    dispatch would exceed the ~100 s TPU-worker ceiling
    (UPSTREAM_ISSUES #10; e.g. the configs[4] shape at 1000 spp).
    Loss/grads come back as PARTIAL sums over the chunk's tiles
    (normalizations stay global, so chunk outputs ADD exactly) and the
    image as raw (count, K, R) lane rows; ``mse_train_pallas_tiled``
    drives the loop and reassembles. Incompatible with ``mesh``.

    loss = mean((render - target)^2) over all pixel channels, with the
    render going through the standard 1/spp + gamma postprocess in-kernel.
    Compared with make_diff_render's two-program custom_vjp path this
    saves the separate forward program (the backward kernel re-traces
    forward anyway) and — because the whole value-and-grad is one
    kernel — composes with an optimizer update inside a single jit
    despite the compile service's one-Mosaic-kernel-per-program limit.
    Callers chain the cotangents to parameter pytrees with
    ``chain_to_params``.

    ``park_residuals`` (None = auto): park ALL samples' per-bounce
    winner residuals in sweep 1 so the grad sweep is reverse-only —
    removes the fused kernel's second forward trace. Needs a
    (samples * max_depth * 32, ray_tile) VMEM scratch, so it only fits
    shallow-depth/low-spp steps. Auto gate: residuals <= 6 MB AND the
    step is in parking's measured win region — depth <= 6, or a frame
    too small for the wave sweep's multi-pixel lanes (K < 8). With K16
    lanes the wave sweep wins from d8 up (fused_wave.jsonl,
    640x384x16spp: d4 park 120 vs wave 144; d8 183 vs 153; d12 225 vs
    154 ms). Identical values either way. An explicit
    ``park_residuals=True`` that cannot fit the 16 MB scoped-VMEM
    limit raises instead of crashing the compile service.

    ``park_residuals="hbm"``: FULL parking at any scale — the render
    sweep parks every wave to an HBM buffer (an extra ANY-space kernel
    output sized at the true K*samples*max_depth wave bound; ~2.6 GB at
    the 1280x768x100spp/d25/K16 headline) via double-buffered DMA, and
    the grad sweep runs REVERSE-ONLY from it: render + reverse instead
    of render + re-trace + reverse. Same image bit-exactly; gradients
    equal up to reassociation (test_fused_hbm_park_matches_wave).

    ``ray_tile=None`` selects tile and parking jointly: when parking is
    preferred (see above) auto walks rt1024 -> rt256 looking for a
    parking fit (fused_park.jsonl, 16spp: d4 119 vs 142 ms); otherwise
    rt512 + the wave sweep (the standalone wave backward's measured
    knee, which also bounds the wave residual scratch under the
    scoped-VMEM budget).

    ``sweep`` (None = auto): when parking does not fit, sweep 3 runs as
    the wave-reversed regenerating sweep ('wave', _wave_grad_sweep) —
    the same rebuild that took the standalone backward kernel from 650
    to 315 ms at d25 (bwd_wave.jsonl) — with ``window`` parked waves per
    round (0 = auto by the same 10 MB scratch budget as
    render_pallas_grads). 'sample' forces the original per-sample
    re-trace. Ignored when park_residuals is on (sweep 3 is
    reverse-only from the parked residuals) — so an EXPLICIT sweep also
    disables the full-park auto (passing sweep without
    park_residuals=False would otherwise be silently overridden)."""
    hbm_park = park_residuals == "hbm"
    if hbm_park:
        park_residuals = False      # the VMEM-park branches stay off

    def _park_fits(rt: int, budget: int) -> bool:
        if hbm_park:
            return False
        park_bytes = (samples_per_pixel * max_depth
                      * _ST_ROWS_SAMPLE * rt * 4)
        scan_bytes = scene.num_slots * rt * 4 * 8  # ~8 (N,R) temps
        return park_bytes + scan_bytes <= budget

    # 10 MB of the 16 MB scoped-VMEM budget for residuals + scan temps
    # (measured fit: d8/16spp/rt512 = 9.0 MB compiles and runs)
    _AUTO_BUDGET = 10 * 2**20
    # Parking beats the wave sweep only at shallow depth now that the
    # wave sweep has multi-pixel lanes (fused_wave.jsonl, 640x384x16spp:
    # d4 park 120 vs waveK16 144; d8 183 vs 153; d12 225 vs 154 ms) —
    # and only when the image has enough pixels per lane for K>=8
    # (small frames keep K small, where parking's old wins stand:
    # fused_park.jsonl d8 181 vs waveK1 234).
    n_shards = (
        int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    )
    # K estimate for the park-vs-wave gate uses the tile the wave sweep
    # would actually run at: the caller's explicit ray_tile, else the
    # auto default 512 — so the gate and the pixels_per_lane chosen
    # below always agree
    _rt_est = ray_tile if ray_tile is not None else 512
    _per_tile = max(1, (img_width * img_height) // (_rt_est * n_shards))
    _k_est = 1
    while _k_est < 16 and _k_est * 2 <= _per_tile:
        _k_est *= 2
    prefer_park = max_depth <= 6 or _k_est < 8

    # FULL-PARK auto (round 4): park every wave to an HBM buffer and run
    # the grad sweep reverse-only — measured fastest at every scale
    # (hbm_park.jsonl: 640x384x16spp d4 109 ms vs park_all 118, d6 116
    # vs 153, d25 116 vs wave 164; headline d25/100spp 3.26 s vs wave
    # 5.51; north-star d50/500spp 28.3 Mrays/s vs 16.8 two-program).
    # Picked BEFORE the VMEM-park/wave autos, whenever the TRUE-bound
    # buffer (K*spp*depth waves — a lane advances one (pixel, sample,
    # bounce) per wave, so a tile can never park more) fits the HBM
    # budget, shrinking K to fit (north-star: K16 would need 26 GB; K4
    # fits and measured best anyway, 28.3 vs K1's 25.3 Mrays/s).
    _budget = hbm_budget()

    def _k_fit_hbm(rt: int) -> int:
        return max(1, int(_budget
                          // (samples_per_pixel * max_depth
                              * _ST_ROWS * rt * 4)))

    # full-park auto only when the caller constrained NONE of park /
    # sweep / window: an explicit sweep OR window request must not be
    # silently overridden by park='hbm' (which ignores both) —
    # ADVICE r4 + round-5 review (render_pallas_grads has the same
    # 'not window' gate)
    if (not hbm_park and park_residuals is None and sweep is None
            and not window):
        _rt_hbm = ray_tile
        if _rt_hbm is None:
            # full-park has NO parking window, so the windowed path's
            # depth<=28 tile rule does not apply: rt1024 wins at ANY
            # depth once >= 2 pixels/lane fit the buffer
            # (hbm_park.jsonl hbmpark_knobs, d50 rr2: 500spp rt1024/K3
            # 12.49 s vs rt512/K4 13.59; 100spp rt1024/K8 2.471 s vs
            # rt512/K16 2.748). K1 shapes (the configs[4] tiled driver)
            # keep rt512.
            _rt_hbm = 512
            _k_cap = (pixels_per_lane if pixels_per_lane is not None
                      else _k_fit_hbm(1024))
            if img_width * img_height >= 500_000 and _k_cap >= 2:
                _rt_hbm = 1024
        _k_hbm = pixels_per_lane
        if _k_hbm is None:
            per = max(1, (img_width * img_height)
                      // (_rt_hbm * n_shards))
            _k_hbm = 1
            # K cap 8 under FULL-PARK (round-5 ladder: K8 beats K16 at
            # every parked shape — headline 2.837 vs 2.883 s, d50/
            # 100spp 2.471 vs 2.748, small frames tie-or-win; the
            # windowed wave sweep keeps its measured K16 knee)
            while _k_hbm < 8 and _k_hbm * 2 <= per:
                _k_hbm *= 2
            # integer fit, not doubling-shrink: the 500spp/d50 buffer
            # admits K3 at rt1024 (12.3 GB) and K3 measures +4% over K2
            _k_hbm = min(_k_hbm, _k_fit_hbm(_rt_hbm))
        if (_k_hbm * samples_per_pixel * max_depth * _ST_ROWS
                * _rt_hbm * 4 <= _budget):
            hbm_park = True
            park_residuals = False
            pixels_per_lane = _k_hbm
            ray_tile = _rt_hbm

    if ray_tile is None:
        # rt512 is the wave sweep's measured knee on the standalone
        # grad kernel (rt512/w128 312 ms vs rt1024/w32 365,
        # bwd_wave.jsonl), which also halves the wave residual scratch
        # and the (N, R) scan working set under the 16 MB scoped-VMEM
        # budget. At HEADLINE scale with shallow-enough depth the knee
        # moves: 1280x768x100spp/d25 measured fused rt1024 5.505 s vs
        # rt512 5.734 (fused_headline.jsonl, round 4) — big frames have
        # no tile-count shortage and the larger tile amortizes per-wave
        # fixed work; deep configs (d50) keep rt512 (the rt1024 window
        # shrinks to ~26 waves under the 10 MB scratch budget and
        # measured 3.86 vs 3.12 s, bwd_d50.jsonl).
        ray_tile = 512
        if max_depth <= 28 and img_width * img_height >= 500_000:
            ray_tile = 1024
        if (park_residuals is None and sweep is None and not window
                and prefer_park):
            for rt in (1024, 512, 256):
                if _park_fits(rt, _AUTO_BUDGET):
                    ray_tile, park_residuals = rt, True
                    break
    if park_residuals is None:
        # same rule as the full-park auto: parking ignores sweep AND
        # window, so an explicit value for either disables the park
        # autos (ADVICE r4 + round-5 review)
        park_residuals = (sweep is None and not window and prefer_park
                          and _park_fits(ray_tile, _AUTO_BUDGET))
    elif park_residuals and not _park_fits(ray_tile, 14 * 2**20):
        raise ValueError(
            f"park_residuals=True needs a ({samples_per_pixel}*"
            f"{max_depth}*{_ST_ROWS_SAMPLE}, {ray_tile}) f32 VMEM scratch plus "
            f"the (N, R) scan working set — exceeds the 16 MB scoped-VMEM "
            f"budget; lower ray_tile/samples/depth or leave it on auto"
        )
    if sweep is None:
        sweep = "sample" if park_residuals else "wave"
    if sweep not in ("wave", "sample"):
        raise ValueError("sweep must be 'wave' or 'sample'")
    rr_start = rtrng.validate_rr_start(rr_start)
    if sweep == "wave" and not park_residuals and not window:
        # same scratch budget as render_pallas_grads' auto window
        budget_waves = int(10e6 // (_ST_ROWS * ray_tile * 4))
        window = max(8, budget_waves - max_depth)
    if pixels_per_lane is None:
        if sweep == "wave" and not park_residuals:
            n_sh = (
                int(np.prod(list(mesh.shape.values())))
                if mesh is not None else 1
            )
            per = max(1, (img_width * img_height) // (ray_tile * n_sh))
            pixels_per_lane = 1
            while pixels_per_lane < 16 and pixels_per_lane * 2 <= per:
                pixels_per_lane *= 2
            if hbm_park:
                # explicit park_residuals='hbm': shrink K so the
                # true-bound buffer stays allocatable (integer fit)
                pixels_per_lane = min(pixels_per_lane,
                                      _k_fit_hbm(ray_tile))
        else:
            pixels_per_lane = 1
    if pixels_per_lane > 1 and (park_residuals or sweep != "wave"):
        raise ValueError(
            "pixels_per_lane > 1 requires sweep='wave' without parking"
        )
    if hbm_park and (pixels_per_lane * samples_per_pixel * max_depth
                     * _ST_ROWS * ray_tile * 4 > _budget):
        # mirror render_pallas_grads: fail fast instead of attempting a
        # >12.5 GiB HBM allocation at runtime (ADVICE r4)
        raise ValueError(
            f"park_residuals='hbm' needs a ({pixels_per_lane}*"
            f"{samples_per_pixel}*{max_depth}*{_ST_ROWS}, {ray_tile}) f32 "
            f"park buffer within the {_budget / 2**30:.1f} GiB HBM "
            f"budget; lower pixels_per_lane/ray_tile/samples/depth or "
            f"leave them on auto"
        )
    (ids, ids2, ii2, jj2, (tr, tg, tb), scene_mat, cam_row, n_spheres,
     num_pixels, padded, n_tiles) = _prepare_grad_inputs(
        scene, cam_cfg, target, img_width, img_height, ray_tile,
        pixel_order, mesh, dtype, kpl=pixels_per_lane,
        wave_ids=(sweep == "wave" and not park_residuals),
    )

    kernel = functools.partial(
        _fused_tile_kernel,
        samples=samples_per_pixel,
        max_depth=max_depth,
        seed=seed,
        dtype=dtype,
        gamma=gamma,
        num_pixels=num_pixels,
        park_all=park_residuals,
        sweep=sweep,
        window=window,
        rr_start=rr_start,
        k_pixels=pixels_per_lane,
        park=("hbm" if hbm_park else ""),
        loss=loss,
        huber_delta=huber_delta,
    )
    # full-park HBM buffer: the TRUE per-tile wave bound (each lane
    # advances one (pixel, sample, bounce) per wave)
    hbm_waves = pixels_per_lane * samples_per_pixel * max_depth

    if tile_chunk is not None and mesh is not None:
        raise ValueError("tile_chunk is incompatible with mesh")

    def run(ids_arr, ii_arr, jj_arr, t_r, t_g, t_b, scene_m, cam_r):
        tiles = ids_arr.shape[0]
        t0_chunk = 0
        if tile_chunk is not None:
            t0_chunk, tiles = tile_chunk
        row_spec = pl.BlockSpec((1, pixels_per_lane, ray_tile),
                                lambda i: (i + t0_chunk, 0, 0),
                                memory_space=pltpu.VMEM)
        out_row_spec = pl.BlockSpec((1, pixels_per_lane, ray_tile),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
        acc_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        row_shape = jax.ShapeDtypeStruct(
            (tiles, pixels_per_lane, ray_tile), dtype
        )
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
                out_row_spec, out_row_spec, out_row_spec,
                acc_spec((n_spheres, NUM_COLS)),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ) + ((pl.BlockSpec(memory_space=pltpu.HBM),)
                 if hbm_park else ()),
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), dtype),
                row_shape, row_shape, row_shape,
                jax.ShapeDtypeStruct((n_spheres, NUM_COLS), dtype),
                jax.ShapeDtypeStruct((1, _CAM_COLS), dtype),
            ) + ((jax.ShapeDtypeStruct(
                (hbm_waves * _ST_ROWS, ray_tile), dtype),)
                if hbm_park else ()),
            scratch_shapes=(
                [
                    pltpu.VMEM((3 * pixels_per_lane, ray_tile), dtype),
                    pltpu.VMEM((_ST_ROWS, ray_tile), dtype),
                    pltpu.VMEM((_ST_ROWS, ray_tile), dtype),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ]
                if hbm_park
                else [
                    pltpu.VMEM(
                        (samples_per_pixel * max_depth * _ST_ROWS_SAMPLE,
                         ray_tile), dtype,
                    ),
                    pltpu.SMEM((samples_per_pixel,), jnp.int32),
                ]
                if park_residuals
                else [pltpu.VMEM(
                    ((window + max_depth) * _ST_ROWS
                     if sweep == "wave"
                     else max_depth * _ST_ROWS_SAMPLE, ray_tile), dtype,
                )] + (
                    [pltpu.VMEM((3 * pixels_per_lane, ray_tile), dtype)]
                    if pixels_per_lane > 1 else []
                )
            ),
            cost_estimate=pl.CostEstimate(
                # parked (vmem or hbm): one forward + reverse; else
                # sweeps 1+3 both trace forward (~1.5x the grad kernel)
                flops=int(
                    (2 if park_residuals or hbm_park else 3)
                    * samples_per_pixel
                    * max_depth * padded * n_spheres * 20
                ),
                bytes_accessed=int(padded) * 4 * 16,
                transcendentals=int(
                    (2 if park_residuals or hbm_park else 3)
                    * samples_per_pixel
                    * max_depth * padded * 4
                ),
            ),
            interpret=interpret,
        )(ids_arr, ii_arr, jj_arr, t_r, t_g, t_b, scene_m, cam_r)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)

        def run_psum(*args):
            loss, im_r, im_g, im_b, d_sm, d_cr, *rest = run(*args)
            # loss and scene/camera grads are sums over all pixels ->
            # all-reduce over the mesh (rides ICI); image rows stay
            # sharded by pixel tile (the hbm park buffer, if present,
            # stays per-device garbage)
            return ((lax.psum(loss, axes), im_r, im_g, im_b,
                     lax.psum(d_sm, axes), lax.psum(d_cr, axes))
                    + tuple(rest))

        sharded = shard_map(
            run_psum, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes),
                      P(axes), P(axes), P(axes), P(), P()),
            out_specs=(P(), P(axes), P(axes), P(axes), P(), P())
            + ((P(axes),) if hbm_park else ()),
            check_vma=False,
        )
        outs = sharded(ids2, ii2, jj2, tr, tg, tb, scene_mat, cam_row)
    else:
        outs = run(ids2, ii2, jj2, tr, tg, tb, scene_mat, cam_row)

    loss, im_r, im_g, im_b, d_sm, d_cr = outs[:6]
    if tile_chunk is not None:
        # partial sums + raw lane rows; mse_train_pallas_tiled assembles
        return loss[0, 0], (im_r, im_g, im_b), d_sm, d_cr
    img = jnp.stack(
        [im_r.reshape(padded), im_g.reshape(padded),
         im_b.reshape(padded)], axis=-1,
    )
    if pixel_order is not None:
        # un-permute: lane i rendered pixel ids[i]
        img = jnp.zeros_like(img).at[ids.astype(jnp.int32)].set(img)
    img = img[:num_pixels].reshape(img_height, img_width, 3)
    return loss[0, 0], img, d_sm, d_cr


def make_tiled_train(
    scene: Scene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    n_chunks: int,
    ray_tile: int = 512,
    pixels_per_lane: int = 1,
    pixel_order=None,
    seed: int = rtrng.DEFAULT_SEED,
    gamma: bool = True,
    rr_start=None,
    park_residuals="hbm",
    dtype=jnp.float32,
    interpret=None,
    loss: str = "mse",
    huber_delta: float = 1.0,
):
    """Build the tile-chunked fused train step ONCE; returns
    ``step(target) -> (loss, image, d_scene_matrix, d_camera_row)``.

    The step is ``n_chunks`` static tile-range dispatches (each its own
    jitted program, so every dispatch stays under the ~100 s TPU-worker
    ceiling — the configs[4]-shape escape hatch). Exact: per-chunk
    losses/cotangents are partial sums with GLOBAL normalizations, so
    summing chunk outputs reproduces the single-dispatch result; the
    image is reassembled from raw lane rows. ``ray_tile``/
    ``pixels_per_lane`` are explicit (the chunk split needs the tile
    count up front).

    Use THIS (not mse_train_pallas_tiled) in a loop: the one-shot
    wrapper re-traces its n_chunks programs every call — measured
    ~150 s of host tracing per step at the configs[4] shape
    (baseline_configs.jsonl tiled12_k1 306.9 s vs 158.9 with built
    programs reused)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    num_pixels = img_width * img_height
    padded = _round_up(num_pixels, pixels_per_lane * ray_tile)
    n_tiles = padded // (pixels_per_lane * ray_tile)
    bounds = [
        (n_tiles * c // n_chunks, n_tiles * (c + 1) // n_chunks)
        for c in range(n_chunks)
    ]
    # scene/camera CLOSED OVER, target as the only jit argument: a
    # traced CameraConfig would re-derive the camera row with
    # per-program FMA grouping — the known ~2e-7 cross-program channel
    # that flips knife-edge hits (verify skill)
    fns = [
        jax.jit(lambda t, t0=t0, t1=t1: mse_train_pallas(
            scene, cam_cfg, t, img_width, img_height,
            samples_per_pixel, max_depth,
            seed=seed, gamma=gamma, ray_tile=ray_tile,
            pixel_order=pixel_order, rr_start=rr_start,
            park_residuals=park_residuals,
            pixels_per_lane=pixels_per_lane, dtype=dtype,
            interpret=interpret, loss=loss, huber_delta=huber_delta,
            tile_chunk=(t0, t1 - t0),
        ))
        for (t0, t1) in bounds if t1 > t0
    ]
    ids = _order_ids(pixel_order, padded)

    def step(target):
        loss = None
        rows = []
        d_sm = d_cr = None
        for f in fns:
            lo, (im_r, im_g, im_b), dsm_c, dcr_c = f(target)
            loss = lo if loss is None else loss + lo
            rows.append((im_r, im_g, im_b))
            d_sm = dsm_c if d_sm is None else d_sm + dsm_c
            d_cr = dcr_c if d_cr is None else d_cr + dcr_c

        img = jnp.stack(
            [jnp.concatenate([r[k] for r in rows],
                             axis=0).reshape(padded)
             for k in range(3)],
            axis=-1,
        )
        if pixel_order is not None:
            img = jnp.zeros_like(img).at[ids.astype(jnp.int32)].set(img)
        img = img[:num_pixels].reshape(img_height, img_width, 3)
        return loss, img, d_sm, d_cr

    return step


def mse_train_pallas_tiled(
    scene: Scene,
    cam_cfg: CameraConfig,
    target: jnp.ndarray,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    **kw,
):
    """One-shot wrapper over make_tiled_train (see there). In a
    training loop, build the step once with make_tiled_train — this
    wrapper re-traces all chunk programs every call."""
    return make_tiled_train(
        scene, cam_cfg, img_width, img_height, samples_per_pixel,
        max_depth, **kw,
    )(target)


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
    ray_tile=None,
    pixel_order=None,
    mesh=None,
    interpret: bool = False,
    park_residuals=None,
    sweep=None,
    window: int = 0,
    rr_start=None,
    pixels_per_lane=None,
    loss: str = "mse",
    huber_delta: float = 1.0,
):
    """User-facing fused train step builder.

    Returns jittable ``f(params, cam_cfg, target) ->
    (loss, image, (d_params, d_cam_cfg))`` — one program containing one
    Mosaic kernel, so it composes with an optimizer update in the same
    jit (see examples/inverse_rendering.py).

    ``pixel_order``: optional frozen difficulty ordering (e.g. from
    pallas_kernel.measure_difficulty at step 0) — depth-grouped tiles
    hit the all-dead early exit together. Frozen is fine: ordering
    affects only speed, never values (up to tile-sum reassociation)."""

    def f(params, cam_cfg, target):
        scene = Scene(params=params, mat_type=mat_type, active=active)
        loss_v, img, d_sm, d_cr = mse_train_pallas(
            scene, cam_cfg, target, img_width, img_height,
            samples_per_pixel, max_depth, seed=seed, gamma=gamma,
            ray_tile=ray_tile, pixel_order=pixel_order, mesh=mesh,
            interpret=interpret, park_residuals=park_residuals,
            sweep=sweep, window=window, rr_start=rr_start,
            pixels_per_lane=pixels_per_lane, loss=loss,
            huber_delta=huber_delta,
        )
        d_params, d_cam = chain_to_params(
            d_sm, d_cr, params, cam_cfg, mat_type, active,
            img_width, img_height,
        )
        return loss_v, img, (d_params, d_cam)

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
