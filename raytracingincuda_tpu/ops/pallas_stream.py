"""Streaming-HBM render path: scenes far larger than VMEM.

The reference's "global memory" variant exists because scenes can exceed
the 64 KB constant cache (SURVEY.md §2.1); the TPU analog is a scene that
exceeds VMEM (~16 MB => ~250k spheres at 64 B/slot, but the per-tile ray
state needs most of that budget, so streaming pays off far earlier). Here
the (N, 16) scene matrix stays in HBM and the closest-hit loop walks it in
sphere BLOCKS with a two-buffer DMA pipeline: block k+1 streams into one
VMEM buffer while block k's (B, R) intersection batch computes out of the
other — the classic double-buffered global-memory loop, expressed with
``pltpu.make_async_copy`` + per-buffer DMA semaphores.

Block culling (the first acceleration structure this framework ships; the
reference brute-forces every sphere per probe, hittable.h:80-98): the host
pre-sorts spheres by Morton code of their centers so blocks are spatially
coherent, and precomputes one conservative bounding sphere per block. Per
wave, each block first runs a cheap (1, R) bound test; if NO ray in the
tile can beat its current best hit inside the block's bound, the (B, R)
intersection batch is skipped with ``pl.when`` (the DMA bandwidth is still
spent — compute, not bandwidth, is the bottleneck at B >= 256).

Winner tracking differs from the VMEM kernel's global equality-one-hot:
the running (16, R) best-hit parameter tile is updated per block via
``where(improved)`` on the block-local gather. Exact-t ties across blocks
resolve to the EARLIER block (the oracle's argmin semantics); ties within
a block blend as before (measure zero).

Host preprocessing (`prepare_stream_scene`) is numpy/eager by design —
a 100k-sphere asset is sorted once, not per jit trace.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import CameraConfig, initialize
from ..models.scene import Scene
from . import rng as rtrng
from . import vec
from .intersect import T_MIN, T_MISS
from .pallas_kernel import (
    COL_ACTIVE,
    COL_CX,
    COL_CY,
    COL_CZ,
    COL_RADIUS,
    NUM_COLS,
    _finalize_output,
    _gather_params,
    _hit_select,
    _hit_world_tile,
    _lane_setup,
    _regen_body,
    _regen_body_multi,
    _round_up,
    pack_camera,
    pack_scene_matrix,
)
from .vec import Vec3

DEFAULT_BLOCK = 256   # best across 10k-100k spheres on v5e
                      # (benchmarks/results/cull_tpu.jsonl)

# Stream-layout scene matrices pad the attribute axis to a full 128-lane
# tile: HBM->VMEM DMA slices must be 128-aligned in the minor dimension
# (Mosaic memref_slice tiling rule — a (N, 16) matrix cannot be sliced by
# sphere blocks). 8x the bytes of the dense 16-column matrix, irrelevant
# at HBM scale (100k spheres = 51 MB) and for the 2x(block, 128) VMEM
# buffers.
STREAM_COLS = 128


STREAM_COL_SID = 11   # stream-slot id (row number) as f32, exact to 2^24;
                      # gathered with the winner's params so the backward
                      # kernel knows WHICH sphere to scatter gradients to


class StreamScene(NamedTuple):
    """Preprocessed large scene: Morton-sorted packed matrix + block
    bounds. Build once with prepare_stream_scene (host, eager)."""

    scene_mat: jnp.ndarray    # (N, 128) f32, N % (2*block) == 0
    bounds: jnp.ndarray       # (NB, 8) f32: cx, cy, cz, r_bound, pad
    block: int
    # original Scene slot index of each ACTIVE stream row (n_active,),
    # mapping stream-order gradients back to Scene order (backward pass)
    perm: jnp.ndarray = None

    @property
    def n_blocks(self) -> int:
        return self.scene_mat.shape[0] // self.block


def _morton3(q: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave 3 x bits-bit integer coords -> Morton codes (N,)."""
    out = np.zeros(q.shape[0], np.uint64)
    for b in range(bits):
        for a in range(3):
            out |= ((q[:, a].astype(np.uint64) >> b) & 1) << (3 * b + a)
    return out


# The per-block bounds table lives in SMEM as (n_blocks, 8) f32 and
# Mosaic pads SMEM rows 16x — 512 bytes per block against the ~1 MB
# SMEM budget. Cap the block COUNT and grow the block size instead for
# huge scenes (measured: 3908 blocks = 2.0 MB fails compile with an
# SMEM allocation error; 1M spheres at block 512 = 1954 blocks works,
# 3.5 s/spp at 640x384/d10).
_MAX_BLOCKS = 1792


def _auto_block(n_act: int, block: int) -> int:
    while _round_up(max(n_act, 1), 2 * block) // block > _MAX_BLOCKS:
        block *= 2
    return block


def prepare_stream_scene(
    scene: Scene, block: int = DEFAULT_BLOCK, sort: bool = True,
    dtype=jnp.float32, pad_pairs: bool = True, dense: bool = False,
    camdist_from=None,
) -> StreamScene:
    """Sort spheres spatially, pad to an even number of blocks, compute
    per-block conservative bounding spheres. Inactive slots get far-away
    centers so they never tighten nor break a block bound.

    ``block`` is a MINIMUM: it doubles as needed to keep the SMEM
    bounds table under budget for huge scenes (see _MAX_BLOCKS).

    ``pad_pairs``: pad the block COUNT to even (the double-buffered DMA
    walks block pairs). VMEM-RESIDENT consumers (render_api's packed
    small-scene path) pass False and size ``block`` to the whole scene:
    a one-block walk is just the (N, R) batch with zero per-block merge
    overhead — the walk exists for the DMA pipeline, which residency
    removes.

    ``dense``: pack the 16-column attribute matrix instead of the
    128-lane stream layout. Only legal for VMEM-RESIDENT use (the HBM
    DMA path needs 128-aligned minor-dim slices): this is the culled
    closest-hit for the PRODUCTION small-scene path — same per-sphere
    math as the VMEM kernel's (N, R) batch, with 8x less winner-gather
    MXU work than the 128-column layout.

    ``camdist_from``: optional (3,) point (the camera center). Blocks
    are reordered front-to-back by (centroid distance - bound radius)
    AFTER Morton sorting: the sequential walk's running t_best then
    tightens on near blocks first, so far blocks cull harder
    (cull_stats_scene1.jsonl: 488 spheres b32, production sorted tiles
    — camdist 0.67 of block-waves processed vs scan 0.75). Pure
    speed: winner merge is order-exact except measure-zero cross-block
    exact-t ties (resolve to the earlier block, like the oracle's
    argmin picks the lower slot)."""
    if dtype != jnp.float32:
        raise NotImplementedError(
            "stream scenes are f32-only (the packed HBM matrix and the "
            "kernel's DMA buffers are float32)"
        )
    if dense and pad_pairs:
        raise ValueError(
            "dense (16-column) stream scenes are VMEM-resident-only — "
            "pass pad_pairs=False (the HBM DMA path needs the 128-lane "
            "layout)"
        )
    mat = np.asarray(pack_scene_matrix(scene, dtype))
    active = mat[:, COL_ACTIVE] > 0.5
    n_act = int(active.sum())

    act_idx = np.flatnonzero(active)
    act_mat = mat[active]
    if sort and n_act > 1:
        c = act_mat[:, COL_CX:COL_CZ + 1].astype(np.float64)
        lo = c.min(0)
        span = np.maximum(c.max(0) - lo, 1e-9)
        q = np.clip(((c - lo) / span * 1023.0), 0, 1023).astype(np.uint32)
        order = np.argsort(_morton3(q), kind="stable")
        act_mat = act_mat[order]
        act_idx = act_idx[order]

    block = _auto_block(n_act, block)
    n_pad = _round_up(max(n_act, 1), (2 if pad_pairs else 1) * block)
    cols = NUM_COLS if dense else STREAM_COLS
    out = np.zeros((n_pad, cols), np.float32)
    out[:n_act, :NUM_COLS] = act_mat
    # inactive padding: radius 0, active 0 (never hit); centers at origin
    nb = n_pad // block
    bounds = np.zeros((nb, 8), np.float32)
    for b in range(nb):
        blk = out[b * block:(b + 1) * block]
        a_blk = blk[blk[:, COL_ACTIVE] > 0.5]
        if a_blk.shape[0] == 0:
            bounds[b, :4] = (0.0, 0.0, 0.0, 0.0)   # empty: r_bound 0
            continue
        c = a_blk[:, COL_CX:COL_CZ + 1]
        r = a_blk[:, COL_RADIUS]
        lo, hi = c.min(0), c.max(0)
        ctr = (lo + hi) * 0.5
        # |r|: a negative (hollow-glass) radius still occupies |r|
        rb = np.sqrt(((c - ctr) ** 2).sum(1)).max() + np.abs(r).max()
        bounds[b, 0:3] = ctr
        bounds[b, 3] = rb * 1.0001 + 1e-4          # conservative slack

    # bounds col 4 = the block's first matrix ROW: the walk reads its
    # block offset from the bounds table instead of deriving it from the
    # loop index, so reordering BOUNDS ROWS alone reorders the visit —
    # the matrix layout (and the actives-first perm convention the
    # gradient scatter relies on) never moves
    bounds[:, 4] = np.arange(nb, dtype=np.float32) * block
    if camdist_from is not None and nb > 1:
        p = np.asarray(camdist_from, np.float64).reshape(3)
        dist = np.sqrt(((bounds[:, 0:3] - p) ** 2).sum(1)) - bounds[:, 3]
        dist = np.where(bounds[:, 3] > 0.0, dist, np.inf)  # empties last
        bounds = bounds[np.argsort(dist, kind="stable")]

    # stream-slot ids ride along with the winner gather (backward scatter)
    out[:, STREAM_COL_SID] = np.arange(n_pad, dtype=np.float32)
    return StreamScene(
        scene_mat=jnp.asarray(out), bounds=jnp.asarray(bounds), block=block,
        perm=jnp.asarray(act_idx, jnp.int32),
    )


def build_stream_arrays(scene: Scene, perm: jnp.ndarray, block: int,
                        n_pad: int, dtype=jnp.float32, border=None):
    """Device-side, JITTABLE rebuild of (scene_mat, bounds) under a
    FROZEN stream permutation — the inverse-rendering path.

    Per optimizer step the geometry moves a little; re-sorting on the
    host would re-upload the whole matrix over the (slow) tunnel every
    step. Instead the Morton ORDER from ``prepare_stream_scene`` is
    reused (a stale sort only loosens block coherence -> slightly weaker
    culling, never correctness) while the matrix values and the block
    bounds are recomputed exactly, on device, from the current params.
    Differentiable w.r.t. scene params (a gather + elementwise)."""
    mat = pack_scene_matrix(scene, dtype)               # (n_slots, 16)
    n_act = perm.shape[0]
    out = jnp.zeros((n_pad, STREAM_COLS), dtype)
    out = out.at[:n_act, :NUM_COLS].set(mat[perm])
    out = out.at[:, STREAM_COL_SID].set(
        jnp.arange(n_pad, dtype=dtype)
    )
    nb = n_pad // block
    c = out[:, COL_CX:COL_CZ + 1].reshape(nb, block, 3)
    r = out[:, COL_RADIUS].reshape(nb, block)
    act = out[:, COL_ACTIVE].reshape(nb, block) > 0.5
    big = jnp.asarray(1e30, dtype)
    lo = jnp.min(jnp.where(act[..., None], c, big), axis=1)
    hi = jnp.max(jnp.where(act[..., None], c, -big), axis=1)
    any_act = act.any(axis=1)
    ctr = jnp.where(any_act[:, None], (lo + hi) * 0.5, 0.0)
    # padding rows hold zero centers, so this distance stays finite and
    # the where() masks it out of the max. Double-where around the sqrt:
    # a lone active sphere sits exactly at ctr (d2 == 0), where sqrt's
    # vjp is inf and even the masked-out cotangent would turn the
    # center gradient NaN (0 * inf) — NaN hygiene, CLAUDE.md.
    d2 = ((c - ctr[:, None, :]) ** 2).sum(-1)
    pos = d2 > 0.0
    dist = jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)
    dmax = jnp.max(jnp.where(act, dist, 0.0), axis=1)
    rmax = jnp.max(jnp.where(act, jnp.abs(r), 0.0), axis=1)
    rb = jnp.where(any_act, (dmax + rmax) * 1.0001 + 1e-4, 0.0)
    bounds = (
        jnp.zeros((nb, 8), dtype).at[:, 0:3].set(ctr).at[:, 3].set(rb)
        # col 4 = block's first matrix row (see prepare_stream_scene);
        # the frozen-perm rebuild keeps the Morton visit order unless a
        # frozen ``border`` permutes the bounds rows (front-to-back from
        # the training camera — speed-only, like the frozen Morton perm
        # itself: a stale order only loosens culling)
        .at[:, 4].set(jnp.arange(nb, dtype=dtype) * block)
    )
    if border is not None:
        bounds = bounds[jnp.asarray(border, jnp.int32)]
    return out, bounds


def _block_bound_any_hit(bx, by, bz, br, o: Vec3, d: Vec3, a, t_best):
    """Scalar bound sphere vs (1, R) ray rows: can ANY ray improve its
    current best inside this bound? Conservative (false positives ok)."""
    # quadratic vs the bound sphere (same half-b form as _hit_select)
    cdx = bx * d.x + by * d.y + bz * d.z            # (1, R)
    cdo = bx * o.x + by * o.y + bz * o.z
    h = cdx - vec.dot(d, o)
    c2r2 = bx * bx + by * by + bz * bz - br * br
    c = (c2r2 + vec.length_sq(o)) - 2.0 * cdo
    disc = h * h - a * c
    pos = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(pos, disc, 0.0))
    near_num = h - sqrtd                             # a * t_near
    far_num = h + sqrtd                              # a * t_far
    # overlap of [t_near, t_far] with (T_MIN, t_best): far > T_MIN*a and
    # near < t_best*a (a > 0)
    can = pos & (far_num > T_MIN * a) & (near_num < t_best * a) & (br > 0.0)
    return jnp.max(can.astype(jnp.float32)) > 0.0    # scalar


# sublane rows per lane group in the ray-row scratch (9 used: o xyz,
# d xyz, a, d.o, |o|^2; padded to 16 for sublane-tile alignment)
_RAY_ROWS = 16


def _hit_world_stream(scene_hbm, bounds_ref, bufs, sems, o: Vec3, d: Vec3,
                      n_blocks: int, block: int, dtype,
                      t_refs=None, p_refs=None, ray_scr=None,
                      resident: bool = False):
    """Closest hit over HBM-resident sphere blocks with double-buffered
    DMA and per-block bound culling. Returns (hit, t, center, radius,
    albedo, fuzz, ior, mat_f, sid) — the VMEM gather path's tuple plus
    the winner's stream-slot id (the backward scatter keys on it; the
    forward kernel slices it off).

    ``resident``: the packed matrix is already a VMEM ref (small scene —
    the GPU texture-CACHE analog: after first touch the reference's tex
    variant reads the whole 17 KB scene from L1/tex cache, not DRAM, so
    per-wave HBM DMA is the wrong model there). Blocks are read by
    dynamic sublane slice; the walk, bound culling, and winner updates
    are IDENTICAL — results are bit-equal to the streamed path.

    ``t_refs``/``p_refs``: per-lane-group VMEM scratch lists (one
    (1, G) + (STREAM_COLS, G) pair per group, G = R // len) holding the
    running best hit; the block loop then carries no vector state. One
    entry = whole-wave culling; multiple entries = an independent bound
    test + ``pl.when`` skip per G consecutive lanes. Finer groups skip
    far more compute (cull_stats probe: 81% of block batches processed
    at b512/whole-wave vs 36% at b128/g128) for one extra scalar test
    per group. Results are BIT-IDENTICAL across granularities — grouping
    only changes which non-improving block batches get skipped.

    ``ray_scr`` ((_RAY_ROWS * n_groups, G), required when n_groups > 1):
    per-group ray rows round-tripped through VMEM so every value entering
    the (B, G) broadcasts sits at LANE OFFSET 0 — Mosaic rejects
    vector.broadcast of a lane-sliced operand at offset g*G inside this
    loop nest ("Invalid input layout", UPSTREAM_ISSUES.md #8); a store to
    an offset-0 scratch row relayouts it. Groups stack on SUBLANES (16
    rows each), whose offsets are unrestricted."""
    if resident and n_blocks == 1:
        # ONE-block resident fast path (small packed scenes): with the
        # whole matrix in VMEM and a single block, the walk machinery —
        # fori loop, dynamic block slice, bound test, per-block scratch
        # merge — is pure overhead; the closest hit is exactly the VMEM
        # kernel's straight-line (N, R) batch on the 128-lane packed
        # matrix. Bit-identical to the walk (same _hit_select, merge
        # against a fresh T_MISS init is the identity). Headline packed:
        # 3894 (2-block walk) -> 3052 ms (packed_resident.jsonl round-3
        # rows; reference tex 4569, vmem kernel 2707).
        hit, t, one_hot = _hit_world_tile(scene_hbm, o, d)
        params = _gather_params(scene_hbm, one_hot)           # (128, R)
        row = lambda k: params[k:k + 1, :]
        return (hit, t, Vec3(row(COL_CX), row(COL_CY), row(COL_CZ)),
                row(COL_RADIUS), Vec3(row(4), row(5), row(6)),
                row(7), row(8), row(9), row(STREAM_COL_SID))

    buf0, buf1 = bufs if not resident else (None, None)
    sem0, sem1 = sems if not resident else (None, None)
    shape = o.x.shape
    r_lanes = shape[-1]
    n_groups = len(t_refs)
    g_size = r_lanes // n_groups

    a = jnp.maximum(vec.length_sq(d), 1e-12)
    d_dot_o = vec.dot(d, o)
    o2 = vec.length_sq(o)

    if n_groups == 1:
        o_g = lambda g: o
        d_g = lambda g: d
        a_g = lambda g: a
        ddo_g = lambda g: d_dot_o
        o2_g = lambda g: o2
    else:
        rows_full = [o.x, o.y, o.z, d.x, d.y, d.z, a, d_dot_o, o2]
        for g in range(n_groups):
            sl = slice(g * g_size, (g + 1) * g_size)
            base = g * _RAY_ROWS
            for k, r_full in enumerate(rows_full):
                ray_scr[base + k:base + k + 1, :] = r_full[:, sl]

        def row(g, k):
            b = g * _RAY_ROWS + k
            return ray_scr[b:b + 1, :]

        o_g = lambda g: Vec3(row(g, 0), row(g, 1), row(g, 2))
        d_g = lambda g: Vec3(row(g, 3), row(g, 4), row(g, 5))
        a_g = lambda g: row(g, 6)
        ddo_g = lambda g: row(g, 7)
        o2_g = lambda g: row(g, 8)

    def _block_off(b):
        # bounds row b carries its block's first matrix row in col 4
        # (prepare_stream_scene/build_stream_arrays stamp it): the visit
        # ORDER is whatever order the bounds rows are in — front-to-back
        # camdist ordering is a host-side bounds reorder, no matrix move
        return bounds_ref[b, 4].astype(jnp.int32)

    def start_copy(buf, sem, b):
        pltpu.make_async_copy(
            scene_hbm.at[pl.ds(_block_off(b), block), :], buf, sem
        ).start()

    def wait_copy(buf, sem, b):
        pltpu.make_async_copy(
            scene_hbm.at[pl.ds(_block_off(b), block), :], buf, sem
        ).wait()

    def process_block(buf, b):
        """Bound test + (B, G) hit test per lane group; improving
        winners update the group's scratch best-hit state in place."""
        bx = bounds_ref[b, 0]
        by = bounds_ref[b, 1]
        bz = bounds_ref[b, 2]
        br = bounds_ref[b, 3]
        for g in range(n_groups):
            t_cur = t_refs[g][0:1, :]

            @pl.when(_block_bound_any_hit(
                bx, by, bz, br, o_g(g), d_g(g), a_g(g), t_cur))
            def _(g=g, t_cur=t_cur):
                if resident:
                    blk = scene_hbm[pl.ds(_block_off(b), block), :]
                else:
                    blk = buf[:, :]
                cx = blk[:, COL_CX:COL_CX + 1]
                cy = blk[:, COL_CY:COL_CY + 1]
                cz = blk[:, COL_CZ:COL_CZ + 1]
                rc = blk[:, COL_RADIUS:COL_RADIUS + 1]
                act = blk[:, COL_ACTIVE:COL_ACTIVE + 1]
                og, dg = o_g(g), d_g(g)
                c_dot_d = cx * dg.x + cy * dg.y + cz * dg.z
                c_dot_o = cx * og.x + cy * og.y + cz * og.z
                hit_b, t_b, one_hot_b = _hit_select(
                    cx, cy, cz, rc, act, a_g(g), ddo_g(g), o2_g(g),
                    c_dot_d, c_dot_o
                )
                params_b = lax.dot_general(
                    blk, one_hot_b,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )                                        # (128, G)
                improved = hit_b & (t_b < t_cur)         # (1, G)
                t_refs[g][0:1, :] = jnp.where(improved, t_b, t_cur)
                p_refs[g][:, :] = jnp.where(
                    improved, params_b, p_refs[g][:, :]
                )

    # preamble: block 0 into buf0 (streamed); reset the best-hit scratch
    cols = scene_hbm.shape[1]        # 128 (stream) or 16 (dense resident)
    if not resident:
        start_copy(buf0, sem0, jnp.int32(0))
    for g in range(n_groups):
        t_refs[g][0:1, :] = jnp.full((1, g_size), T_MISS, dtype)
        p_refs[g][:, :] = jnp.zeros((cols, g_size), dtype)

    if resident:
        def body(b, carry):
            process_block(None, b)
            return carry

        lax.fori_loop(0, n_blocks, body, jnp.int32(0))
    else:
        def pair_body(j, carry):
            b0 = 2 * j
            b1 = 2 * j + 1
            # buf1 is free (its previous block finished last iteration)
            start_copy(buf1, sem1, b1)
            wait_copy(buf0, sem0, b0)
            process_block(buf0, b0)

            @pl.when(b1 + 1 < n_blocks)
            def _():
                start_copy(buf0, sem0, b1 + 1)

            wait_copy(buf1, sem1, b1)
            process_block(buf1, b1)
            return carry

        lax.fori_loop(0, n_blocks // 2, pair_body, jnp.int32(0))
    if n_groups == 1:
        t_best = t_refs[0][0:1, :]
        params_best = p_refs[0][:, :]
    else:
        t_best = jnp.concatenate(
            [t_refs[g][0:1, :] for g in range(n_groups)], axis=1
        )
        params_best = jnp.concatenate(
            [p_refs[g][:, :] for g in range(n_groups)], axis=1
        )

    hit = t_best < T_MISS
    row = lambda k: params_best[k:k + 1, :]
    center = Vec3(row(COL_CX), row(COL_CY), row(COL_CZ))
    # 9th element: winner stream-slot id (f32 row, STREAM_COL_SID) — the
    # backward kernel's gradient-scatter target; forward callers drop it
    return (hit, t_best, center, row(COL_RADIUS),
            Vec3(row(4), row(5), row(6)), row(7), row(8), row(9),
            row(STREAM_COL_SID))


def _stream_tile_kernel(
    ids_ref, ii_ref, jj_ref, budget_ref, scene_hbm, bounds_ref, cam_ref,
    out_r_ref, out_g_ref, out_b_ref, *scratch,
    samples: int, max_depth: int, seed: int, dtype, block: int,
    n_blocks: int, rr_start, sample_offset: int, n_groups: int,
    k_pixels: int, resident: bool, finalize_scale=None,
):
    if resident:
        bufs = sems = (None, None)
    else:
        buf0, buf1, sem0, sem1, *scratch = scratch
        bufs, sems = (buf0, buf1), (sem0, sem1)
    if resident and n_blocks == 1:
        # one-block fast path needs no walk scratch (see _hit_world_stream)
        ray_scr, t_refs, p_refs = None, [None], [None]
    else:
        ray_scr = scratch[0]
        t_refs = list(scratch[1:1 + n_groups])
        p_refs = list(scratch[1 + n_groups:])

    def hit_fn(o, d):
        return _hit_world_stream(
            scene_hbm, bounds_ref, bufs, sems, o, d,
            n_blocks, block, dtype, t_refs, p_refs, ray_scr,
            resident=resident,
        )[:8]

    if k_pixels > 1:
        _regen_body_multi(
            ids_ref, ii_ref, jj_ref, budget_ref, None, cam_ref,
            out_r_ref, out_g_ref, out_b_ref,
            samples=samples, max_depth=max_depth, seed=seed, dtype=dtype,
            mxu_dots=False, rr_start=rr_start,
            sample_offset=sample_offset, k_pixels=k_pixels,
            hit_fn=hit_fn, finalize_scale=finalize_scale,
        )
    else:
        _regen_body(
            ids_ref, ii_ref, jj_ref, budget_ref, None, cam_ref,
            out_r_ref, out_g_ref, out_b_ref,
            samples=samples, max_depth=max_depth, seed=seed, dtype=dtype,
            legacy_sky=False, mxu_dots=False, emit_depth=False,
            rr_start=rr_start, sample_offset=sample_offset, hit_fn=hit_fn,
            finalize_scale=finalize_scale,
        )


def render_pallas_stream(
    stream: StreamScene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    dtype=jnp.float32,
    gamma: bool = True,
    ray_tile: int = 512,
    rr_start=None,
    lane_group: int = 0,
    pixels_per_lane: int = 1,
    sample_offset: int = 0,
    sample_budgets=None,
    pixel_order=None,
    accumulate_only: bool = False,
    mesh=None,
    interpret: bool = False,
    resident=None,
) -> jnp.ndarray:
    """Render a prepared StreamScene with the regeneration kernel and the
    double-buffered HBM block loop. Same estimator and RNG streams as
    render_pallas (the bounce/scatter math is literally _regen_body).

    ``sample_offset`` / ``sample_budgets`` / ``pixel_order`` /
    ``accumulate_only`` follow render_pallas's contract exactly (they
    feed the same _regen_body budget machinery), which lets the adaptive
    sampler (ops/adaptive.py) drive streamed scenes.

    ``resident`` (None = auto): keep the whole packed matrix VMEM-resident
    and skip the per-wave DMA walk — the texture-CACHE analog for scenes
    that fit (the reference's tex variant reads a 17 KB scene from L1
    after first touch; per-wave HBM DMA models a cache-MISSING texture
    fetch, ~100x too pessimistic at 488 spheres). Auto: resident when the
    packed matrix is <= 2 MB (4096 rows). Bit-identical either way."""
    rtrng.validate_stream_ids(sample_offset + samples_per_pixel,
                              max_depth)
    rr_start = rtrng.validate_rr_start(rr_start)
    cam = initialize(cam_cfg, img_width, img_height)
    kpl = pixels_per_lane
    n_shards = (
        int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    )
    (ids, ids2, ii2, jj2, bud2, use_sort, num_pixels,
     padded) = _lane_setup(
        img_width, img_height, ray_tile, kpl, n_shards, pixel_order,
        samples_per_pixel, sample_offset, sample_budgets, dtype,
    )

    cam_row = pack_camera(cam, dtype)
    block = stream.block
    n_blocks = stream.n_blocks
    nb_pad = stream.bounds.shape[0]
    if resident is None:
        resident = stream.scene_mat.nbytes <= 2 * 2**20
    if stream.scene_mat.shape[1] != STREAM_COLS and not resident:
        raise ValueError(
            "dense (16-column) stream scenes are VMEM-resident only — "
            "the HBM DMA path needs 128-aligned minor-dim slices"
        )
    if not resident and n_blocks % 2 != 0:
        # the double-buffered DMA walks block PAIRS; an odd count would
        # silently drop the last block from every hit test
        raise ValueError(
            f"stream scene must have an even block count, got {n_blocks} "
            "(prepare_stream_scene pads to 2*block rows)"
        )

    if 0 < lane_group < ray_tile and ray_tile % lane_group != 0:
        raise ValueError(
            f"lane_group ({lane_group}) must divide ray_tile ({ray_tile})"
        )
    n_groups = (
        ray_tile // lane_group if 0 < lane_group < ray_tile else 1
    )
    g_size = ray_tile // n_groups
    # fused finalize: same contract as render_pallas (uniform-budget gamma
    # renders scale+gamma in the kernel epilogue; adaptive/incremental
    # callers keep raw accumulations)
    fuse_finalize = (
        gamma and not accumulate_only and sample_budgets is None
    )
    kernel = functools.partial(
        _stream_tile_kernel,
        samples=samples_per_pixel,
        max_depth=max_depth,
        seed=seed,
        dtype=dtype,
        block=block,
        n_blocks=n_blocks,
        rr_start=rr_start,
        sample_offset=sample_offset,
        n_groups=n_groups,
        k_pixels=kpl,
        resident=resident,
        finalize_scale=(
            1.0 / samples_per_pixel if fuse_finalize else None
        ),
    )

    def run(ids_arr, ii_arr, jj_arr, bud_arr, scene_m, bounds_m, cam_r):
        tiles = ids_arr.shape[0]
        row_spec = pl.BlockSpec((1, kpl, ray_tile), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        scene_spec = (
            pl.BlockSpec(scene_m.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            if resident
            else pl.BlockSpec(memory_space=pl.ANY)       # scene in HBM
        )
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                row_spec, row_spec, row_spec, row_spec,
                scene_spec,
                pl.BlockSpec((nb_pad, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 24), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(row_spec, row_spec, row_spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((tiles, kpl, ray_tile), dtype)
                for _ in range(3)
            ),
            scratch_shapes=(
                []
                if resident and n_blocks == 1
                else (
                    []
                    if resident
                    else [
                        pltpu.VMEM((block, STREAM_COLS), dtype),
                        pltpu.VMEM((block, STREAM_COLS), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                    ]
                )
                + [pltpu.VMEM((_RAY_ROWS * n_groups, g_size), dtype)]
                + [pltpu.VMEM((1, g_size), dtype)] * n_groups
                + [pltpu.VMEM((scene_m.shape[1], g_size), dtype)]
                * n_groups
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(samples_per_pixel * max_depth * padded
                          * stream.scene_mat.shape[0] * 20),
                bytes_accessed=int(
                    samples_per_pixel * max_depth
                    * stream.scene_mat.size * 4
                ),
                transcendentals=int(
                    samples_per_pixel * max_depth * padded * 4
                ),
            ),
            interpret=interpret,
        )(ids_arr, ii_arr, jj_arr, bud_arr, scene_m, bounds_m, cam_r)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)
        run = shard_map(
            run, mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes), P(axes), P(), P(), P()),
            out_specs=(P(axes), P(axes), P(axes)),
            check_vma=False,
        )

    acc_r, acc_g, acc_b = run(
        ids2, ii2, jj2, bud2, stream.scene_mat, stream.bounds, cam_row
    )
    return _finalize_output(
        acc_r, acc_g, acc_b, ids, use_sort, num_pixels, padded,
        img_width, img_height, samples_per_pixel, gamma,
        accumulate_only, dtype, already_finalized=fuse_finalize,
    )
