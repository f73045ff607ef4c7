"""Offline culling-statistics probe for the streaming-HBM kernel (CPU).

The stream kernel culls per (block x whole 512-lane wave): a block is
processed if ANY ray in the tile can improve inside its bound
(ops/pallas_stream.py _block_bound_any_hit). Measured win was only 17%
at 100k spheres — this probe explains why and sizes the headroom of
finer granularities BEFORE we build them:

  * block sizes 512 / 128 / 64  (smaller blocks = finer spatial cull)
  * lane groups 512 / 128       (skip per 128-lane VPU group, the
                                 finest granularity SIMD can exploit)
  * winner-only lower bound     (blocks containing a group's winning
                                 sphere — what a perfect front-to-back
                                 walk with exact early-exit would do)

It simulates the EXACT regen wave process (ops/pallas_kernel.py
_regen_body: same RNG streams, same scatter, same regeneration rule) for
a sample of scan-order tiles, then replays the sequential block walk per
wave with a running per-lane-group t_best, exactly like the kernel.

Pure host-side analysis; nothing here ships in the render path.
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from raytracingincuda_tpu.models import materials  # noqa: E402
from raytracingincuda_tpu.models.camera import (  # noqa: E402
    CameraConfig, initialize,
)
from raytracingincuda_tpu.models.scene import build_random_scene  # noqa: E402
from raytracingincuda_tpu.ops import rng as rtrng  # noqa: E402
from raytracingincuda_tpu.ops import vec  # noqa: E402
from raytracingincuda_tpu.ops.intersect import T_MIN, T_MISS  # noqa: E402
from raytracingincuda_tpu.ops.pallas_kernel import (  # noqa: E402
    COL_ACTIVE, COL_CX, COL_CZ, COL_RADIUS,
)
from raytracingincuda_tpu.ops.pallas_stream import (  # noqa: E402
    prepare_stream_scene,
)
from raytracingincuda_tpu.ops.tracer import primary_rays_from_ij  # noqa: E402
from raytracingincuda_tpu.ops.vec import Vec3  # noqa: E402


def t_all_numpy(sm: np.ndarray, o: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Per-(sphere, ray) nearest-valid root, T_MISS where invalid.

    Mirrors intersect.hit_world's quadratic on the packed stream matrix:
    sm (N, >=16) float32 rows, o/d (R, 3)."""
    cx = sm[:, COL_CX:COL_CX + 1]
    cy = sm[:, COL_CX + 1:COL_CX + 2]
    cz = sm[:, COL_CZ:COL_CZ + 1]
    r2 = sm[:, COL_RADIUS:COL_RADIUS + 1] ** 2
    act = sm[:, COL_ACTIVE:COL_ACTIVE + 1] > 0.5

    ox, oy, oz = o[None, :, 0], o[None, :, 1], o[None, :, 2]
    dx, dy, dz = d[None, :, 0], d[None, :, 1], d[None, :, 2]
    a = np.maximum(dx * dx + dy * dy + dz * dz, 1e-12)
    h = (cx * dx + cy * dy + cz * dz) - (dx * ox + dy * oy + dz * oz)
    c2r2 = cx * cx + cy * cy + cz * cz - r2
    c = (c2r2 + (ox * ox + oy * oy + oz * oz)) - 2.0 * (
        cx * ox + cy * oy + cz * oz
    )
    disc = h * h - a * c
    pos = disc > 0.0
    sqrtd = np.sqrt(np.where(pos, disc, 1.0))
    tmin_a = T_MIN * a
    near = h - sqrtd
    root_num = np.where(near > tmin_a, near, h + sqrtd)
    valid = pos & (root_num > tmin_a) & act
    return np.where(valid, root_num / a, T_MISS).astype(np.float32)


def bound_t_interval(bounds: np.ndarray, o: np.ndarray, d: np.ndarray):
    """Per-(block, ray) bound-sphere [near_num, far_num] / a intervals +
    intersect flag; mirrors _block_bound_any_hit."""
    bx, by, bz, br = (bounds[:, k:k + 1] for k in range(4))
    ox, oy, oz = o[None, :, 0], o[None, :, 1], o[None, :, 2]
    dx, dy, dz = d[None, :, 0], d[None, :, 1], d[None, :, 2]
    a = np.maximum(dx * dx + dy * dy + dz * dz, 1e-12)
    h = (bx * dx + by * dy + bz * dz) - (dx * ox + dy * oy + dz * oz)
    c2r2 = bx * bx + by * by + bz * bz - br * br
    c = (c2r2 + (ox * ox + oy * oy + oz * oz)) - 2.0 * (
        bx * ox + by * oy + bz * oz
    )
    disc = h * h - a * c
    pos = (disc > 0.0) & (br > 0.0)
    sqrtd = np.sqrt(np.where(pos, disc, 0.0))
    near = (h - sqrtd) / a
    far = (h + sqrtd) / a
    return pos, near, far, a


def walk_stats(t_all: np.ndarray, bounds: np.ndarray, o, d, active,
               block: int, group: int, border=None):
    """Replay the sequential block walk: per lane-group running t_best,
    bound test per block x group. ``border``: block visit order (e.g.
    camera-distance front-to-back) — earlier near blocks tighten t_best
    sooner, so later far blocks cull. Returns (#processed block-groups,
    #block-groups, #winner block-groups)."""
    n, r = t_all.shape
    nb = n // block
    ng = r // group
    pos, near, far, _ = bound_t_interval(bounds, o, d)      # (nb, r)
    # dead lanes can never improve: mask them out of the group reduction
    pos = pos & active[None, :]
    if border is None:
        border = range(nb)

    processed = 0
    winner_hit = 0
    t_best = np.full(r, T_MISS, np.float32)
    for b in border:
        blk_t = t_all[b * block:(b + 1) * block]            # (B, r)
        for g in range(ng):
            sl = slice(g * group, (g + 1) * group)
            can = (pos[b, sl] & (far[b, sl] > T_MIN)
                   & (near[b, sl] < t_best[sl]))
            if can.any():
                processed += 1
                t_best[sl] = np.minimum(t_best[sl], blk_t[:, sl].min(0))
    # winner lower bound: blocks holding each group's final winners
    widx = t_all.argmin(0)                                   # (r,)
    whit = (t_all.min(0) < T_MISS) & active
    for g in range(ng):
        sl = slice(g * group, (g + 1) * group)
        wb = np.unique(widx[sl][whit[sl]] // block)
        winner_hit += len(wb)
    return processed, nb * ng, winner_hit


def simulate_tile(scene, cam, pixel_ids, fi, fj, spp, depth, streams,
                  seed):
    """Regen-wave simulation (mirrors _regen_body) collecting per-wave
    ray snapshots; returns list of (o (R,3), d (R,3), active (R,)) plus
    mean bounce depth per wave."""
    key = rtrng.key_from_seed(seed)
    r = pixel_ids.shape[0]
    ids = jnp.asarray(pixel_ids, jnp.uint32)
    fi = jnp.asarray(fi, jnp.float32)
    fj = jnp.asarray(fj, jnp.float32)
    budget = float(spp)

    sample_f = jnp.zeros(r)
    bounce_f = jnp.zeros(r)
    o, d = primary_rays_from_ij(cam, fi, fj, ids,
                                sample_f.astype(jnp.uint32), key)
    atten = Vec3.full((r,), 1.0, 1.0, 1.0)
    waves = []

    from raytracingincuda_tpu.ops.intersect import (
        gather_hit_params, hit_world,
    )
    from raytracingincuda_tpu.models.scene import Scene

    sc_obj = scene
    max_waves = spp * depth
    for w in range(max_waves):
        active = np.asarray(sample_f < budget)
        if not active.any():
            break
        waves.append((
            np.stack([np.asarray(o.x), np.asarray(o.y),
                      np.asarray(o.z)], -1),
            np.stack([np.asarray(d.x), np.asarray(d.y),
                      np.asarray(d.z)], -1),
            active,
            float(np.asarray(bounce_f)[active].mean()),
        ))
        hr = hit_world(sc_obj, o, d)
        hp = gather_hit_params(sc_obj, hr.idx)
        t_safe = jnp.where(hr.hit, hr.t, 1.0)
        p = o + d * t_safe
        outward = (p - hp.center) / jnp.maximum(hp.radius, 1e-12)
        front = vec.dot(d, outward) < 0.0
        normal = vec.where(front, outward, -outward)
        s_u = sample_f.astype(jnp.uint32)
        b_u = bounce_f.astype(jnp.uint32)
        ur = rtrng.random_unit_vector(key, ids, s_u, b_u,
                                      rtrng.DRAW_SCATTER)
        cu, _ = rtrng.uniform2(key, ids, s_u, b_u, rtrng.DRAW_COIN)
        sc = materials.scatter(d, normal, front, hp.mat_type, hp.albedo,
                               hp.fuzz, hp.ior, ur, cu)
        act_j = jnp.asarray(active)
        survived = act_j & hr.hit & sc.scattered
        at_cap = survived & (bounce_f >= (depth - 1))
        continues = survived & ~at_cap
        dies = act_j & ~continues
        o = vec.where(continues, p, o)
        d = vec.where(continues, sc.direction, d)
        bounce_f = jnp.where(continues, bounce_f + 1.0, bounce_f)
        sample_next = sample_f + jnp.where(dies, 1.0, 0.0)
        o_new, d_new = primary_rays_from_ij(
            cam, fi, fj, ids, sample_next.astype(jnp.uint32), key)
        regen = dies & (sample_next < budget)
        o = vec.where(regen, o_new, o)
        d = vec.where(regen, d_new, d)
        bounce_f = jnp.where(regen, 0.0, bounce_f)
        sample_f = jnp.where(dies, sample_next, sample_f)
    return waves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--scene_id", type=int, default=0,
                    help="0 = build_random_scene(--n); 1-3 = the "
                         "reference scenes (sizes the VMEM-kernel cull "
                         "question: is 488 spheres above break-even?)")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--tiles", type=int, default=6)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--sorted", action="store_true",
                    help="assign lanes pixels in the PRODUCTION "
                         "difficulty order (measure_difficulty d8/s6 "
                         "prepass) instead of raster ids — sorted tiles "
                         "mix pixels from across the image, changing "
                         "block-cull coverage")
    ap.add_argument("--out", default="benchmarks/results/cull_stats.jsonl")
    args = ap.parse_args()

    def log(rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    if args.scene_id:
        from raytracingincuda_tpu.models.scene import build_scene

        scene = build_scene(args.scene_id)
    else:
        scene = build_random_scene(args.n, seed=3)
    cam_config = CameraConfig.reference_default()
    cam = initialize(cam_config, args.width, args.height)
    # (block, group, order): order 'scan' = Morton index order (the
    # kernel today), 'camdist' = blocks sorted by centroid distance to
    # the camera origin (front-to-back for primaries; free at runtime).
    # order values prefixed 'sort*' keep scan block order but SORT THE
    # RAYS within the wave before grouping — the in-kernel ray-binning
    # candidate (MXU one-hot permutation): 'sortoct' = direction octant,
    # 'sortcell' = direction octant + coarse origin cell.
    if args.scene_id:
        # VMEM-kernel sizing (488-sphere reference scenes): small Morton
        # blocks, whole-tile (512) or vreg-group (128) skip granularity,
        # scan vs front-to-back block order
        configs = [
            (32, 512, "scan"), (32, 512, "camdist"),
            (64, 512, "scan"), (64, 512, "camdist"),
            (128, 512, "scan"), (128, 512, "camdist"),
            (32, 128, "camdist"), (64, 128, "camdist"),
        ]
    else:
        configs = [
            (256, 512, "scan"), (256, 256, "scan"),
            (256, 256, "sortoct"), (256, 128, "sortoct"),
            (256, 256, "sortcell"), (256, 128, "sortcell"),
            (128, 128, "sortcell"),
        ]
    streams = {b: prepare_stream_scene(scene, block=b)
               for b in sorted({b for b, _, _ in configs})}
    mats = {b: np.asarray(s.scene_mat) for b, s in streams.items()}
    bnds = {b: np.asarray(s.bounds) for b, s in streams.items()}
    cam_o = np.array([13.0, 2.0, 3.0])
    orders = {}
    for b, bn in bnds.items():
        dist = np.sqrt(((bn[:, 0:3] - cam_o) ** 2).sum(1)) - bn[:, 3]
        dist = np.where(bn[:, 3] > 0.0, dist, np.inf)   # empty blocks last
        orders[b] = {"scan": None, "camdist": np.argsort(dist)}

    ray_tile = 512
    n_tiles_total = (args.width * args.height) // ray_tile
    tile_ids = np.linspace(0, n_tiles_total - 1, args.tiles).astype(int)
    order = None
    if args.sorted:
        import jax as _jax
        import functools as _ft

        from raytracingincuda_tpu.ops.pallas_kernel import (
            difficulty_order, measure_difficulty,
        )

        t0 = time.time()
        seg = _jax.jit(_ft.partial(
            measure_difficulty, img_width=args.width,
            img_height=args.height, probe_depth=8, probe_samples=6,
            interpret=True,
        ))(scene, cam_config)
        order = np.asarray(difficulty_order(seg, 8, 6))
        log({"event": "order_ready", "secs": round(time.time() - t0, 1)})
    log({"event": "start", "n": args.n,
         "scene_id": args.scene_id, "sorted": bool(args.sorted),
         "size": f"{args.width}x{args.height}",
         "spp": args.spp, "depth": args.depth,
         "tiles": tile_ids.tolist(), "configs": configs})

    agg = {f"b{b}_g{g}_{o}": [0, 0, 0] for b, g, o in configs}
    per_bounce = {}
    for ti in tile_ids:
        ids = np.arange(ti * ray_tile, (ti + 1) * ray_tile,
                        dtype=np.uint32)
        if order is not None:
            ids = order[ids].astype(np.uint32)  # lane i owns order[i]
        fi = (ids % args.width).astype(np.float32)
        fj = (ids // args.width).astype(np.float32)
        waves = simulate_tile(scene, cam, ids, fi, fj, args.spp,
                              args.depth, streams, rtrng.DEFAULT_SEED)
        for (o, d, active, mb) in waves:
            t_cache = {}
            ray_orders = {"scan": None}
            # direction-octant key (3 bits); + coarse origin cell (2 bits
            # per axis on a 4x1x4 ground-plane grid) for 'sortcell'
            oct_key = ((d[:, 0] > 0).astype(int) * 4
                       + (d[:, 1] > 0).astype(int) * 2
                       + (d[:, 2] > 0).astype(int))
            cell = (np.clip((o[:, 0] + 50) / 25, 0, 3).astype(int) * 4
                    + np.clip((o[:, 2] + 50) / 25, 0, 3).astype(int))
            ray_orders["sortoct"] = np.argsort(oct_key, kind="stable")
            ray_orders["sortcell"] = np.argsort(cell * 8 + oct_key,
                                                kind="stable")
            for b, g, om in configs:
                keyname = f"b{b}_g{g}_{om}"
                ro = ray_orders.get(om)
                os_, ds_, act_ = o, d, active
                if ro is not None:
                    os_, ds_, act_ = o[ro], d[ro], active[ro]
                ckey = (b, om if ro is not None else "-")
                if ckey not in t_cache:
                    t_cache[ckey] = t_all_numpy(mats[b], os_, ds_)
                p, tot, wl = walk_stats(t_cache[ckey], bnds[b], os_,
                                        ds_, act_, b, g,
                                        border=orders[b].get(om))
                agg[keyname][0] += p
                agg[keyname][1] += tot
                agg[keyname][2] += wl
                if (b, g, om) == configs[0]:
                    bkey = int(round(mb))
                    e = per_bounce.setdefault(bkey, [0, 0])
                    e[0] += p
                    e[1] += tot
        log({"event": "tile_done", "tile": int(ti), "waves": len(waves)})

    for (b, g, om) in configs:
        k = f"b{b}_g{g}_{om}"
        p, tot, wl = agg[k]
        log({"case": k, "processed_frac": round(p / tot, 4),
             "winner_frac": round(wl / tot, 4),
             "note": "frac of block-groups computed (vs winner lower bound)"})
    log({"case": f"per_mean_bounce_b{configs[0][0]}_g{configs[0][1]}",
         "frac": {k: round(v[0] / v[1], 4)
                  for k, v in sorted(per_bounce.items())}})
    log({"event": "done"})


if __name__ == "__main__":
    main()
