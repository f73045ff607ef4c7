"""TPU probe: size the forward kernel's remaining wave-count headroom.

The roofline (results/roofline.txt) puts the per-wave ALU at ~95% of
the VPU's achievable rate and the scan census (scan_slots.jsonl) puts
the hit-select at its issue ceiling — the only headroom left in the
forward is wave COUNT: each tile runs until its slowest LANE finishes
(max over lanes of the lane's total path segments), so the tile tail
wastes (max - mean)/max of the tile's waves. This probe measures that
tail EXACTLY at the headline config (VERDICT r4 next #4 sizing step):

  1. render once with return_depth (K=1 raster): per-pixel total traced
     segments over all spp — packing-independent (streams key on
     (pixel, sample), not lane assignment);
  2. model the production packings on-device: for (order, K, rt),
     lane r of tile t serves pixels order[t*K*rt + k*rt + r],
     lane_total = sum_k segments; tile waves = max over lanes;
  3. report actual waves vs the within-tile ideal (ceil(tile_total/rt),
     reachable by a perfect within-tile reassignment) and the global
     ideal (total/rt, reachable only by cross-tile work stealing).

The gap between actual and within-tile ideal is what finer-than-tile
scheduling (VERDICT candidate a) could win; the gap between within-tile
and global ideal is what cross-tile interleaving (candidate b) could
win. Segment counts use the rr2 production estimator.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/wavetail.jsonl")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--bounces", type=int, default=25)
    ap.add_argument("--rr", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_kernel import (
        _round_up, difficulty_order, measure_difficulty, render_pallas,
    )
    from raytracingincuda_tpu.utils.timing import measure_calibration

    def log(**rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    W, H, SPP, D = args.width, args.height, args.samples, args.bounces
    log(event="start", probe="wavetail",
        cfg=f"{W}x{H}x{SPP}spp_d{D}_rr{args.rr}",
        calib=measure_calibration())

    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()
    npx = W * H

    # 1. per-pixel segment totals (K=1, raster, rr2) — device-resident
    t0 = time.perf_counter()
    _, seg = jax.jit(lambda s, c: render_pallas(
        s, c, W, H, SPP, D, ray_tile=1024, return_depth=True,
        rr_start=args.rr))(scene, cam)
    seg = seg[:npx]
    total = float(jnp.sum(seg))
    log(case="segments", total=total, seg_per_path=total / (npx * SPP),
        s=round(time.perf_counter() - t0, 1))

    # production difficulty order
    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))

    import functools

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def packing_stats(seg, order, k, rt):
        padded = _round_up(npx, k * rt)
        sp = jnp.zeros((padded,), jnp.float32).at[:npx].set(seg)
        if order is not None:
            o = order[:padded] if order.shape[0] >= padded else (
                jnp.concatenate([order, jnp.arange(
                    order.shape[0], padded, dtype=jnp.uint32)]))
            sp = sp[o.astype(jnp.int32)]
        lanes = sp.reshape(padded // (k * rt), k, rt).sum(axis=1)
        waves = lanes.max(axis=1)            # (n_tiles,)
        ideal_t = jnp.ceil(lanes.sum(axis=1) / rt)
        return (waves.sum(), ideal_t.sum(),
                jnp.ceil(sp.sum() / rt))

    for tag, o in (("raster", None), ("sorted", order)):
        for k, rt in ((16, 1024), (16, 512), (8, 1024), (32, 1024)):
            aw, iw, gw = (float(x) for x in packing_stats(seg, o, k, rt))
            log(case=f"pack_{tag}_K{k}_rt{rt}", waves=aw,
                within_tile_ideal=iw, global_ideal=gw,
                tail_over_within=round(aw / iw - 1.0, 4),
                tail_over_global=round(aw / gw - 1.0, 4))

    # ---- can finer-than-tile scheduling recover the tail? ----------
    # Simulate the candidate (VERDICT r4 next #4a): within each tile,
    # rank pixels by a per-pixel load key and lay them SERPENTINE
    # across lanes (the best static equal-cardinality balancer short of
    # bin packing). Keyed by the production prepass ESTIMATE it is the
    # realizable scheme; keyed by the TRUE totals it bounds what ANY
    # static assignment (with oracle knowledge) could reach.
    K, RT = 16, 1024
    padded = _round_up(npx, K * RT)
    base = order[:padded] if order.shape[0] >= padded else (
        jnp.concatenate([order, jnp.arange(order.shape[0], padded,
                                           dtype=jnp.uint32)]))
    est = pre(scene, cam)[:npx]

    @jax.jit
    def serpentine(perm, key_vals):
        kv = key_vals[perm.astype(jnp.int32)]
        t = perm.reshape(-1, K * RT)
        idx = jnp.argsort(kv.reshape(-1, K * RT), axis=1)
        t2 = jnp.take_along_axis(t, idx, axis=1).reshape(-1, K, RT)
        rev = jnp.flip(t2, axis=2)
        rows = jnp.arange(K)[None, :, None]
        return jnp.where(rows % 2 == 1, rev, t2).reshape(-1)

    def padp(v):
        return jnp.zeros((padded,), jnp.float32).at[:npx].set(v)

    for tag, perm in (
        ("assign_baseline_sorted", base),
        ("assign_serpentine_by_estimate", serpentine(base, padp(est))),
        ("assign_serpentine_by_truth", serpentine(base, padp(seg))),
    ):
        sp = padp(seg)[perm.astype(jnp.int32)]
        lanes = sp.reshape(padded // (K * RT), K, RT).sum(axis=1)
        aw = float(lanes.max(axis=1).sum())
        iw = float(jnp.ceil(lanes.sum(axis=1) / RT).sum())
        log(case=tag, waves=aw, within_tile_ideal=iw,
            tail=round(aw / iw - 1.0, 4))

    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
