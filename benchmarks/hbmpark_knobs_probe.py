"""Full-park fused-step (ray_tile, K) knobs at the north-star d50 shape.

The d50 tile rule (rt512, from bwd_d50.jsonl) was derived on the
WINDOWED wave backward, where rt1024 shrinks the parking window to ~26
waves. The full-park path has no window — the reverse streams from
HBM — and rowshape.jsonl measures (1,1024) rows at ~1.4x the issue
density of (1,512). Larger tiles also halve the per-wave fixed cost.
The HBM buffer bound K*spp*depth*40rows*rt*4B keeps K*rt <= ~4096 at
500spp/d50 under the 12.5 GiB budget, so the ladder trades K for rt at
constant K*rt.

Usage: python benchmarks/hbmpark_knobs_probe.py [--spp 100]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--height", type=int, default=675)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--out", default="benchmarks/results/hbm_park.jsonl")
    ap.add_argument("--cases", nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops import pallas_backward as pb
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty,
    )
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    spp = args.spp
    W, H, DEPTH, RR = args.width, args.height, args.depth, 2
    log(event="start", probe="hbmpark_knobs", calib=measure_calibration(),
        cfg=f"{W}x{H}x{spp}spp/d{DEPTH}_rr{RR}")

    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()
    target = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3),
                                jnp.float32)

    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))
    order.block_until_ready()
    rays = W * H * spp

    def timed(fn, *a, runs=2):
        t0 = time.perf_counter()
        force(fn(*a))
        cs = time.perf_counter() - t0
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts), cs

    def fused(rt=None, k=None):
        f = jax.jit(lambda p, c, t: pb.mse_train_pallas(
            Scene(p, scene.mat_type, scene.active), c, t, W, H,
            spp, DEPTH, pixel_order=order, rr_start=RR,
            park_residuals="hbm", ray_tile=rt, pixels_per_lane=k))
        return lambda: timed(f, scene.params, cam, target)

    cases = [
        ("park_auto", fused()),
        ("park_rt512_k8", fused(512, 8)),
        ("park_rt1024_k2", fused(1024, 2)),
        ("park_rt1024_k4", fused(1024, 4)),
        ("park_rt2048_k1", fused(2048, 1)),
        ("park_rt2048_k2", fused(2048, 2)),
        ("park_rt1024_k8", fused(1024, 8)),
        ("park_rt1024_k16", fused(1024, 16)),
        ("park_rt512_k16", fused(512, 16)),
        ("park_rt1024_k3", fused(1024, 3)),
        ("park_rt768_k4", fused(768, 4)),
        ("park_rt1536_k2", fused(1536, 2)),
    ]
    for name, fn in cases:
        if args.cases and name not in args.cases:
            continue
        try:
            s, cs = fn()
            log(case=name, s=round(s, 3), compile_s=round(cs - s, 1),
                mrays_s=round(rays / s / 1e6, 2))
        except Exception as e:  # noqa: BLE001
            log(case=name, error=repr(e)[:300])
    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
