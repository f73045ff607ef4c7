"""TPU probe: pixels_per_lane (K) sweep at the headline config.

K>1 averages each lane's total-work statistic over K pixels, shrinking
the tile-tail (max-over-lanes) floor identified in docs/ROADMAP.md
(0.90M waves measured vs 0.54M ideal at K=1). JSONL out."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/kpl_probe.jsonl")
    ap.add_argument("--ks", default="1,2,4,8")
    ap.add_argument("--rr", type=int, default=None)
    args = ap.parse_args()

    import jax

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty, render_pallas,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()), rr=args.rr)
    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))
    W, H, SPP, DEPTH = 1280, 768, 100, 25

    prepass = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order_fn = jax.jit(lambda seg: difficulty_order(seg, 8, 6))
    seg = prepass(scene, cam)
    order = order_fn(seg)
    force(order)

    for k in [int(x) for x in args.ks.split(",")]:
        try:
            f = jax.jit(lambda s, c, o, k=k: render_pallas(
                s, c, W, H, SPP, DEPTH, pixel_order=o,
                pixels_per_lane=k, rr_start=args.rr))
            t0 = time.perf_counter()
            force(f(scene, cam, order))
            comp = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f(scene, cam, order))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=f"headline_k{k}", ms=min(times), compile_s=comp,
                 rr=args.rr)
        except Exception as e:  # noqa: BLE001
            emit(case=f"headline_k{k}", error=repr(e)[:400])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
