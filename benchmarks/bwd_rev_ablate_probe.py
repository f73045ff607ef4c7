"""Reverse-phase cost attribution by ablation (round 4).

The d50 decomposition (bwd_d50.jsonl) measured the reverse walk at
0.70 forward-equivalents and the knob ladders flat — but "by shape"
reasoning about WHERE those microseconds go (thin scatter matmul?
bounce vjp replay? camera vjp? one-hot build?) was never measured.
This probe stubs each cost center via pallas_backward._ABLATE (a
trace-time measurement hook; gradients are wrong under any flag, only
timing is meaningful) and times the same north-star-shape program
same-day:

  base          unmodified program
  rev           whole reverse walk stubbed (park-only sweep)
  bounce_vjp    jax.vjp(_winner_bounce) replay stubbed
  cam_vjp       per-wave primary-ray camera vjp skipped
  scatter       one-hot build + scatter matmul stubbed
  scatter_mm    scatter matmul only stubbed (one-hot still built)

on BOTH production reverse paths: the two-program wave backward
(render_pallas_grads) and the full-park fused step (mse_train_pallas
park_residuals='hbm').  base - ablated = that center's share.

Usage: python benchmarks/bwd_rev_ablate_probe.py [--spp 100]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, DEPTH, RR = 1200, 675, 50, 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--out",
                    default="benchmarks/results/bwd_rev_ablate.jsonl")
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
    log(event="start", calib=measure_calibration(),
        cfg=f"{W}x{H}x{spp}spp/d{DEPTH}_rr{RR}")

    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (H, W, 3), jnp.float32)

    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))
    order.block_until_ready()

    g = (target * (2.0 / (W * H * 3)) / spp).astype(jnp.float32)
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

    def grads_fn():
        return jax.jit(lambda p, c, gg: pb.render_pallas_grads(
            Scene(p, scene.mat_type, scene.active), c, gg, W, H,
            spp, DEPTH, pixel_order=order, ray_tile=512, rr_start=RR,
            pixels_per_lane=16))

    def fused_fn():
        return jax.jit(lambda p, c, t: pb.mse_train_pallas(
            Scene(p, scene.mat_type, scene.active), c, t, W, H,
            spp, DEPTH, pixel_order=order, rr_start=RR,
            park_residuals="hbm"))

    flags = ["base", "rev", "bounce_vjp", "cam_vjp", "scatter",
             "scatter_mm"]
    cases = []
    for fl in flags:
        cases.append((f"grads_{fl}", grads_fn, (scene.params, cam, g),
                      fl))
    for fl in flags:
        cases.append((f"fused_{fl}", fused_fn,
                      (scene.params, cam, target), fl))

    for name, mk, a, fl in cases:
        if args.cases and name not in args.cases:
            continue
        pb._ABLATE = frozenset() if fl == "base" else frozenset({fl})
        try:
            s, cs = timed(mk(), *a)
            log(case=name, s=round(s, 3), compile_s=round(cs - s, 1),
                mrays_s=round(rays / s / 1e6, 2))
        except Exception as e:  # noqa: BLE001 — probe logs and moves on
            log(case=name, error=repr(e)[:300])
        finally:
            pb._ABLATE = frozenset()
    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
