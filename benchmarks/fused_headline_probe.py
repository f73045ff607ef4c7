"""Fused train-step tuning at HEADLINE scale (VERDICT r3 next-steps #4).

Round 3 measured the fused MSE step at 1280x768x100spp/d25 exactly once
— 6.06 s rr2 = 2.8x the 2.13 s forward — with knobs inherited from the
640x384x16spp knee (rt512/K16/window-auto). This ladders window / K /
ray_tile at the real headline shape, plus the two-program composition
(jitted fwd + chunked standalone bwd) as the alternative. Target from
the verdict: step <= 2.2x forward (~4.7 s).

Usage: python benchmarks/fused_headline_probe.py [--spp 100] [--cases ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, DEPTH, RR = 1280, 768, 25, 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--out",
                    default="benchmarks/results/fused_headline.jsonl")
    ap.add_argument("--cases", nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops.pallas_backward import (
        mse_train_pallas, render_pallas_grads,
    )
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty, render_pallas,
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

    cases = []

    # forward control (production render, same estimator)
    fwd = jax.jit(lambda s, c: render_pallas(
        s, c, W, H, spp, DEPTH, pixels_per_lane=16, pixel_order=order,
        rr_start=RR))
    cases.append(("fwd_control", lambda: timed(fwd, scene, cam)))

    def fused(rt=None, k=None, window=0, sweep=None):
        f = jax.jit(lambda p, c, t: mse_train_pallas(
            Scene(p, scene.mat_type, scene.active), c, t, W, H, spp,
            DEPTH, pixel_order=order, ray_tile=rt, rr_start=RR,
            window=window, pixels_per_lane=k, sweep=sweep,
            park_residuals=False))
        return lambda: timed(f, scene.params, cam, target)

    cases += [
        ("fused_auto", fused()),                 # rt512/K16/w102
        ("fused_w60", fused(window=60)),
        ("fused_w140", fused(window=140)),
        ("fused_k32", fused(k=32)),
        ("fused_k8", fused(k=8)),
        ("fused_rt256", fused(rt=256)),
        ("fused_rt1024", fused(rt=1024)),
    ]

    # two-program alternative: jitted fwd + one standalone grad sweep
    def two_prog():
        g = (target * (2.0 / (W * H * 3)) / spp).astype(jnp.float32)
        bwd = jax.jit(lambda p, c, gg: render_pallas_grads(
            Scene(p, scene.mat_type, scene.active), c, gg, W, H, spp,
            DEPTH, pixel_order=order, ray_tile=512, rr_start=RR))
        fwd_nog = jax.jit(lambda s, c: render_pallas(
            s, c, W, H, spp, DEPTH, gamma=False, pixels_per_lane=16,
            pixel_order=order, rr_start=RR))

        def step(p, c, t):
            img = fwd_nog(Scene(p, scene.mat_type, scene.active), c)
            gg = (img - t) * (2.0 / (W * H * 3)) / spp
            return bwd(p, c, gg)

        return lambda: timed(step, scene.params, cam, target)

    cases.append(("two_program_rt512", two_prog()))

    for name, run in cases:
        if args.cases and name not in args.cases:
            continue
        try:
            dt, cs = run()
            log(case=name, s=round(dt, 3), compile_s=round(cs, 1),
                mrays_s=round(W * H * spp / dt / 1e6, 2))
        except Exception as e:  # noqa: BLE001
            log(case=name, error=repr(e)[:300])

    log(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
