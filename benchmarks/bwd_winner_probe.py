"""TPU probe: winner-replay VMEM backward (reverse sweep is O(R), not
the O(N*R) full-scan transpose).

Grid: render_pallas_grads at (ray_tile, depth) — rt512 should now fit
VMEM (the old full-vjp reverse OOM'd at rt512) — plus the fused MSE
train step. Baselines (full-vjp kernel, bwd_probe.jsonl/fused_probe.jsonl):
d8 1124 ms / d25 3407 ms / fused 343.8 ms.

Appends JSON lines to --out as each measurement lands (one process,
never die mid-compile — see CLAUDE.md).
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
    ap.add_argument("--out", default="benchmarks/results/bwd_winner.jsonl")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops.pallas_backward import (
        make_mse_train,
        render_pallas_grads,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))

    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))
    w, h, spp = 640, 384, 16

    def bench(tag, fn, *fargs):
        try:
            t0 = time.perf_counter()
            force(fn(*fargs))
            compile_s = round(time.perf_counter() - t0, 1)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(fn(*fargs))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=round(min(times), 1), compile_s=compile_s)
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:500])

    depths = [8] if args.quick else [8, 25]
    for depth in depths:
        g = jnp.ones((h, w, 3), jnp.float32)
        for rt in (256, 512, 1024):
            f = jax.jit(
                lambda p, c, gg, rt=rt, depth=depth: render_pallas_grads(
                    Scene(p, scene.mat_type, scene.active), c, gg,
                    w, h, spp, depth, ray_tile=rt,
                )
            )
            bench(f"grads_rt{rt}_d{depth}", f, scene.params, cam, g)

    # fused MSE train step (scene 2 to match fused_probe.jsonl)
    scene2 = jax.device_put(build_scene(2))
    target = jnp.zeros((h, w, 3), jnp.float32)
    for rt in (256, 512):
        step = jax.jit(make_mse_train(
            scene2.mat_type, scene2.active, w, h, spp, 8, ray_tile=rt,
        ))
        bench(f"fused_rt{rt}_d8", step, scene2.params, cam, target)

    emit(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
