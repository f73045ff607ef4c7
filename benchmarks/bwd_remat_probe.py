"""TPU probe: backward-kernel remat (jax.checkpoint on the bounce vjp).

Question: does rematerializing the (N, R) hit-test intermediates in the
reverse sweep shrink peak VMEM enough to re-enable ray_tile=512 (which
OOMs the 16 MB scoped limit without it, measured 17.65 M), and is the
recompute cost worth it? Grid: (ray_tile, remat) at the standard
backward-probe config 640x384x16spp (d8 + d25).

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
    ap.add_argument("--out", default="benchmarks/results/bwd_remat.jsonl")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops.pallas_backward import render_pallas_grads
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

    depths = [8] if args.quick else [8, 25]
    cases = [(256, False), (256, True), (512, True), (512, False)]

    for depth in depths:
        g = jnp.ones((h, w, 3), jnp.float32)
        for rt, remat in cases:
            tag = f"rt{rt}_remat{int(remat)}_d{depth}"
            try:
                f = jax.jit(
                    lambda p, c, gg, rt=rt, remat=remat, depth=depth:
                    render_pallas_grads(
                        Scene(p, scene.mat_type, scene.active), c, gg,
                        w, h, spp, depth, ray_tile=rt, remat=remat,
                    )
                )
                t0 = time.perf_counter()
                force(f(scene.params, cam, g))
                compile_s = round(time.perf_counter() - t0, 1)
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    force(f(scene.params, cam, g))
                    times.append((time.perf_counter() - t0) * 1e3)
                emit(case=tag, ms=round(min(times), 1),
                     compile_s=compile_s)
            except Exception as e:  # noqa: BLE001
                emit(case=tag, error=repr(e)[:500])
    emit(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
