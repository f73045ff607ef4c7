"""TPU probe: difficulty-sorted vs raster backward tiles, current kernel.

Measures render_pallas_grads (scene 1, 640x384x16spp, d8+d25) and the
fused train step (scene 2) with and without a frozen difficulty order.
Appends to --out as rows land.
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops.pallas_backward import (
        make_mse_train,
        render_pallas_grads,
    )
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order,
        measure_difficulty,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()), probe="bwd_sorted")
    cam = CameraConfig.reference_default()
    w, h, spp = 640, 384, 16

    def order_for(scene):
        pre = jax.jit(lambda p, c: measure_difficulty(
            Scene(p, scene.mat_type, scene.active), c, w, h,
            probe_depth=8, probe_samples=6))
        o = jax.jit(lambda s: difficulty_order(s, 8, 6))(
            pre(scene.params, cam))
        o.block_until_ready()
        return o

    def bench(tag, fn, *fargs):
        try:
            t0 = time.perf_counter()
            force(fn(*fargs))
            cs = round(time.perf_counter() - t0, 1)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(fn(*fargs))
                ts.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=round(min(ts), 1), compile_s=cs)
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:400])

    scene = jax.device_put(build_scene(1))
    order1 = order_for(scene)
    g = jnp.ones((h, w, 3), jnp.float32)
    for depth in (8, 25):
        for tag, po in (("raster", None), ("sorted", order1)):
            f = jax.jit(
                lambda p, c, gg, po=po, depth=depth: render_pallas_grads(
                    Scene(p, scene.mat_type, scene.active), c, gg,
                    w, h, spp, depth, pixel_order=po,
                )
            )
            bench(f"grads_{tag}_d{depth}", f, scene.params, cam, g)

    scene2 = jax.device_put(build_scene(2))
    order2 = order_for(scene2)
    target = jnp.zeros((h, w, 3), jnp.float32)
    for depth in (8, 25):
        for tag, po in (("raster", None), ("sorted", order2)):
            step = jax.jit(make_mse_train(
                scene2.mat_type, scene2.active, w, h, spp, depth,
                pixel_order=po,
            ))
            bench(f"fused_{tag}_d{depth}", step, scene2.params, cam,
                  target)
    emit(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
