"""TPU A/B: standalone gradient program FULL-PARK vs windowed wave sweep.

Round 4 made ``render_pallas_grads(park='hbm')`` the auto for the
standalone gradient program (commit e6d0721) — the path behind
``make_diff_render``'s custom_vjp, i.e. the general-loss user's entry —
on interpret-mode bit-identity only; the hardware A/B was queued behind
a compile-service wedge (docs/ROADMAP.md round-4 session-2 log). This
probe is that A/B (VERDICT r4 next #2), plus the ``bwd_ray_tile``
ladder under full-park that the same entry flagged as untuned
(make_diff_render defaulted to 512 from the WINDOWED sweep's knee,
bwd_wave.jsonl; the fused full-park ladder preferred 1024 at big
frames, hbm_park.jsonl hbmpark_knobs).

Cases (scene 1, raster order, matching the bwd_wave.jsonl rows):
  grads_{park|wave}_rt{R}_d{D}[_rr2]   render_pallas_grads, g_acc = 1
  e2e_diff_rt{R}                       make_diff_render fwd+bwd step at
                                       the headline shape (the user
                                       path: two programs, eager
                                       composition)

Appends JSON lines to --out as each row lands (one TPU process, never
die mid-compile — verify skill).
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
    ap.add_argument("--out",
                    default="benchmarks/results/standalone_ab.jsonl")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )
    from raytracingincuda_tpu.utils.timing import force, measure_calibration

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()),
         **measure_calibration())

    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))

    def bench(tag, fn, *fargs, reps=3):
        try:
            t0 = time.perf_counter()
            force(fn(*fargs))
            compile_s = round(time.perf_counter() - t0, 1)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                force(fn(*fargs))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=round(min(times), 1), compile_s=compile_s)
            return min(times)
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:500])
            return None

    def grads_fn(w, h, spp, depth, rt, park, rr=None):
        return jax.jit(
            lambda p, c, g: render_pallas_grads(
                Scene(p, scene.mat_type, scene.active), c, g,
                w, h, spp, depth, ray_tile=rt, park=park, rr_start=rr,
            )
        )

    # ---- A/B at the bwd_wave ladder shape (640x384x16spp) ----------
    w, h, spp = 640, 384, 16
    g = jnp.ones((h, w, 3), jnp.float32)
    depths = [8] if args.quick else [8, 25]
    for depth in depths:
        for rt in (512, 1024):
            for park, tag in ((False, "wave"), ("hbm", "park")):
                bench(f"grads_{tag}_rt{rt}_d{depth}",
                      grads_fn(w, h, spp, depth, rt, park),
                      scene.params, cam, g)

    if args.quick:
        emit(event="done")
        return 0

    # ---- A/B + rt ladder at the headline shape (the make_diff_render
    # default's operating point) -------------------------------------
    w, h, spp, depth = 1280, 768, 100, 25
    g = jnp.ones((h, w, 3), jnp.float32)
    for rt in (512, 1024):
        for park, tag in ((False, "wave"), ("hbm", "park")):
            bench(f"grads_{tag}_rt{rt}_d{depth}_hl",
                  grads_fn(w, h, spp, depth, rt, park),
                  scene.params, cam, g)
    # rr2 (production estimator) under full-park, both tiles
    for rt in (512, 1024):
        bench(f"grads_park_rt{rt}_d{depth}_hl_rr2",
              grads_fn(w, h, spp, depth, rt, "hbm", rr=2),
              scene.params, cam, g)

    # ---- end-to-end general-loss user path: make_diff_render -------
    from raytracingincuda_tpu.ops.pallas_kernel import make_diff_render

    target = jnp.zeros((h, w, 3), jnp.float32)
    for bwd_rt in (512, 1024):
        f = make_diff_render(
            scene.mat_type, scene.active, w, h, spp, depth,
            bwd_ray_tile=bwd_rt, rr_start=2,
        )

        def step(p, c, t):
            def loss(pp, cc):
                img = f(pp, cc)
                return jnp.mean((img - t) ** 2)

            return jax.grad(loss, argnums=(0, 1))(p, c)

        bench(f"e2e_diff_rt{bwd_rt}", step, scene.params, cam, target,
              reps=2)

    emit(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
