"""BASELINE.json configs[1..3] fwd+bwd, measured with the round-4
FULL-PARK fused step (render + MSE loss + all scene/camera cotangents
in one dispatch; see ops/pallas_backward.mse_train_pallas
park_residuals='hbm'):

  configs[1]  scene 1,  640x384x100spp/d25 + backward
  configs[2]  scene 2, 1200x675x100spp/d25 fwd+bwd (full material set)
  configs[3]  scene 1, 1200x675x500spp/d50 (the north-star row;
              northstar_chunked.py chunk=0 is the canonical runner —
              included here so one probe covers the config list)

Each row: parity AND rr2 estimators, Mrays/s (camera rays / step
seconds), grads finite. Writes benchmarks/results/baseline_configs.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("configs1_scene1_640x384x100_d25", 1, 640, 384, 100, 25),
    ("configs2_scene2_1200x675x100_d25", 2, 1200, 675, 100, 25),
    ("configs3_scene1_1200x675x500_d50", 1, 1200, 675, 500, 50),
]
OUT = "benchmarks/results/baseline_configs.jsonl"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty,
    )
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log(event="start", calib=measure_calibration())
    cam = CameraConfig.reference_default()
    key = jax.random.PRNGKey(0)

    for name, sid, W, H, SPP, D in CONFIGS:
        scene = jax.device_put(build_scene(sid))
        target = jax.random.uniform(key, (H, W, 3), jnp.float32)
        pre = jax.jit(lambda s, c, W=W, H=H: measure_difficulty(
            s, c, W, H, probe_depth=8, probe_samples=6))
        order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(
            pre(scene, cam))
        order.block_until_ready()
        for est, rr in (("parity", None), ("rr2", 2)):
            f = jax.jit(
                lambda p, c, t, scene=scene, rr=rr, W=W, H=H, SPP=SPP,
                D=D, order=order: mse_train_pallas(
                    Scene(p, scene.mat_type, scene.active), c, t,
                    W, H, SPP, D, pixel_order=order, rr_start=rr,
                )
            )
            try:
                t0 = time.perf_counter()
                out = f(scene.params, cam, target)
                force((out[0],) + out[2:])
                cs = time.perf_counter() - t0
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = f(scene.params, cam, target)
                    force((out[0],) + out[2:])
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                log(case=f"{name}_{est}", s=round(dt, 3),
                    compile_s=round(cs, 1),
                    mrays_s=round(W * H * SPP / dt / 1e6, 2),
                    grad_finite=bool(jnp.isfinite(out[2]).all()
                                     & jnp.isfinite(out[3]).all()))
            except Exception as e:  # noqa: BLE001
                log(case=f"{name}_{est}", error=repr(e)[:300])

    log(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
