"""TPU probe: the df64 (double-float) render kernel on real Mosaic.

The accelerator answer to the reference's GlobalDouble variant
(``avg_gpu_global_double_timing.csv``: 292 ms at 320x192x10spp/d25,
10 329 ms at 640x384x100spp, 40 270 ms at the 1280x768x100spp headline
on the RTX 3070 — its fp64 rate is 1:64). Ladder:

1. correctness: Mosaic df64 (trusted rounding, no laundering) vs the
   interpret path (XLA with reduce_precision laundering) on the same
   inputs — the EFT pipeline must survive real Mosaic lowering.
2. ray_tile knee at 320x192x10spp (df64 holds ~2x the (N, R)
   intermediates, so the f32 kernel's rt1024 may not fit).
3. the reference's double rows: 320x192x10, 640x384x100, and the
   40 270 ms headline if the extrapolated dispatch stays under the
   ~100 s Mosaic ceiling (UPSTREAM_ISSUES #10).

JSONL rows land as they finish (benchmarks/results/df64.jsonl).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main() -> int:
    import jax
    import numpy as np

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops import df64 as dd
    from raytracingincuda_tpu.ops.pallas_df64 import render_pallas_df64
    from raytracingincuda_tpu.utils.timing import force

    out = open("benchmarks/results/df64.jsonl", "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    scene = build_scene(1)
    cam = CameraConfig.reference_default()

    # -- 1. Mosaic vs interpret correctness at a small config ------------
    try:
        W, H, SPP, D = 64, 40, 2, 6
        # the camera must stay CONCRETE: initialize_f64 runs the
        # viewport math host-side in numpy float64 (device is f32-only)
        f_mosaic = jax.jit(lambda: render_pallas_df64(
            scene, cam, W, H, SPP, D, ray_tile=256))
        f_interp = jax.jit(lambda: render_pallas_df64(
            scene, cam, W, H, SPP, D, ray_tile=256, interpret=True))
        a = dd.to_f64(jax.tree.map(np.asarray, f_mosaic()))
        b = dd.to_f64(jax.tree.map(np.asarray, f_interp()))
        emit(case="mosaic_vs_interpret", maxdiff=float(np.abs(a - b).max()),
             finite=bool(np.isfinite(a).all()))
    except Exception as e:  # noqa: BLE001
        emit(case="mosaic_vs_interpret", error=repr(e)[:300])

    # -- 2+3. timing ladder ----------------------------------------------
    def run(w, h, spp, rt, tag):
        try:
            f = jax.jit(lambda: render_pallas_df64(
                scene, cam, w, h, spp, 25, ray_tile=rt))
            t0 = time.perf_counter()
            force(f().hi)
            comp = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f().hi)
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=min(times), compile_s=round(comp, 1))
            return min(times)
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:300])
            return None

    rt_times = {}
    for rt in (256, 512, 1024):
        t = run(320, 192, 10, rt, f"df64_320x192x10_rt{rt}")
        if t is not None:
            rt_times[rt] = t

    best_rt = min(rt_times, key=rt_times.get) if rt_times else 256
    emit(event="best_rt", value=best_rt)
    t_mid = run(640, 384, 100, best_rt, "df64_640x384x100")

    if t_mid is not None:
        # headline is 4x the mid config's rays; keep under the ~100 s
        # Mosaic dispatch ceiling
        est_s = t_mid * 4.4 / 1e3
        emit(event="headline_estimate_s", value=round(est_s, 1))
        if est_s < 90:
            run(1280, 768, 100, best_rt, "df64_1280x768x100_headline")
        else:
            emit(event="headline_skipped", reason="est over 90s; chunk it")

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
