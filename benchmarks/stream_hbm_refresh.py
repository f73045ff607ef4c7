"""Re-measure the stream full-park fused-step rows after the
parked-draws change (hbm_park.jsonl stream10k/stream100k cases).

Usage: python benchmarks/stream_hbm_refresh.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "benchmarks/results/hbm_park.jsonl"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream,
    )
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log(event="start", probe="stream_hbm_refresh",
        calib=measure_calibration())
    cam = CameraConfig.reference_default()

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

    from raytracingincuda_tpu.ops.pallas_stream import StreamScene

    W, H = 640, 384
    for n_spheres, spp, depth, tag in ((10_000, 4, 6, "stream10k_d6"),
                                       (10_000, 4, 12, "stream10k_d12"),
                                       (100_000, 4, 10, "stream100k_d10")):
        try:
            scene = build_random_scene(n_spheres, seed=7)
            stream = prepare_stream_scene(scene)
            target = render_pallas_stream(stream, cam, W, H, 1, depth,
                                          gamma=False) * 0.9
            target.block_until_ready()
            blk = stream.block

            # scene arrays as jit ARGS, never closures: a closed-over
            # scene bakes n*128 f32 of constants into the program and
            # they land in SCOPED VMEM (49.5M at 100k -> compile OOM;
            # the HTTP-413 gotcha's compile-time sibling)
            def step(t, mat, bounds, s=spp, d=depth, b=blk):
                st = StreamScene(scene_mat=mat, bounds=bounds, block=b)
                return mse_train_stream(st, cam, t, W, H, s, d)[0]

            f = jax.jit(step)
            s, cs = timed(f, target, stream.scene_mat, stream.bounds)
            log(case=f"{tag}_hbm_drawspark", ms=round(s * 1e3, 1),
                compile_s=round(cs - s, 1))
        except Exception as e:  # noqa: BLE001
            log(case=tag, error=repr(e)[:300])
    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
