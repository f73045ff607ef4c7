"""TPU probe: streaming kernel at 300k / 1M spheres (forward render).

Scale ceiling check for the HBM block walk: the reference caps at 488
spheres, the VMEM kernel at ~5k, the stream kernel was measured to 100k
(8.2 s at 640x384x10spp/10b). This ladder probes 300k and 1M — watch
the SMEM bounds table (n_blocks x 8 f32) and the ~100 s dispatch
ceiling (UPSTREAM_ISSUES #10): spp drops to keep dispatches safe, rates
are spp-flat. JSONL: benchmarks/results/stream_1m.jsonl."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main() -> int:
    import jax

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.pallas_stream import (
        StreamScene, prepare_stream_scene, render_pallas_stream,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open("benchmarks/results/stream_1m.jsonl", "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    cam = CameraConfig.reference_default()
    W, H, DEPTH = 640, 384, 10

    # spp sized to keep each dispatch well under the ~100 s worker
    # ceiling, extrapolating the measured 100k rate (8.2 s at 10 spp)
    for n, spp in ((300_000, 4), (1_000_000, 1)):
        tag = f"stream_{n // 1000}k_{W}x{H}x{spp}spp_d{DEPTH}"
        try:
            t0 = time.perf_counter()
            scene = build_random_scene(n, seed=3, half_extent=60.0)
            # block auto-doubles for huge scenes (SMEM bounds budget)
            stream = prepare_stream_scene(scene)
            prep_s = time.perf_counter() - t0
            # scene arrays as jit ARGS, not closures: a closed-over 1M
            # scene bakes 64 MB of constants into the program and the
            # remote-compile upload 413s (render_api's _stream_fn
            # pattern)
            blk = stream.block

            def call(mat, bounds, spp=spp, blk=blk):
                s = StreamScene(scene_mat=mat, bounds=bounds, block=blk)
                return render_pallas_stream(
                    s, cam, W, H, spp, DEPTH, pixels_per_lane=32,
                    lane_group=256)

            f = jax.jit(call)
            t0 = time.perf_counter()
            force(f(stream.scene_mat, stream.bounds))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(f(stream.scene_mat, stream.bounds))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            emit(case=tag, block=stream.block, s=round(dt, 2),
                 prep_s=round(prep_s, 1),
                 compile_s=round(compile_s, 1),
                 mrays_s=round(W * H * spp / dt / 1e6, 3))
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:300])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
