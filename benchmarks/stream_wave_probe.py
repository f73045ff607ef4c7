"""TPU probe: streaming backward with the wave-reversed sweep
(sweep='wave') vs the per-sample sweep, at the stream benchmark shape
(10k random spheres, 640x384x4spp — stream_bwd_probe's grid) and a
deeper d12 case where the lane-MAX tail costs whole O(N) block walks.
Decides the production default for pallas_stream_backward. JSONL rows
land as they finish."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.pallas_stream import prepare_stream_scene
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        render_pallas_stream_grads,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open("benchmarks/results/stream_wave.jsonl", "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    scene = build_random_scene(10_000, seed=3)
    # no device_put and no jit arg for the StreamScene: block/perm are
    # static config (stream_bwd_probe's NOTE) — close over it instead
    stream = prepare_stream_scene(scene, block=256)
    cam = CameraConfig.reference_default()
    W, H = 640, 384
    g = jax.random.normal(jax.random.PRNGKey(0), (H, W, 3),
                          jnp.float32) * 1e-3

    # (spp, depth, sweep, window)
    cases = [
        (4, 6, "sample", 0),      # round-2 reference point (~370ms bwd)
        (4, 6, "wave", 0),
        (4, 12, "sample", 0),
        (4, 12, "wave", 0),
        (4, 12, "wave", 64),
    ]
    for spp, depth, sweep, window in cases:
        tag = f"stream_{spp}spp_d{depth}_{sweep}" + (
            f"_w{window}" if window else "_wauto")
        try:
            f = jax.jit(lambda s=spp, d=depth, sw=sweep, w=window:
                        render_pallas_stream_grads(
                            stream, cam, g, W, H, s, d, sweep=sw,
                            window=w))
            t0 = time.perf_counter()
            force(f()[0])
            comp = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f()[0])
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=min(times), compile_s=round(comp, 1))
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:300])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
