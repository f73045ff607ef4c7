"""Headline benchmark: scene 1, 1280x768, 100 spp, 25 bounces, f32.

This is the reference's best published config (BASELINE.md):
global_float render = 2879.33 ms on an RTX 3070 Laptop GPU
(timing-benchmarks/250427_avg_gpu_global_float_timing_100sample.csv:15).

Prints ONE json line:
  metric       render_ms for the headline config
  value        our render-only milliseconds (mean of RUNS timed runs,
               compile excluded — the reference's render_ms likewise
               excludes its setup, main.cu:334-343)
  vs_baseline  reference_ms / our_ms  (>1 == faster than the reference GPU)

Also emits derived Mrays/s and per-run times on stderr for humans.
"""
from __future__ import annotations

import json
import sys
import time

SCENE_ID = 1
WIDTH, HEIGHT = 1280, 768
SAMPLES = 100
BOUNCES = 25
RUNS = 3
BASELINE_RENDER_MS = 2879.33


def main() -> None:
    import jax

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.render_api import make_renderer

    from raytracingincuda_tpu.utils.timing import force

    cfg = RenderConfig(
        scene_id=SCENE_ID, width=WIDTH, height=HEIGHT,
        samples=SAMPLES, bounces=BOUNCES,
    )
    print(f"devices: {jax.devices()}", file=sys.stderr)
    renderer = make_renderer(cfg)
    scene = build_scene(cfg.scene_id, dtype=cfg.jnp_dtype)
    cam = CameraConfig.reference_default()
    scene = jax.device_put(scene)

    # compile + warmup (force() completes execution via device-side
    # checksum; block_until_ready alone may only ack dispatch on tunneled
    # PJRT transports — see utils/timing.py)
    t0 = time.perf_counter()
    force(renderer(scene, cam))
    print(f"compile+first run: {time.perf_counter() - t0:.2f}s",
          file=sys.stderr)

    times = []
    for r in range(RUNS):
        t0 = time.perf_counter()
        force(renderer(scene, cam))
        dt = (time.perf_counter() - t0) * 1e3
        times.append(dt)
        print(f"run {r}: {dt:.2f} ms", file=sys.stderr)

    render_ms = sum(times) / len(times)
    mrays = WIDTH * HEIGHT * SAMPLES / (render_ms * 1e-3) / 1e6
    print(f"camera-rays throughput: {mrays:.1f} Mrays/s", file=sys.stderr)

    print(json.dumps({
        "metric": f"scene{SCENE_ID}_{WIDTH}x{HEIGHT}_{SAMPLES}spp_"
                  f"{BOUNCES}bounces_render_ms",
        "value": round(render_ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_RENDER_MS / render_ms, 3),
    }))


if __name__ == "__main__":
    main()
