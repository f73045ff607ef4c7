"""TPU probe: streaming-HBM block kernel on large scenes.

Measures render_pallas_stream (double-buffered HBM blocks + Morton block
culling) against the VMEM-resident kernel where the scene still fits, and
scaling in N where it does not. JSONL out (compile-service etiquette)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stream_probe.jsonl")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import (
        build_random_scene, build_scene,
    )
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    cam = CameraConfig.reference_default()
    W, H, SPP, DEPTH = 640, 384, 10, 10

    def timed(tag, fn, *a, **k):
        try:
            f = jax.jit(lambda: fn(*a, **k))
            t0 = time.perf_counter()
            force(f())
            comp = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f())
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=min(times), compile_s=comp)
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:400])

    # reference scene 1 (488 spheres): stream vs vmem kernel
    scene1 = jax.device_put(build_scene(1))
    stream1 = prepare_stream_scene(scene1, block=512)
    timed("vmem_scene1", render_pallas, scene1, cam, W, H, SPP, DEPTH)
    timed("stream_scene1_b512", render_pallas_stream, stream1, cam,
          W, H, SPP, DEPTH)

    sizes = [10_000] if args.quick else [10_000, 100_000]
    for n in sizes:
        big = build_random_scene(n)
        stream_s = prepare_stream_scene(big, block=1024)
        stream_u = prepare_stream_scene(big, block=1024, sort=False)
        timed(f"stream_n{n}_b1024_sorted", render_pallas_stream, stream_s,
              cam, W, H, SPP, DEPTH)
        timed(f"stream_n{n}_b1024_unsorted", render_pallas_stream, stream_u,
              cam, W, H, SPP, DEPTH)
        if n <= 10_000:
            # vmem kernel still fits: direct comparison
            timed(f"vmem_n{n}", render_pallas, big, cam, W, H, SPP, DEPTH)

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
