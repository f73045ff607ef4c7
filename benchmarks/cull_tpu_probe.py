"""TPU probe: stream-kernel culling granularity sweep.

cull_stats_probe.py (offline) predicts block-group processing fractions:
b512/whole-wave 81%, b128/g128 36%, b64/g128 23%. This measures the
real-kernel effect of (block size x lane_group) on v5e, where the added
cost is one scalar bound test per (block x group) and more DMA messages.

Config matches the round-1 stream_probe entries (640x384x10spp/10b) so
numbers are directly comparable: 10k sorted was 3.25 s, 100k 28.4 s.
"""
import argparse
import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_random_scene
from raytracingincuda_tpu.ops.pallas_stream import (
    prepare_stream_scene, render_pallas_stream,
)
from raytracingincuda_tpu.utils.timing import force

W, H, SPP, DEPTH = 640, 384, 10, 10
RUNS = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/cull_tpu.jsonl")
    args = ap.parse_args()

    def log(rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log({"event": "start", "devices": str(jax.devices()),
         "cfg": f"{W}x{H}x{SPP}spp_d{DEPTH}"})

    cam = CameraConfig.reference_default()
    for n in (10_000, 100_000):
        scene = build_random_scene(n, seed=3)
        for block, lg in ((256, 0), (128, 0), (512, 256), (256, 256)):
            stream = prepare_stream_scene(scene, block=block)
            f = jax.jit(lambda s=stream: render_pallas_stream(
                s, cam, W, H, SPP, DEPTH, lane_group=lg, gamma=False))
            case = f"n{n}_b{block}_g{lg}"
            try:
                t0 = time.perf_counter()
                force(f())
                compile_s = round(time.perf_counter() - t0, 1)
                times = []
                for _ in range(RUNS):
                    t0 = time.perf_counter()
                    force(f())
                    times.append((time.perf_counter() - t0) * 1e3)
                log({"case": case, "ms": round(min(times), 1),
                     "compile_s": compile_s})
            except Exception as e:  # noqa: BLE001 — log and continue sweep
                log({"case": case, "error": str(e)[:300]})


if __name__ == "__main__":
    main()
