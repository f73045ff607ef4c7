"""TPU probe: multi-pixel lanes (K) on the STREAM kernel.

K>1 averages each lane's traced-segment total over K pixels, shrinking
the max-over-lanes wave count per tile — worth 23% on the VMEM headline.
Stream waves are ~100x more expensive (O(N) block walk per wave), so
every wave saved is a bigger absolute win. Tuned culling configs from
cull_tpu.jsonl (10k: b256/g0, 100k: b256/g256).
"""
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
OUT = "benchmarks/results/stream_kpl.jsonl"


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    log({"event": "start", "devices": str(jax.devices()),
         "cfg": f"{W}x{H}x{SPP}spp_d{DEPTH}"})
    cam = CameraConfig.reference_default()
    for n, lg in ((10_000, 0), (100_000, 256)):
        scene = build_random_scene(n, seed=3)
        stream = prepare_stream_scene(scene, block=256)
        for k in (64,):
            f = jax.jit(lambda s=stream, k=k: render_pallas_stream(
                s, cam, W, H, SPP, DEPTH, lane_group=lg,
                pixels_per_lane=k, gamma=False))
            case = f"n{n}_g{lg}_k{k}"
            try:
                t0 = time.perf_counter()
                force(f())
                cs = round(time.perf_counter() - t0, 1)
                times = []
                for _ in range(RUNS):
                    t0 = time.perf_counter()
                    force(f())
                    times.append((time.perf_counter() - t0) * 1e3)
                log({"case": case, "ms": round(min(times), 1),
                     "compile_s": cs})
            except Exception as e:  # noqa: BLE001
                log({"case": case, "error": str(e)[:250]})


if __name__ == "__main__":
    main()
