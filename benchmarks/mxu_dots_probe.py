"""TPU probe: mxu_dots A/B at the headline config.

The per-wave hit test runs the VPU near peak; its two (N, R) dot-product
expansions (C.D, C.O) are ~1/3 of that work and can run on the otherwise
idle MXU at bf16x3 precision (pallas_kernel._hit_world_tile mxu_dots).
Never measured at the headline config until now. Also reports the mean
|image delta| vs the exact-VPU render to place the bf16x3 error against
the known seed-noise floor (bench.py: parity-vs-parity reseed mean
|d| = 0.0094 gamma-space).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from raytracingincuda_tpu.config import RenderConfig
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_scene
from raytracingincuda_tpu.render_api import make_renderer
from raytracingincuda_tpu.utils.timing import force

OUT = sys.argv[1] if len(sys.argv) > 1 else (
    "benchmarks/results/mxu_dots_probe.jsonl"
)
RUNS = 3
BASE = dict(scene_id=1, width=1280, height=768, samples=100, bounces=25,
            rr_start=2)


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    log({"event": "start", "devices": str(jax.devices())})
    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()

    imgs = {}
    for mxu in (False, True):
        cfg = RenderConfig(**BASE, mxu_dots=mxu)
        r = make_renderer(cfg)
        t0 = time.perf_counter()
        img = r(scene, cam)
        force(img)
        compile_s = round(time.perf_counter() - t0, 1)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            img = r(scene, cam)
            force(img)
            times.append((time.perf_counter() - t0) * 1e3)
        imgs[mxu] = img
        log({"case": f"headline_rr2_mxu{int(mxu)}",
             "ms": round(min(times), 1), "compile_s": compile_s})

    d = jnp.abs(imgs[True] - imgs[False])
    log({"case": "image_delta_vs_exact",
         "mean": round(float(d.mean()), 5),
         "p999": round(float(jnp.percentile(d, 99.9)), 5),
         "note": "seed-noise floor at this config: mean 0.0094"})
    log({"event": "done"})


if __name__ == "__main__":
    main()
