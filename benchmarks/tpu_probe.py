"""Sequential TPU measurement runner.

Runs a battery of renderer timings in ONE long-lived process (the remote
compile service dislikes clients dying mid-compile) and appends JSON lines
to a results file as each measurement lands, so progress survives a kill.

Usage: python benchmarks/tpu_probe.py --out /tmp/probe.jsonl [--quick]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import functools
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_probe.jsonl")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated impl filter (pallas,oracle)")
    args = ap.parse_args()

    import jax

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
    from raytracingincuda_tpu.ops.tracer import render as render_oracle
    from raytracingincuda_tpu.utils.timing import force

    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))

    small = dict(img_width=320, img_height=192, samples_per_pixel=10,
                 max_depth=25)
    head = dict(img_width=1280, img_height=768, samples_per_pixel=100,
                max_depth=25)

    cases = [
        ("pallas_small_t512", render_pallas, dict(**small, ray_tile=512)),
        ("pallas_head_t512", render_pallas, dict(**head, ray_tile=512)),
        ("oracle_head", render_oracle, dict(**head, chunk_pixels=8192)),
    ]
    if args.quick:
        cases = cases[:2]
    if args.only:
        keep = args.only.split(",")
        cases = [c for c in cases if any(k in c[0] for k in keep)]

    results = []
    with open(args.out, "a") as out:
        for name, fn, kw in cases:
            rec = {"name": name, "ts": time.time()}
            try:
                f = jax.jit(functools.partial(fn, **kw))
                t0 = time.time()
                chk = force(f(scene, cam))
                rec["compile_s"] = round(time.time() - t0, 1)
                rec["checksum"] = round(chk, 1)
                runs = []
                for _ in range(3):
                    t0 = time.time()
                    force(f(scene, cam))
                    runs.append((time.time() - t0) * 1e3)
                rec["best_ms"] = round(min(runs), 1)
                rec["runs_ms"] = [round(r, 1) for r in runs]
            except Exception as e:  # keep going; record the failure
                rec["error"] = str(e)[:400]
            print(json.dumps(rec), file=out, flush=True)
            print(json.dumps(rec), file=sys.stderr, flush=True)
            results.append(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
