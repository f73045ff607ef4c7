"""TPU probe: adaptive sampling on a STREAMED 100k-sphere scene.

Per-pixel variance budgets + the HBM block kernel together: each wave is
an O(N) block walk, so samples saved by adaptivity are ~100x more
expensive than on the VMEM kernel — adaptivity should pay off harder
here. Truth at 64 spp uniform (same kernel); error metrics on device.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default="benchmarks/results/adaptive_stream.jsonl")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--bounces", type=int, default=10)
    ap.add_argument("--truth_spp", type=int, default=64)
    ap.add_argument("--adaptive_only", action="store_true",
                    help="skip the uniform-spp reference cases")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.adaptive import render_adaptive
    from raytracingincuda_tpu.ops.pallas_stream import (
        prepare_stream_scene, render_pallas_stream,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()), n=args.n,
         tag=args.tag)
    W, H, D = args.width, args.height, args.bounces
    cam = CameraConfig.reference_default()
    scene = build_random_scene(args.n, seed=3)
    stream = prepare_stream_scene(scene)
    lg = 256 if args.n >= 50_000 else 0

    def uniform(spp):
        return jax.jit(lambda: render_pallas_stream(
            stream, cam, W, H, spp, D, gamma=False, lane_group=lg,
            pixels_per_lane=32))

    t0 = time.perf_counter()
    truth = uniform(args.truth_spp)()
    force(truth)
    emit(case="truth", spp=args.truth_spp,
         s=round(time.perf_counter() - t0, 1))

    def _errs(a, b):
        lum = jnp.array([0.2126, 0.7152, 0.0722])
        la, lb = a @ lum, b @ lum
        e = jnp.abs(la - lb) / jnp.maximum(lb, 0.05)
        return (jnp.mean(e), jnp.percentile(e, 99.0),
                jnp.percentile(e, 99.9))

    err_fn = jax.jit(_errs)

    def err_of(img):
        m, p99, p999 = err_fn(img, truth)
        return dict(err=round(float(m), 5), p99=round(float(p99), 5),
                    p999=round(float(p999), 5))

    for spp in () if args.adaptive_only else (8, 16, 24):
        f = uniform(spp)
        force(f())
        t0 = time.perf_counter()
        img = f()
        force(img)
        ms = round((time.perf_counter() - t0) * 1e3, 1)
        emit(case=f"uniform_{spp}", ms=ms, mean_spp=spp, **err_of(img))

    for base, mx, tol in ((8, 32, 0.10), (8, 32, 0.06), (8, 48, 0.06)):
        def run():
            return render_adaptive(
                scene, cam, W, H, D, base_spp=base, max_spp=mx,
                tol=tol, gamma=False, stream=stream,
                stream_lane_group=lg,
            )
        res = run()
        force(res.image)        # compile
        t0 = time.perf_counter()
        res = run()
        force(res.image)
        ms = round((time.perf_counter() - t0) * 1e3, 1)
        emit(case=f"adaptive_b{base}_m{mx}_t{tol}", ms=ms,
             mean_spp=round(float(jnp.mean(res.spp_map)), 1),
             **err_of(res.image))
    emit(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
