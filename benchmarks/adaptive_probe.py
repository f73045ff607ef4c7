"""TPU probe: adaptive sampling quality/time vs uniform spp.

Renders a high-spp truth image, then compares uniform renders against
adaptive schedules at matched quality: what per-pixel error does each
achieve, at what wall time and mean spp? JSONL out."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/adaptive_probe.jsonl")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--bounces", type=int, default=25)
    ap.add_argument("--truth_spp", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.adaptive import render_adaptive
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    W, H, D = args.width, args.height, args.bounces
    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))

    truth_fn = jax.jit(lambda s, c: render_pallas(
        s, c, W, H, args.truth_spp, D, gamma=False, pixels_per_lane=8))
    t0 = time.perf_counter()
    truth = truth_fn(scene, cam)          # stays on device
    force(truth)
    emit(case="truth", spp=args.truth_spp,
         secs=time.perf_counter() - t0)

    # error on DEVICE; only scalars cross the (slow) tunnel. Mean error
    # rewards spreading samples uniformly; adaptive targets the TAIL
    # (worst pixels), so report p99/p999 of the per-pixel error too.
    def _errs(a, b):
        d = jnp.mean(jnp.abs(a - b), axis=-1)
        return (jnp.mean(d), jnp.percentile(d, 99.0),
                jnp.percentile(d, 99.9))

    err_fn = jax.jit(_errs)

    def err_of(img):
        m, p99, p999 = err_fn(img, truth)
        return dict(err=float(m), p99=float(p99), p999=float(p999))

    for spp in (16, 32, 64, 100):
        f = jax.jit(lambda s, c, spp=spp: render_pallas(
            s, c, W, H, spp, D, gamma=False, pixels_per_lane=8))
        force(f(scene, cam))
        t0 = time.perf_counter()
        img = f(scene, cam)
        force(img)
        ms = (time.perf_counter() - t0) * 1e3
        emit(case=f"uniform_{spp}", ms=ms, mean_spp=spp, **err_of(img))

    for base, mx, tol, rounds in (
        (16, 256, 0.08, 1), (16, 256, 0.05, 1),
        (32, 512, 0.05, 1), (16, 128, 0.1, 1),
        # multi-round: re-estimate error after each refine pass
        (16, 256, 0.05, 2), (16, 256, 0.05, 3), (32, 512, 0.05, 2),
    ):
        kw = dict(base_spp=base, max_spp=mx, tol=tol, gamma=False,
                  rounds=rounds)
        res = render_adaptive(scene, cam, W, H, D, **kw)   # compile
        force(res.image)
        t0 = time.perf_counter()
        res = render_adaptive(scene, cam, W, H, D, **kw)
        force(res.image)
        ms = (time.perf_counter() - t0) * 1e3
        emit(case=f"adaptive_b{base}_m{mx}_t{tol}_r{rounds}", ms=ms,
             mean_spp=float(jnp.mean(res.spp_map.astype(jnp.float32))),
             **err_of(res.image))

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
