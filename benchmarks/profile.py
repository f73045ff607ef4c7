"""Kernel profiling capture: the analog of the reference's ``profile.sh``
(Nsight Compute ``ncu --set detailed -k render``) using jax.profiler/xprof.

Captures a device trace of the render for one config into a
TensorBoard-loadable directory, and prints coarse per-run stats
(render ms, camera Mrays/s) like the ncu text reports in
``kernel-profiling/*-render-profile.txt``.

Usage: python benchmarks/profile.py --scene_id 1 [--width 320 ...]
       [--logdir /tmp/rt-profile]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_id", type=int, default=1)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--bounces", type=int, default=25)
    ap.add_argument("--impl", default="oracle", choices=["oracle", "pallas"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--logdir", default="/tmp/rt-profile")
    args = ap.parse_args()

    import jax

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.render_api import make_renderer

    cfg = RenderConfig(
        scene_id=args.scene_id, width=args.width, height=args.height,
        samples=args.samples, bounces=args.bounces, impl=args.impl,
        dtype=args.dtype,
    )
    renderer = make_renderer(cfg)
    scene = jax.device_put(build_scene(cfg.scene_id, dtype=cfg.jnp_dtype))
    cam = CameraConfig.reference_default(dtype=cfg.jnp_dtype)

    from raytracingincuda_tpu.utils.timing import force

    force(renderer(scene, cam))  # compile outside trace

    with jax.profiler.trace(args.logdir):
        t0 = time.perf_counter()
        force(renderer(scene, cam))
        dt = time.perf_counter() - t0

    mrays = cfg.width * cfg.height * cfg.samples / dt / 1e6
    print(f"render: {dt * 1e3:.2f} ms, {mrays:.1f} camera-Mrays/s",
          file=sys.stderr)
    print(f"trace written to {args.logdir} (load with xprof/tensorboard)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
