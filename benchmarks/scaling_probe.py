"""Scaling-efficiency harness: rays/s vs device count (north star:
>=80% efficiency 1 chip -> 1 host -> >=2 hosts).

Runs the PRODUCTION render path (make_renderer, which shards the ray
grid over a mesh; single- and multi-device renders are bit-identical by
the counter-RNG contract) at each device count and reports throughput
and efficiency vs 1 device.

Ready-to-run for real multi-chip hardware; until then:
  --virtual N   run on N virtual CPU devices (sets
                xla_force_host_platform_device_count before importing
                jax). CPU numbers validate the MECHANICS (sharding
                compiles, executes, scales the work); they are not TPU
                performance.

On a multi-host pod: launch one process per host under the usual
JAX_COORDINATOR_ADDRESS env; maybe_initialize_distributed() picks it up
and meshes span hosts.

Usage:
  python benchmarks/scaling_probe.py --virtual 8 --impl oracle
  python benchmarks/scaling_probe.py --width 1280 --height 768 \
      --samples 100 --impl pallas          # on a real slice
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="use N virtual CPU devices (mechanics check)")
    ap.add_argument("--scene_id", type=int, default=1)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--bounces", type=int, default=25)
    ap.add_argument("--impl", default="oracle",
                    choices=["oracle", "pallas"])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/results/scaling.jsonl")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.virtual:
        # the env's sitecustomize force-overrides JAX_PLATFORMS; the
        # config update after import wins (tests/conftest.py pattern)
        jax.config.update("jax_platforms", "cpu")

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.render_api import make_renderer
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    n_all = len(jax.devices())
    emit(event="start", devices=n_all, backend=jax.default_backend(),
         impl=args.impl, config=f"{args.width}x{args.height}"
         f"x{args.samples}spp/d{args.bounces}")

    cfg = RenderConfig(
        scene_id=args.scene_id, width=args.width, height=args.height,
        samples=args.samples, bounces=args.bounces, impl=args.impl,
    )
    scene = build_scene(args.scene_id)
    cam = CameraConfig.reference_default()
    rays = args.width * args.height * args.samples

    counts = sorted({n for n in (1, 2, 4, 8, n_all) if 1 <= n <= n_all})
    base_rate = None
    img0 = None
    for n in counts:
        try:
            renderer = make_renderer(cfg, n_devices=n)
            force(renderer(scene, cam))  # compile
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                img = renderer(scene, cam)
                force(img)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            rate = rays / dt / 1e6
            if base_rate is None:
                base_rate = rate
                img0 = img
            eff = rate / (base_rate * n)
            import numpy as np

            maxdiff = float(abs(np.asarray(img) - np.asarray(img0)).max())
            emit(n_devices=n, render_ms=round(dt * 1e3, 2),
                 mrays_per_s=round(rate, 2),
                 efficiency_vs_1dev=round(eff, 4),
                 maxdiff_vs_1dev=maxdiff)
        except Exception as e:  # noqa: BLE001
            emit(n_devices=n, error=repr(e)[:300])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
