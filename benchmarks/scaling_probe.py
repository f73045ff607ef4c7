"""Scaling-efficiency harness: rays/s vs device count (north star:
>=80% efficiency 1 chip -> 1 host -> >=2 hosts).

Drives the PRODUCTION render path at each device count and reports
throughput, efficiency vs 1 device, and bit-identity of the image:

  --impl oracle   make_renderer's sharded jnp tracer
  --impl pallas   the production Pallas kernel through its shard_map
                  path (ops/pallas_kernel.render_pallas mesh=...) —
                  real Mosaic on TPU, interpret on CPU
  --train         additionally times the FUSED train step
                  (grad.make_train_step impl='fused') over the same mesh

Ready-to-run for real multi-chip hardware; until then:
  --virtual N   run on N virtual CPU devices (sets
                xla_force_host_platform_device_count before importing
                jax). CPU numbers validate the MECHANICS (sharding
                compiles, executes, scales the work, image identical);
                interpret-mode times are not TPU performance.

On a multi-host pod: launch one process per host under the usual
JAX_COORDINATOR_ADDRESS env; maybe_initialize_distributed() picks it up
and meshes span hosts (see benchmarks/multihost_probe.py for the
executed 2-process flow).

Usage:
  python benchmarks/scaling_probe.py --virtual 8 --impl pallas \
      --width 640 --height 384 --samples 100        # mechanics check
  python benchmarks/scaling_probe.py --impl pallas --train \
      --width 1280 --height 768 --samples 100       # on a real slice
"""
from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--bounces", type=int, default=25)
    ap.add_argument("--impl", default="pallas",
                    choices=["oracle", "pallas"])
    ap.add_argument("--train", action="store_true",
                    help="also time the fused train step per count")
    ap.add_argument("--train_samples", type=int, default=4,
                    help="spp for the train-step leg")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--counts", type=int, nargs="*", default=None,
                    help="device counts (default 1 2 4 8 all)")
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

    import numpy as np

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops import grad as gradlib
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
    from raytracingincuda_tpu.parallel import mesh as meshlib
    from raytracingincuda_tpu.render_api import make_renderer
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    interpret = jax.default_backend() == "cpu"
    # Virtual CPU meshes validate MECHANICS only (sharding compiles,
    # executes, bit-identical image); their timings are CPU-contention
    # noise — emitting an "efficiency" there invites misreading it as a
    # scaling measurement (VERDICT r3 weak #5). perf_valid marks which
    # rows carry meaningful throughput; efficiency is suppressed on
    # interpret/CPU backends.
    perf_valid = not interpret
    n_all = len(jax.devices())
    emit(event="start", devices=n_all, backend=jax.default_backend(),
         impl=args.impl, interpret=interpret, train=args.train,
         perf_valid=perf_valid,
         note=(None if perf_valid else
               "virtual CPU mesh: bit-identity check only — timings are "
               "not a scaling measurement"),
         config=f"{args.width}x{args.height}"
         f"x{args.samples}spp/d{args.bounces}")

    scene = build_scene(args.scene_id)
    cam = CameraConfig.reference_default()
    rays = args.width * args.height * args.samples

    def make_render_fn(n):
        if args.impl == "pallas":
            mesh = meshlib.make_mesh(n) if n > 1 else None
            return jax.jit(functools.partial(
                render_pallas, img_width=args.width,
                img_height=args.height,
                samples_per_pixel=args.samples, max_depth=args.bounces,
                mesh=mesh, interpret=interpret,
            ))
        cfg = RenderConfig(
            scene_id=args.scene_id, width=args.width, height=args.height,
            samples=args.samples, bounces=args.bounces, impl=args.impl,
        )
        return make_renderer(cfg, n_devices=n)

    def make_train_fn(n):
        mesh = meshlib.make_mesh(n) if n > 1 else None
        init_fn, step_fn = gradlib.make_train_step(
            args.width, args.height, args.train_samples, args.bounces,
            impl="fused", mesh=mesh, interpret=interpret,
        )
        state = init_fn(scene.params)
        target = np.zeros((args.height, args.width, 3), np.float32)
        step = jax.jit(step_fn)
        return state, step, target

    counts = args.counts or sorted(
        {n for n in (1, 2, 4, 8, n_all) if 1 <= n <= n_all})
    base_rate = None
    img0 = None
    train_base = None
    for n in counts:
        try:
            renderer = make_render_fn(n)
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
                img0 = np.asarray(img)
            maxdiff = float(abs(np.asarray(img) - img0).max())
            rec = dict(n_devices=n, impl=args.impl,
                       render_ms=round(dt * 1e3, 2),
                       mrays_per_s=round(rate, 2),
                       maxdiff_vs_1dev=maxdiff, perf_valid=perf_valid)
            if perf_valid:
                rec["efficiency_vs_1dev"] = round(rate / (base_rate * n), 4)
            emit(**rec)
        except Exception as e:  # noqa: BLE001
            emit(n_devices=n, impl=args.impl, error=repr(e)[:300])
        if not args.train:
            continue
        try:
            state, step, target = make_train_fn(n)
            s1, loss = step(state, cam, scene.mat_type, scene.active,
                            target)
            force(s1.params)  # compile + complete
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                s2, loss = step(state, cam, scene.mat_type, scene.active,
                                target)
                force(s2.params)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            t_rays = args.width * args.height * args.train_samples
            t_rate = t_rays / dt / 1e6
            if train_base is None:
                train_base = t_rate
            rec = dict(n_devices=n, impl="fused_train",
                       step_ms=round(dt * 1e3, 2),
                       mrays_per_s=round(t_rate, 2),
                       loss=float(loss), perf_valid=perf_valid)
            if perf_valid:
                rec["efficiency_vs_1dev"] = round(
                    t_rate / (train_base * n), 4)
            emit(**rec)
        except Exception as e:  # noqa: BLE001
            emit(n_devices=n, impl="fused_train", error=repr(e)[:300])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
