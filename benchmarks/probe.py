"""Parameterized forward-render probe runner (replaces the
parity_tune{,2,3,4} / kpl / stream_kpl / cull_tpu / stream / tpu_probe /
mxu_dots scaffolding copies — round-2 VERDICT weak #6; their committed
results in benchmarks/results/ stay).

Runs the cartesian grid of comma-separated knob values against one
implementation and writes JSONL rows as they land (compile-service
etiquette: ONE process, never die mid-compile).

Examples:
  # parity_tune-style K x rt grid at the headline
  python benchmarks/probe.py --width 1280 --height 768 --samples 100 \
      --k 8,16,32 --rt 512,1024 --sorted 1 --out results/tune.jsonl
  # stream culling-granularity sweep on a 100k random scene
  python benchmarks/probe.py --impl stream --random_spheres 100000 \
      --width 640 --height 384 --samples 10 --bounces 10 \
      --k 32 --lane_group 0,128,256 --block 128,256
  # mxu_dots A/B with image-delta vs the first leg
  python benchmarks/probe.py --width 1280 --height 768 --samples 100 \
      --k 16 --rt 1024 --mxu_dots 0,1 --compare_first
  # df64 ladder
  python benchmarks/probe.py --impl df64 --width 640 --height 384 \
      --samples 100 --k 1,16 --sorted 0,1
"""
from __future__ import annotations

import argparse
import itertools

from probe_lib import (
    build_forward, emitter, time_pipelined, time_wall,
)


def _intlist(s):
    return [int(v) for v in str(s).split(",")]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "stream", "df64", "oracle"])
    ap.add_argument("--scene_id", type=int, default=1)
    ap.add_argument("--random_spheres", type=int, default=0,
                    help="use build_random_scene(N) instead of --scene_id")
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--bounces", type=int, default=25)
    # grid knobs (comma lists)
    ap.add_argument("--k", default="1")
    ap.add_argument("--rt", default="512")
    ap.add_argument("--sorted", default="0")
    ap.add_argument("--mxu_dots", default="0")
    ap.add_argument("--lane_group", default="0")
    ap.add_argument("--block", default="256")
    ap.add_argument("--layout", default="vmem")
    ap.add_argument("--rr_start", type=int, default=None)
    # measurement
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--pipeline", type=int, default=0,
                    help="also record the N-deep pipelined device bracket")
    ap.add_argument("--compare_first", action="store_true",
                    help="record mean|image delta| vs the first leg")
    ap.add_argument("--tag", default="")
    ap.add_argument("--out", default="benchmarks/results/probe.jsonl")
    args = ap.parse_args()

    import jax
    import numpy as np

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import (
        build_random_scene, build_scene,
    )

    emit = emitter(args.out)
    scene = (build_random_scene(args.random_spheres, seed=3)
             if args.random_spheres else build_scene(args.scene_id))
    cam = CameraConfig.reference_default()
    emit(event="start", backend=jax.default_backend(), impl=args.impl,
         tag=args.tag,
         config=f"{args.width}x{args.height}x{args.samples}spp/"
                f"d{args.bounces}",
         scene=(f"random{args.random_spheres}" if args.random_spheres
                else f"scene{args.scene_id}"))

    grid = itertools.product(
        _intlist(args.k), _intlist(args.rt), _intlist(args.sorted),
        _intlist(args.mxu_dots), _intlist(args.lane_group),
        _intlist(args.block),
    )
    img0 = None
    for k, rt, srt, mxu, lg, blk in grid:
        spec = dict(
            impl=args.impl, width=args.width, height=args.height,
            samples=args.samples, bounces=args.bounces, k=k, rt=rt,
            sorted=bool(srt), mxu_dots=bool(mxu), lane_group=lg,
            block=blk, layout=args.layout, rr_start=args.rr_start,
        )
        case = (f"k{k}_rt{rt}" + ("_sorted" if srt else "")
                + (f"_mxu" if mxu else "")
                + (f"_g{lg}" if lg else "") + f"_b{blk}")
        try:
            fn, info = build_forward(spec, scene, cam)
            row = dict(case=case, tag=args.tag, **info)
            row.update(time_wall(fn, scene, cam, reps=args.reps))
            if args.pipeline:
                row["pipelined_ms"] = time_pipelined(
                    fn, scene, cam, n=args.pipeline)
            if args.compare_first:
                img = np.asarray(fn(scene, cam))
                if img0 is None:
                    img0 = img
                row["mean_abs_delta_vs_first"] = float(
                    np.abs(img - img0).mean())
            emit(**row)
        except Exception as e:  # noqa: BLE001
            emit(case=case, tag=args.tag, error=repr(e)[:300])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
