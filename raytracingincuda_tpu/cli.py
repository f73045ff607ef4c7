"""Command-line renderer: ``python -m raytracingincuda_tpu.cli --scene_id 1 …``

Drop-in replacement for the reference executables' CLI
(``GlobalFloat…/main.cu:38-77``): same six flags, same required
``--scene_id``, same output-filename convention, and the same two-value
stdout timing contract — ``render_ms,e2e_ms`` printed as two fixed-point
fields (``main.cu:342-343, 397-398``) — so the reference's benchmark sweep
scripts and CSV schema work unchanged against this renderer.

TPU-specific behavior: JIT compilation is excluded from timing by a warmup
render by default (the CUDA reference has no compile stage; including our
one-time tracing+XLA compile would measure the compiler, not the renderer).
Pass ``--no-warmup`` to include compilation in both timings.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu-raytrace",
        description="Super Raytrace: TPU-native ray tracing with JAX",
    )
    # the reference's six flags (main.cu:42-55)
    p.add_argument("--scene_id", type=int, help="ID of the scene to render")
    p.add_argument("--scene_file", type=str, default=None,
                   help="render a scene asset (.npz or .csv, models/io.py)"
                        " instead of a built-in --scene_id")
    p.add_argument("--width", type=int, default=320,
                   help="Width of the output image")
    p.add_argument("--height", type=int, default=192,
                   help="Height of the output image")
    p.add_argument("--samples", type=int, default=10,
                   help="Number of samples per pixel")
    p.add_argument("--bounces", type=int, default=25,
                   help="Maximum number of ray bounces")
    p.add_argument("--threads", type=int, default=8,
                   help="Kept for reference CLI parity; tile-size hint")
    # TPU-native axes (replace the reference's six binaries, SURVEY.md §2.1)
    p.add_argument("--dtype", choices=["float32", "float64", "bfloat16"],
                   default="float32")
    p.add_argument("--layout", choices=["hbm", "vmem", "packed"],
                   default="vmem",
                   help="scene memory layout (global/const/tex analog)")
    p.add_argument("--impl",
                   choices=["oracle", "pallas", "adaptive", "stream"],
                   default="pallas",
                   help="tracer implementation (pallas kernel, jnp oracle, "
                        "or adaptive per-pixel sampling)")
    p.add_argument("--seed", type=int, default=1227)
    p.add_argument("--legacy_sky", action="store_true",
                   help="reproduce the reference's primary-ray sky quirk "
                        "(camera.h:121)")
    p.add_argument("--chunk_pixels", type=int, default=None)
    p.add_argument("--rr_start", type=int, default=None,
                   help="Russian-roulette start depth (unbiased fast "
                        "mode; default off = reference-parity estimator)")
    p.add_argument("--max_samples", type=int, default=None,
                   help="impl=adaptive: per-pixel spp cap (default "
                        "4x --samples); --samples is the probe budget")
    p.add_argument("--adaptive_tol", type=float, default=0.05,
                   help="impl=adaptive: target relative error per pixel")
    p.add_argument("--adaptive_rounds", type=int, default=1,
                   help="impl=adaptive: refine rounds (>1 re-estimates "
                        "error after each refine pass)")
    p.add_argument("--mxu_dots", action="store_true",
                   help="impl=pallas: hit-test dot products on the MXU "
                        "(bf16x3; breaks exact oracle checksum parity)")
    p.add_argument("--stream_block", type=int, default=256,
                   help="impl=stream: spheres per HBM block")
    p.add_argument("--stream_lane_group", type=int, default=None,
                   help="impl=stream: cull granularity in lanes "
                        "(0 = one skip decision per wave; default auto "
                        "by scene size)")
    p.add_argument("--pixels_per_lane", type=int, default=None,
                   help="regen kernel pixels per lane (default auto; "
                        "K>1 shrinks the tile-tail work imbalance)")
    p.add_argument("--outdir", type=str, default=".")
    p.add_argument("--no-warmup", dest="warmup", action="store_false",
                   help="include JIT compilation in both timings")
    p.add_argument("--no-output", dest="write_output", action="store_false",
                   help="skip the PPM write (timing runs)")
    p.add_argument("--devices", type=int, default=0,
                   help="shard over this many devices (0 = all available)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu, tpu)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.scene_id is None and args.scene_file is None:
        print("Error: --scene_id (or --scene_file) is required.",
              file=sys.stderr)
        build_parser().print_help()
        return 1

    # Heavy imports after arg validation (fast --help).
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # float64 on CPU = native-f64 oracle (needs x64). float64 on an
    # accelerator = the emulated double-float kernel (render_api
    # make_df64_renderer): device arrays stay f32 (hi/lo pairs), so x64
    # stays off and the scene/camera are built f32 (the df64 pack
    # promotes host-side; reference camera values are f32-exact).
    df64_device = (args.dtype == "float64"
                   and jax.default_backend() != "cpu")
    if args.dtype == "float64" and not df64_device:
        jax.config.update("jax_enable_x64", True)

    from .config import RenderConfig
    from .models.camera import CameraConfig
    from .models.scene import build_scene
    from .render_api import make_renderer
    from .utils.ppm import write_ppm

    cfg = RenderConfig(
        scene_id=args.scene_id if args.scene_id is not None else 0,
        width=args.width,
        height=args.height,
        samples=args.samples,
        bounces=args.bounces,
        threads=args.threads,
        dtype=args.dtype,
        layout=args.layout,
        impl=args.impl,
        seed=args.seed,
        legacy_sky=args.legacy_sky,
        chunk_pixels=args.chunk_pixels,
        rr_start=args.rr_start,
        max_samples=args.max_samples,
        adaptive_tol=args.adaptive_tol,
        adaptive_rounds=args.adaptive_rounds,
        pixels_per_lane=args.pixels_per_lane,
        stream_block=args.stream_block,
        stream_lane_group=args.stream_lane_group,
        mxu_dots=args.mxu_dots,
    )

    from .utils.timing import force

    renderer = make_renderer(cfg, n_devices=args.devices)
    device_dtype = cfg.jnp_dtype
    if df64_device:
        import jax.numpy as jnp

        device_dtype = jnp.float32

    def make_scene():
        if args.scene_file is not None:
            from .models.io import load_scene

            return load_scene(args.scene_file, dtype=device_dtype)
        return build_scene(cfg.scene_id, seed=cfg.seed,
                           dtype=device_dtype)

    # Warmup: compile outside the timed region (see module docstring).
    scene_w = make_scene()
    cam_w = CameraConfig.reference_default(dtype=device_dtype)
    if args.warmup:
        force(renderer(scene_w, cam_w))

    # --- end-to-end timing starts (analog of main.cu:95) ---
    t_e2e0 = time.perf_counter()

    scene = make_scene()
    cam = CameraConfig.reference_default(dtype=device_dtype)
    scene = jax.device_put(scene)
    # host-side scene prep (stream/adaptive Morton sort + block bounds)
    # belongs to the setup phase, like the reference's H2D transfer
    # (main.cu:301-314 runs before render timing starts)
    prepare = getattr(renderer, "prepare", None)
    if prepare is not None:
        prepare(scene)

    # --- render-only timing (analog of main.cu:334-343) ---
    # force() completes execution via a 4-byte device-side checksum read —
    # see utils/timing.py for why block_until_ready is not enough here.
    t_r0 = time.perf_counter()
    img = renderer(scene, cam)
    force(img)
    render_ms = (time.perf_counter() - t_r0) * 1e3
    print(f"{render_ms:15.8f}", end=",")

    if args.write_output:
        out_path = os.path.join(args.outdir, cfg.output_filename())
        img_np = np.asarray(img, np.float64)
        if img_np.ndim == 4:
            # df64 pair (H, W, 3, 2): hi + lo in float64 reconstructs
            # the double-precision image exactly
            img_np = img_np[..., 0] + img_np[..., 1]
        write_ppm(out_path, img_np)

    e2e_ms = (time.perf_counter() - t_e2e0) * 1e3
    print(f"{e2e_ms:15.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
