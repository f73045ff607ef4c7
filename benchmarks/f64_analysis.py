"""fp64-vs-fp32 precision analysis (CPU oracle) — the reference's
"double variants" role (SURVEY.md §2.1: GlobalDouble/ConstDouble exist to
measure what float precision costs in image quality and time).

TPU has no fp64 hardware (the f64 MXU/VPU path is emulated and measured
to hang/crawl on this stack — render_api fails fast), so the framework
serves the precision-comparison ROLE on the CPU oracle: same estimator,
same RNG streams, dtype the only variable. This script renders each
scene in f32 and f64, diffs the images exactly the way the reference's
ppm_diff workflow does (README.md:101-115: quantized per-component abs
diff), times both, and sets the ratios against the reference's published
GPU numbers (BASELINE.md: global_double 40270.38 ms vs global_float
2879.33 ms = 13.99x at 1280x768x100spp).

Writes benchmarks/results/f64_analysis.json; summarized in README.md
("Precision: the fp64 axis").
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.tracer import render
    from raytracingincuda_tpu.utils.ppm import quantize

    W, H, SPP, D = 320, 192, 10, 25
    results = {
        "config": {"width": W, "height": H, "samples": SPP, "bounces": D},
        "reference": {
            # BASELINE.md — RTX 3070 Laptop, 1280x768x100spp t8
            "global_float_ms": 2879.33,
            "global_double_ms": 40270.38,
            "double_over_float": round(40270.38 / 2879.33, 2),
            "const_double_ms": 41541.10,
        },
        "scenes": {},
    }

    for scene_id in (1, 2, 3):
        row = {}
        imgs = {}
        for dtype, name in ((jnp.float32, "f32"), (jnp.float64, "f64")):
            cam = CameraConfig.reference_default(dtype=dtype)
            scene = build_scene(scene_id, dtype=dtype)
            f = jax.jit(lambda s, c, dt=dtype: render(
                s, c, W, H, SPP, D, dtype=dt))
            img = np.asarray(jax.block_until_ready(f(scene, cam)))
            t0 = time.perf_counter()
            img = np.asarray(jax.block_until_ready(f(scene, cam)))
            row[f"{name}_render_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 1)
            imgs[name] = img
            print(f"scene {scene_id} {name}: {row[f'{name}_render_ms']} ms",
                  flush=True)

        a32, a64 = imgs["f32"].astype(np.float64), imgs["f64"]
        d = np.abs(a32 - a64)                      # gamma-space
        q32, q64 = quantize(a32), quantize(a64)    # the ppm_diff view
        ql = np.abs(q32.astype(np.int32) - q64.astype(np.int32))
        row.update(
            oracle_f64_over_f32=round(
                row["f64_render_ms"] / row["f32_render_ms"], 2),
            mean_abs_gamma=float(d.mean()),
            p999_abs_gamma=float(np.quantile(d, 0.999)),
            max_abs_gamma=float(d.max()),
            mean_abs_levels=float(ql.mean()),
            pct_components_ge1_level=float((ql >= 1).mean() * 100),
            pct_components_ge2_levels=float((ql >= 2).mean() * 100),
            max_levels=int(ql.max()),
        )
        results["scenes"][str(scene_id)] = row
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "f64_analysis.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
