"""External ground-truth parity: our tracer vs the REBUILT reference
serial baseline on IDENTICAL geometry.

Round 1 noted the golden corpus is self-referential (the reference repo
ships no images). This closes it: the serial baseline's scene is fully
determined by unseeded glibc rand() (InOneWeekend/main.cc:24-66), which
models/reference_scene.py replays bit-exactly (validated against a C++
dump compiled against the reference's own headers — the geometry sha256
is pinned below). Rebuild the baseline, render its PPM, render the SAME
scene with this framework, and compare:

  ext_err  = |serial@10spp - ours@512spp|   (external render vs our truth)
  self_err = |ours@10spp   - ours@512spp|   (our own 10-spp MC noise)

The samplers are unrelated RNGs, so agreement means ext_err ~= self_err:
the serial image looks like just another 10-spp draw of the SAME
estimator. Large ext_err/self_err would indicate an estimator mismatch.

Usage:
  g++ -O3 -o /tmp/inoneweekend <ref>/src/InOneWeekend/main.cc
  /tmp/inoneweekend > /tmp/serial_scene1_1280x768_10spp_d20.ppm
  python benchmarks/external_parity.py [serial.ppm]

Renders on the default backend (TPU kernel; pass --platform cpu for the
oracle — slow at this size). Writes benchmarks/results/
external_parity.json.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import hashlib
import json

import numpy as np

# sha256 of the serial scene arrays (float64 bytes, construction order),
# pinned from the validated C++ dump comparison (2026-08-19)
GEOMETRY_SHA256 = (
    "aca58f22a147bd5a5c86f8d347b33f22026bd110e6ba19a99e47d5b83016a0f8"
)

W, H, DEPTH = 1280, 768, 20   # serial baseline config (main.cc:69-73)
SPP_MATCH = 10
SPP_TRUTH = 512


def geometry_digest() -> str:
    from raytracingincuda_tpu.models.reference_scene import (
        serial_scene1_arrays,
    )

    h = hashlib.sha256()
    for a in serial_scene1_arrays():
        h.update(np.ascontiguousarray(a, np.float64).tobytes())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("serial_ppm", nargs="?",
                    default="/tmp/serial_scene1_1280x768_10spp_d20.ppm")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out",
                    default="benchmarks/results/external_parity.json")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.reference_scene import (
        build_serial_reference_scene,
    )
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
    from raytracingincuda_tpu.ops.tracer import render as oracle_render
    from raytracingincuda_tpu.utils.ppm import quantize, read_ppm
    from raytracingincuda_tpu.utils.timing import force

    digest = geometry_digest()
    print(f"geometry sha256: {digest}", flush=True)
    if digest != GEOMETRY_SHA256:
        raise SystemExit(
            "geometry replica drifted from the pinned digest — re-validate "
            "against a C++ dump before trusting any comparison"
        )

    serial_img, maxval = read_ppm(args.serial_ppm)
    serial_q = np.asarray(serial_img)            # (H, W, 3) uint8-range
    assert serial_q.shape == (H, W, 3), serial_q.shape

    scene = build_serial_reference_scene()
    cam = CameraConfig.reference_default()
    on_cpu = jax.default_backend() == "cpu"

    def render_q(spp):
        if on_cpu:
            img = oracle_render(scene, cam, W, H, spp, DEPTH,
                                chunk_pixels=16384)
        else:
            img = render_pallas(scene, cam, W, H, spp, DEPTH,
                                pixels_per_lane=16, ray_tile=1024)
        # quantize on device; fetch uint8 (the tunnel moves ~20KB/s —
        # 2.9 MB uint8 beats 11 MB f32)
        q = jnp.clip(img, 0.0, 0.999)
        q = (256.0 * q).astype(jnp.uint8)
        force(q)
        return np.asarray(jax.device_get(q)).astype(np.int32)

    ours_truth = render_q(SPP_TRUTH)
    print("truth render fetched", flush=True)
    ours_match = render_q(SPP_MATCH)
    print("match render fetched", flush=True)

    def stats(a, b):
        d = np.abs(a.astype(np.int64) - b.astype(np.int64))
        return {
            "mean_levels": float(d.mean()),
            "p99_levels": float(np.quantile(d, 0.99)),
            "p999_levels": float(np.quantile(d, 0.999)),
            "max_levels": int(d.max()),
            "pct_ge4_levels": float((d >= 4).mean() * 100),
        }

    ext = stats(serial_q, ours_truth)
    self_noise = stats(ours_match, ours_truth)
    direct = stats(serial_q, ours_match)
    result = {
        "geometry_sha256": digest,
        "config": {"w": W, "h": H, "depth": DEPTH,
                   "spp_match": SPP_MATCH, "spp_truth": SPP_TRUTH,
                   "backend": jax.default_backend()},
        "serial_vs_ours_truth": ext,
        "ours10_vs_ours_truth": self_noise,
        "serial_vs_ours10": direct,
        "ext_over_self_mean": round(
            ext["mean_levels"] / max(self_noise["mean_levels"], 1e-9), 3),
    }
    print(json.dumps(result, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
