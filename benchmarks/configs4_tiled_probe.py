"""configs[4]-SHAPE fwd+bwd via the tiled full-park fused step
(2400x1350x1000spp/d50 — BASELINE.json's multi-host target, measured
single-chip; the driver for the `configs4shape_*` rows in
baseline_configs.jsonl, previously an ad-hoc script).

The step runs as ``n_chunks`` static tile-range dispatches
(mse_train_pallas_tiled), each under the ~100 s worker ceiling.
Session-2 ladder: the 12.5 GB park budget admits K=3 at rt512
(11.5 GB; K1 was the old 8 GB-budget pick).

Usage: python benchmarks/configs4_tiled_probe.py [--cases k1 k3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, SPP, DEPTH, RR = 2400, 1350, 1000, 50, 2
OUT = "benchmarks/results/baseline_configs.jsonl"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="*", default=None)
    ap.add_argument("--chunks", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_backward import (
        make_tiled_train,
    )
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty,
    )
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log(event="start", probe="configs4_tiled",
        calib=measure_calibration(),
        cfg=f"{W}x{H}x{SPP}spp/d{DEPTH}_rr{RR}_tiled{args.chunks}")

    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()
    target = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3),
                                jnp.float32)
    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))
    order.block_until_ready()
    rays = W * H * SPP

    for name, k in (("k1", 1), ("k3", 3)):
        if args.cases and name not in args.cases:
            continue
        try:
            step = make_tiled_train(
                scene, cam, W, H, SPP, DEPTH, n_chunks=args.chunks,
                ray_tile=512, pixels_per_lane=k, pixel_order=order,
                rr_start=RR,
            )

            def once():
                t0 = time.perf_counter()
                loss, _img, d_sm, d_cr = step(target)
                force(d_sm)
                fin = bool(jnp.isfinite(d_sm).all()
                           & jnp.isfinite(d_cr).all()
                           & jnp.isfinite(loss))
                return time.perf_counter() - t0, fin
            # pass 1 compiles the chunk programs; pass 2 = the
            # steady-state training step (built jits reused)
            cold, _ = once()
            s, finite = once()
            log(case=f"configs4shape_{W}x{H}x{SPP}_d{DEPTH}_rr{RR}"
                     f"_tiled{args.chunks}_{name}",
                s=round(s, 2), mrays_s=round(rays / s / 1e6, 2),
                cold_s=round(cold, 2), grad_finite=finite)
        except Exception as e:  # noqa: BLE001
            log(case=name, error=repr(e)[:300])
    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
