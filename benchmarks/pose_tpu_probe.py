"""TPU probe: camera-pose recovery driving the PRODUCTION Pallas kernel.

ops/pose.refine_pose_fd accepts a ``render_fn`` override; this probe
plugs in the Mosaic regen-wavefront kernel (the same program the CLI
serves) so the FD pose loop's 12-renders-per-step run on real TPU —
the end-to-end production inverse-pose path. JSONL rows land in
benchmarks/results/pose_tpu.jsonl.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops import pose as poselib
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas

    out = open("benchmarks/results/pose_tpu.jsonl", "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    W, H, SPP, DEPTH = 96, 58, 16, 8
    scene = build_scene(2)
    cam = CameraConfig.reference_default()
    true = poselib.pose_of(cam)

    render_fn = jax.jit(lambda c: render_pallas(
        scene, c, W, H, SPP, DEPTH))
    t0 = time.perf_counter()
    target = jnp.asarray(render_fn(cam))
    target.block_until_ready()
    emit(event="target_rendered", compile_s=round(time.perf_counter() - t0, 1))

    d = jnp.array([0.71, -0.43, 0.56])
    d = 0.3 * d / jnp.linalg.norm(d)
    init_cam = poselib._cam_with_pose(cam, true._replace(
        lookfrom=true.lookfrom + d,
        lookat=true.lookat + 0.09 * jnp.array([-0.6, 0.45, 0.3]),
    ))

    t0 = time.perf_counter()
    rec, hist = poselib.refine_pose_fd(
        scene, target, init_cam, W, H, steps=60, render_fn=render_fn,
    )
    wall = time.perf_counter() - t0
    err = float(jnp.linalg.norm(rec.lookfrom - true.lookfrom))
    wt = true.lookfrom - true.lookat
    wr = rec.lookfrom - rec.lookat
    cos = float(jnp.dot(wt, wr)
                / (jnp.linalg.norm(wt) * jnp.linalg.norm(wr)))
    emit(case="pose_fd_pallas_96x58x16_d8", steps=60, wall_s=round(wall, 1),
         mse_final=hist[-1], lookfrom_err=round(err, 4),
         viewdir_cos=cos)
    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
