"""Camera-pose recovery from a path-traced image.

The detached-sampler gradient estimator (the production backward path)
carries no boundary terms, so pose descent on the raw path-traced MSE
random-walks (docs/ROADMAP.md). This example runs the two-stage
pipeline from ops/pose.py that fixes it:

  stage 1  recover_pose      — Adam on the smoothed-visibility surrogate
                               (closed-form soft sphere silhouettes:
                               edge-aware by construction) under an
                               image pyramid; wide capture basin.
  stage 2  refine_pose_fd    — central finite differences on the REAL
                               path-traced MSE (bit-deterministic
                               renders => a noise-free objective whose
                               FD includes the boundary terms).

Usage: python examples/pose_recovery.py [--width 96 --height 58]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=58)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--perturb", type=float, default=0.3,
                    help="initial lookfrom error, world units")
    ap.add_argument("--soft_steps", type=int, default=300,
                    help="stage-1 soft-surrogate steps (perturb >= 0.5)")
    ap.add_argument("--fd_steps", type=int, default=60,
                    help="stage-2 FD refinement steps")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops import pose as poselib
    from raytracingincuda_tpu.ops import tracer

    W, H = args.width, args.height
    scene = build_scene(2)
    cam = CameraConfig.reference_default()
    true = poselib.pose_of(cam)

    print(f"target: path-traced {W}x{H}x{args.samples}spp/"
          f"d{args.bounces} at the true pose")
    target = tracer.render(scene, cam, W, H, args.samples, args.bounces)

    d = jnp.array([0.71, -0.43, 0.56])
    d = args.perturb * d / jnp.linalg.norm(d)
    init_cam = poselib._cam_with_pose(cam, true._replace(
        lookfrom=true.lookfrom + d,
        lookat=true.lookat + 0.3 * args.perturb
        * jnp.array([-0.6, 0.45, 0.3]),
    ))

    def report(tag, ps):
        ef = float(jnp.linalg.norm(ps.lookfrom - true.lookfrom))
        wt = true.lookfrom - true.lookat
        wr = ps.lookfrom - ps.lookat
        cos = jnp.dot(wt, wr) / (jnp.linalg.norm(wt) * jnp.linalg.norm(wr))
        ang = float(jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0))))
        c = poselib._cam_with_pose(cam, ps)
        mse = float(jnp.mean(
            (tracer.render(scene, c, W, H, args.samples, args.bounces)
             - target) ** 2))
        print(f"{tag}: lookfrom err {ef:.4f}  view-dir err {ang:.3f} deg  "
              f"path-traced MSE {mse:.6f}")
        return ef

    report("init     ", poselib.pose_of(init_cam))

    # The soft surrogate's EDGE objective is a coarse-capture stage for
    # LARGE pose errors (it lands within ~0.8 units of truth from
    # anywhere silhouettes still overlap); for moderate errors the FD
    # stage alone converges and the detour is counterproductive
    # (measured: from 0.3, edges move the pose to 0.76 before FD pulls
    # it back).
    stage2_cam = init_cam
    if args.perturb >= 0.5:
        t0 = time.time()
        soft_pose, losses = poselib.recover_pose(
            scene, target, init_cam, W, H, steps=args.soft_steps, objective="edges",
        )
        print(f"stage 1 (soft surrogate, edge objective, "
              f"{time.time() - t0:.0f}s): "
              f"loss {losses[0]:.5f} -> {losses[-1]:.6f}")
        report("stage 1  ", soft_pose)
        stage2_cam = poselib._cam_with_pose(cam, soft_pose)

    t0 = time.time()
    refined, hist = poselib.refine_pose_fd(
        scene, target, stage2_cam, W, H,
        samples_per_pixel=args.samples, max_depth=args.bounces,
        steps=args.fd_steps,
    )
    print(f"stage 2 (FD on real MSE, {time.time() - t0:.0f}s): "
          f"MSE {hist[0]:.6f} -> {hist[-1]:.6f}")
    ef = report("recovered", refined)
    print("OK" if ef < 0.1 else "NOT CONVERGED")
    return 0 if ef < 0.1 else 1


if __name__ == "__main__":
    raise SystemExit(main())
