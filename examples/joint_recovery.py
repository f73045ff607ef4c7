"""Joint camera-pose + scene-parameter recovery (bundle-adjustment style).

Recovers BOTH the camera pose and the small-sphere albedos of scene 2
from one path-traced target, combining the two estimators that each
handle what the other cannot:

  pose   — deterministic-FD gradient on the real MSE (boundary terms
           included; 12 renders for 6 dims — the ops/pose.py mechanism).
  scene  — exact detached-sampler analytic gradients (interior terms;
           ops/grad machinery), thousands of dims for 1 backward pass.

The update is JOINT (one Adam step on each, every iteration, after a
pose-only warmup), not block-alternated: coarse alternation measured
unstable here — 40 albedo steps at a wrong pose absorb the pose error
into the albedos, then the pose descends the corrupted landscape and
the two oscillate. Fine-grained interleaving with persistent optimizer
state behaves like joint gradient descent and converges.

Usage: python examples/joint_recovery.py [--iters 70] [--platform cpu]
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
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument("--iters", type=int, default=70)
    ap.add_argument("--pose_warmup", type=int, default=15,
                    help="pose-only iterations before albedos unfreeze "
                         "(gray albedos don't corrupt the pose signal, "
                         "but a wrong pose corrupts the albedo fit)")
    ap.add_argument("--scene_steps", type=int, default=3,
                    help="analytic scene steps per joint iteration")
    ap.add_argument("--perturb", type=float, default=0.2)
    ap.add_argument("--fd_eps", type=float, default=2e-2)
    ap.add_argument("--pose_lr", type=float, default=2e-2)
    ap.add_argument("--scene_lr", type=float, default=2e-2)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import (
        Scene, SceneParams, build_scene,
    )
    from raytracingincuda_tpu.ops import grad as gradlib
    from raytracingincuda_tpu.ops import pose as poselib
    from raytracingincuda_tpu.ops.tracer import render
    from raytracingincuda_tpu.ops.vec import Vec3

    W, H, SPP, D = args.width, args.height, args.samples, args.bounces
    true_scene = build_scene(2, pad_to_multiple=64)
    true_cam = CameraConfig.reference_default()
    true_pose = poselib.pose_of(true_cam)

    print("rendering target at the true pose/scene...", file=sys.stderr)
    # LINEAR radiance target: the analytic train step compares in linear
    # space (grad.make_loss_fn gamma=False — sqrt-gamma has unbounded
    # slope at black pixels), so the shared target and the FD objective
    # must live there too
    target = render(true_scene, true_cam, W, H, SPP, D, gamma=False)

    # init: gray albedos + a perturbed pose
    gray = jnp.full_like(true_scene.params.albedo.x, 0.5)
    params = true_scene.params._replace(albedo=Vec3(gray, gray, gray))
    dirn = jnp.array([0.71, -0.43, 0.56])
    dirn = args.perturb * dirn / jnp.linalg.norm(dirn)
    pose = true_pose._replace(
        lookfrom=true_pose.lookfrom + dirn,
        lookat=true_pose.lookat
        + 0.3 * args.perturb * jnp.array([-0.6, 0.45, 0.3]),
    )

    # ONE jitted render shared by the FD pose grad and progress reports:
    # pose and scene params are jit ARGUMENTS, so the whole joint loop
    # compiles exactly once
    @jax.jit
    def mse_at(pose_vec, p):
        cam = poselib._cam_with_pose(
            true_cam, poselib.PoseState(pose_vec[:3], pose_vec[3:]))
        img = render(Scene(p, true_scene.mat_type, true_scene.active),
                     cam, W, H, SPP, D, gamma=False)
        return jnp.mean((img - target) ** 2)

    trainable = SceneParams(
        center=Vec3(False, False, False), radius=False,
        albedo=Vec3(True, True, True), fuzz=False, ior=False,
    )
    init_fn, step_fn = gradlib.make_train_step(
        W, H, SPP, D, learning_rate=args.scene_lr, trainable=trainable,
    )
    step_fn = jax.jit(step_fn)
    state = init_fn(params)

    x = jnp.concatenate([pose.lookfrom, pose.lookat])
    pose_opt = optax.adam(args.pose_lr)
    pose_opt_state = pose_opt.init(x)

    def errs(x, p):
        ef = float(jnp.linalg.norm(x[:3] - true_pose.lookfrom))
        ea = float(jnp.mean(jnp.abs(
            p.albedo.x - true_scene.params.albedo.x
        ) * true_scene.active))
        return ef, ea

    ef, ea = errs(x, state.params)
    print(f"init    : pose err {ef:.4f}  albedo L1 {ea:.4f}",
          file=sys.stderr)

    t0 = time.time()
    loss = None
    for it in range(args.iters):
        # pose: central FD on the joint MSE at the current scene
        g = np.zeros(6, np.float32)
        for k in range(6):
            e = jnp.zeros(6).at[k].set(args.fd_eps)
            g[k] = float(
                (mse_at(x + e, state.params)
                 - mse_at(x - e, state.params)) / (2 * args.fd_eps))
        upd, pose_opt_state = pose_opt.update(jnp.asarray(g),
                                              pose_opt_state)
        x = optax.apply_updates(x, upd)

        # scene: analytic steps at the current pose (after warmup)
        if it >= args.pose_warmup:
            cam = poselib._cam_with_pose(
                true_cam, poselib.PoseState(x[:3], x[3:]))
            for _ in range(args.scene_steps):
                state, loss = step_fn(state, cam, true_scene.mat_type,
                                      true_scene.active, target)

        if it % 10 == 9 or it == args.iters - 1:
            ef, ea = errs(x, state.params)
            cur = float(loss) if loss is not None else float(
                mse_at(x, state.params))
            print(f"iter {it:3d}: pose err {ef:.4f}  albedo L1 {ea:.4f}"
                  f"  loss {cur:.6f}  ({time.time() - t0:.0f}s)",
                  file=sys.stderr)

    ef, ea = errs(x, state.params)
    final_loss = float(mse_at(x, state.params))
    # success: pose recovered, image matched, albedos moved toward truth.
    # The all-sphere albedo L1 cannot reach zero at this resolution —
    # spheres covering no pixels are unobservable in ANY estimator — so
    # the criterion is improvement + image-space convergence, like the
    # MSE objective itself.
    ea0 = 0.2121
    ok = ef < 0.05 and final_loss < 5e-5 and ea < 0.9 * ea0
    print(f"final   : pose err {ef:.4f}  albedo L1 {ea:.4f} "
          f"(init {ea0})  image MSE {final_loss:.2e}", file=sys.stderr)
    print("OK" if ok else "NOT CONVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
