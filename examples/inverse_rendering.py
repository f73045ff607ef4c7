"""Inverse rendering demo: recover sphere albedos from a target image.

A capability the CUDA reference cannot express: because the whole tracer is
differentiable (detached-sampler gradients, ops/grad.py), scene parameters
can be fit to observations by gradient descent — here, re-discovering the
small-sphere albedos of scene 2 from a single rendered target, starting
from gray.

Run:  python examples/inverse_rendering.py [--steps 200] [--platform cpu]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=58)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--impl",
                    choices=["oracle", "pallas", "fused", "stream"],
                    default="oracle",
                    help="pallas: Pallas forward + Pallas backward kernel "
                         "(TPU; the train loop stays unjitted at top level "
                         "— one Mosaic kernel per program). fused: ONE "
                         "kernel computes loss AND grads, so the whole "
                         "step jits end-to-end (fastest on TPU). stream: "
                         "the HBM-streamed kernels — works for scenes far "
                         "beyond VMEM (try --n_spheres 10000)")
    ap.add_argument("--n_spheres", type=int, default=0,
                    help="impl=stream: train on a random scene of this "
                         "size instead of scene 2")
    ap.add_argument("--loss", default="mse",
                    choices=["mse", "l1", "huber", "relmse"],
                    help="fused-step per-pixel loss family (impl=fused/"
                         "stream; relmse is the HDR robustifier, "
                         "huber/l1 tame target fireflies)")
    ap.add_argument("--out", default="recovered.ppm")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import SceneParams, build_scene
    from raytracingincuda_tpu.ops import grad as gradlib
    from raytracingincuda_tpu.ops.tracer import render
    from raytracingincuda_tpu.ops.vec import Vec3
    from raytracingincuda_tpu.utils.ppm import write_ppm

    W, H = args.width, args.height
    if args.impl == "stream" and args.n_spheres:
        from raytracingincuda_tpu.models.scene import build_random_scene

        true_scene = build_random_scene(args.n_spheres, seed=3)
    else:
        true_scene = build_scene(2, pad_to_multiple=64)
    cam = CameraConfig.reference_default()

    print("rendering target...", file=sys.stderr)
    if args.impl == "stream":
        from raytracingincuda_tpu.ops.pallas_stream import (
            prepare_stream_scene, render_pallas_stream,
        )

        stream = prepare_stream_scene(true_scene)
        interp = jax.default_backend() == "cpu"
        target = render_pallas_stream(
            stream, cam, W, H, args.samples, args.bounces, gamma=False,
            interpret=interp,
        )
    else:
        target = render(true_scene, cam, W, H, args.samples,
                        args.bounces, gamma=False)

    # start from flat gray albedos
    gray = jnp.full_like(true_scene.params.albedo.x, 0.5)
    init_params = true_scene.params._replace(
        albedo=Vec3(gray, gray, gray)
    )

    trainable = SceneParams(
        center=Vec3(False, False, False), radius=False,
        albedo=Vec3(True, True, True), fuzz=False, ior=False,
    )
    if args.impl == "stream":
        init_fn, step_fn = gradlib.make_stream_train(
            stream, W, H, args.samples, args.bounces,
            learning_rate=args.lr, trainable=trainable, loss=args.loss,
        )
    else:
        # frozen difficulty order (TPU kernels only): depth-grouped pixel
        # tiles hit the backward's all-dead early exit together; the
        # prepass runs once and the order stays valid as params move
        # (ordering affects only speed, never values)
        order = None
        if args.impl in ("pallas", "fused") and \
                jax.default_backend() != "cpu":
            from raytracingincuda_tpu.ops.pallas_kernel import (
                difficulty_order, measure_difficulty,
            )

            seg = jax.jit(lambda s, c: measure_difficulty(
                s, c, W, H, probe_depth=min(8, args.bounces),
                probe_samples=min(6, args.samples)))(true_scene, cam)
            order = difficulty_order(
                seg, min(8, args.bounces), min(6, args.samples)
            )
        extra = {"loss": args.loss} if args.impl == "fused" else {}
        if args.loss != "mse" and args.impl not in ("fused", "stream"):
            raise SystemExit(
                f"--loss {args.loss} needs impl=fused or stream "
                "(the in-kernel loss family)")
        init_fn, step_fn = gradlib.make_train_step(
            W, H, args.samples, args.bounces,
            learning_rate=args.lr, trainable=trainable, impl=args.impl,
            pixel_order=order, **extra,
        )
    if args.impl in ("oracle", "fused"):
        step_fn = jax.jit(step_fn)
    # impl=pallas/stream: fwd and bwd are separately jitted programs; a
    # top-level jit would put two Mosaic kernels in one program (rejected
    # by the TPU compile service). impl=fused is a single kernel, so the
    # whole step (optimizer included) jits.
    state = init_fn(init_params)

    for i in range(args.steps):
        state, loss = step_fn(
            state, cam, true_scene.mat_type, true_scene.active, target
        )
        if i % 10 == 0 or i == args.steps - 1:
            err = float(jnp.mean(jnp.abs(
                state.params.albedo.x - true_scene.params.albedo.x
            ) * true_scene.active))
            print(f"step {i:4d}  loss {float(loss):.6f}  "
                  f"albedo L1 {err:.4f}", file=sys.stderr)

    from raytracingincuda_tpu.models.scene import Scene

    img = render(
        Scene(state.params, true_scene.mat_type, true_scene.active),
        cam, W, H, args.samples, args.bounces,
    )
    write_ppm(args.out, np.asarray(img, np.float64))
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
