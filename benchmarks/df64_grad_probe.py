"""Does the gradient pass need a df64 kernel? (VERDICT r3 missing #3 /
next-steps #5 — measured rationale, CPU.)

The df64 forward exists because the reference ships double RENDER
variants and image precision is the product axis. Gradients are a
different consumer: they feed stochastic optimizers, and the Monte
Carlo estimator itself injects seed-to-seed variance. This probe
quantifies, on identical Threefry streams:

  f32_rounding   || g_f32(seed A) - g_f64(seed A) || / || g_f64 ||
                 (the entire f32-arithmetic error of the gradient,
                 knife-edge hit flips included)
  pallas_rounding|| g_pallas(seed A) - g_f64(seed A) || / || g_f64 ||
                 (the production winner-replay backward kernel)
  mc_noise       || g_f64(seed B) - g_f64(seed A) || / || g_f64 ||
                 (the estimator's own sampling noise at the same spp)

If mc_noise >> f32_rounding, a df64 backward kernel would pay the
measured ~7.7x EFT wave cost (roofline.txt §3) to remove a error term
that is not remotely dominant — the right df64 GRADIENT path is the
native-f64 oracle (jax.grad, FD-verified in
test_df64.py::test_f64_oracle_gradients_match_fd), used when someone
actually needs deterministic double-precision cotangents (CPU).

Writes benchmarks/results/df64_grad.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = "benchmarks/results/df64_grad.jsonl"
W, H, SPP, DEPTH = (64, 40, int(os.environ.get("DFG_SPP", 8)), 8)


def log(**rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def tree_cat(t):
    return np.concatenate([np.asarray(l, np.float64).ravel()
                           for l in jax.tree_util.tree_leaves(t)])


def main() -> int:
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops import tracer
    from raytracingincuda_tpu.ops.pallas_kernel import make_diff_render

    scene = build_scene(2, pad_to_multiple=64)
    cam = CameraConfig.reference_default()
    rng = np.random.default_rng(0)
    wimg = rng.standard_normal((H, W, 3))

    def cast(tree, dt):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            tree,
        )

    def oracle_grads(dtype, seed):
        w = jnp.asarray(wimg, dtype)
        sc = cast(scene, dtype)
        cm = cast(cam, dtype)

        def loss(p, c):
            img = tracer.render(
                sc._replace(params=p), c, W, H, SPP, DEPTH, seed=seed,
                dtype=dtype, gamma=False,
            )
            return jnp.sum(w * img)

        return jax.grad(loss, argnums=(0, 1))(sc.params, cm)

    log(event="start", cfg=f"{W}x{H}x{SPP}spp/d{DEPTH}")

    jax.config.update("jax_enable_x64", True)
    try:
        g64_a = oracle_grads(jnp.float64, 1227)
        g64_b = oracle_grads(jnp.float64, 7331)
    finally:
        jax.config.update("jax_enable_x64", False)
    g32_a = oracle_grads(jnp.float32, 1227)

    # production backward kernel (winner replay), same streams
    f = make_diff_render(scene.mat_type, scene.active, W, H, SPP, DEPTH,
                         seed=1227, interpret=True, backward="pallas")
    w32 = jnp.asarray(wimg, jnp.float32)

    def ploss(p, c):
        return jnp.sum(w32 * f(p, c))

    gp_a = jax.grad(ploss, argnums=(0, 1))(scene.params, cam)

    ref = tree_cat(g64_a)
    nrm = np.linalg.norm(ref)
    rows = {
        "f32_rounding": np.linalg.norm(tree_cat(g32_a) - ref) / nrm,
        "pallas_rounding": np.linalg.norm(tree_cat(gp_a) - ref) / nrm,
        "mc_noise_seed": np.linalg.norm(tree_cat(g64_b) - ref) / nrm,
    }
    for k, v in rows.items():
        log(case=k, rel_l2=float(v))
    log(case="noise_over_f32",
        ratio=float(rows["mc_noise_seed"] / max(rows["f32_rounding"],
                                                1e-300)),
        note="MC seed noise vs whole-f32-arithmetic gradient error; "
             ">>1 means a df64 BACKWARD kernel removes a non-dominant "
             "term at ~7.7x wave cost")
    log(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
