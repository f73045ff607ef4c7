"""TPU probe: Pallas backward kernel vs oracle recompute-VJP.

Appends JSON lines to --out as each measurement lands (compile-service
etiquette: one process, never die mid-compile — see CLAUDE.md).

Cases:
  bwd_pallas_*  — render_pallas_grads jitted alone (one Mosaic kernel)
  bwd_oracle_*  — jax.vjp through the jnp oracle at the same config
  fused_*       — jax.value_and_grad over make_diff_render (Pallas fwd +
                  Pallas bwd in ONE jit program: probes the compile
                  service's historical two-Mosaic-kernel limit)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bwd_probe.jsonl")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops import tracer
    from raytracingincuda_tpu.ops.pallas_backward import render_pallas_grads
    from raytracingincuda_tpu.ops.pallas_kernel import make_diff_render
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))

    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))

    configs = [("640x384x16x8", 640, 384, 16, 8)]
    if not args.quick:
        configs.append(("640x384x16x25", 640, 384, 16, 25))

    for tag, w, h, spp, depth in configs:
        g = jnp.ones((h, w, 3), jnp.float32)

        # --- pallas backward alone -----------------------------------
        try:
            f_bwd = jax.jit(
                lambda p, c, gg: render_pallas_grads(
                    Scene(p, scene.mat_type, scene.active), c, gg,
                    w, h, spp, depth,
                )
            )
            t0 = time.perf_counter()
            force(f_bwd(scene.params, cam, g))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f_bwd(scene.params, cam, g))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=f"bwd_pallas_{tag}", ms=min(times),
                 compile_s=compile_s)
        except Exception as e:  # noqa: BLE001
            emit(case=f"bwd_pallas_{tag}", error=repr(e)[:500])

        # --- oracle recompute-VJP ------------------------------------
        try:
            def oracle_bwd(p, c, gg):
                def fwd(pp, cc):
                    return tracer.render(
                        Scene(pp, scene.mat_type, scene.active), cc,
                        w, h, spp, depth, gamma=False, remat=True,
                    )
                _, vjp = jax.vjp(fwd, p, c)
                return vjp(gg)

            f_o = jax.jit(oracle_bwd)
            t0 = time.perf_counter()
            force(f_o(scene.params, cam, g))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f_o(scene.params, cam, g))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=f"bwd_oracle_{tag}", ms=min(times),
                 compile_s=compile_s)
        except Exception as e:  # noqa: BLE001
            emit(case=f"bwd_oracle_{tag}", error=repr(e)[:500])

        # --- fused fwd+bwd in one jit (two Mosaic kernels) -----------
        try:
            fdiff = make_diff_render(
                scene.mat_type, scene.active, w, h, spp, depth,
                gamma=False, backward="pallas",
            )

            def loss(p, c):
                img = fdiff(p, c)
                return jnp.mean(img * img)

            f_fused = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
            t0 = time.perf_counter()
            force(f_fused(scene.params, cam))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f_fused(scene.params, cam))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=f"fused_{tag}", ms=min(times), compile_s=compile_s)
        except Exception as e:  # noqa: BLE001
            emit(case=f"fused_{tag}", error=repr(e)[:500])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
