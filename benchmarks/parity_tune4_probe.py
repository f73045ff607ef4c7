"""TPU probe 4: validate nummin + packed layout on real Mosaic; pick
production (ray_tile, K) defaults across the reference grid; collect
per-layout headline rows (vmem / hbm / packed — VERDICT item 4)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    import raytracingincuda_tpu.ops.pallas_kernel as pk
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.utils.ppm import quantize
    from raytracingincuda_tpu.utils.timing import force

    out = open("benchmarks/results/parity_tune4.jsonl", "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))

    # 1. packed-vs-vmem correctness on real Mosaic (small image; quantized
    # tolerance — two different programs share the ~2e-7 camera-row
    # cross-program channel, never assert bit-equality here)
    try:
        W, H = 64, 32
        v = jax.jit(lambda s, c: pk.render_pallas(
            s, c, W, H, 2, 4, layout="vmem", ray_tile=512))(scene, cam)
        p = jax.jit(lambda s, c: pk.render_pallas(
            s, c, W, H, 2, 4, layout="packed", ray_tile=512))(scene, cam)
        force(v), force(p)
        dv = np.abs(quantize(np.asarray(v)).astype(int)
                    - quantize(np.asarray(p)).astype(int))
        emit(case="packed_vs_vmem_tpu", max_levels=int(dv.max()),
             mean_levels=float(dv.mean()))
    except Exception as e:  # noqa: BLE001
        emit(case="packed_vs_vmem_tpu", error=repr(e)[:500])

    def make_order(w, h, kpl, rt):
        prepass = jax.jit(lambda s, c: pk.measure_difficulty(
            s, c, w, h, probe_depth=8, probe_samples=6))
        order_fn = jax.jit(lambda seg: pk.difficulty_order(seg, 8, 6))
        order = order_fn(prepass(scene, cam))
        force(order)
        padded = pk._round_up(w * h, kpl * rt)
        if order.shape[0] < padded:
            order = jnp.concatenate([
                order, jnp.arange(order.shape[0], padded, dtype=jnp.uint32),
            ])
        return order

    def run_case(tag, w, h, spp, depth, kpl, rt, layout="vmem",
                 rr=None, sort=True, runs=3):
        try:
            if sort:
                order = make_order(w, h, kpl, rt)
                f = jax.jit(lambda s, c, o: pk.render_pallas(
                    s, c, w, h, spp, depth, pixel_order=o, layout=layout,
                    pixels_per_lane=kpl, ray_tile=rt, rr_start=rr))
                fargs = (scene, cam, order)
            else:
                f = jax.jit(lambda s, c: pk.render_pallas(
                    s, c, w, h, spp, depth, layout=layout,
                    pixels_per_lane=kpl, ray_tile=rt, rr_start=rr))
                fargs = (scene, cam)
            t0 = time.perf_counter()
            force(f(*fargs))
            comp = time.perf_counter() - t0
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                force(f(*fargs))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=min(times),
                 all_ms=[round(t, 1) for t in times], compile_s=round(comp, 1))
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:500])

    # 2. headline re-measure with nummin committed (parity + rr2)
    run_case("headline_k16_rt1024_nummin", 1280, 768, 100, 25, 16, 1024)
    run_case("headline_rr2_k16_rt1024", 1280, 768, 100, 25, 16, 1024, rr=2)
    run_case("headline_rr2_k8_rt1024", 1280, 768, 100, 25, 8, 1024, rr=2)

    # 3. grid defaults: mid resolutions
    run_case("mid640_k8_rt512", 640, 384, 100, 25, 8, 512)
    run_case("mid640_k8_rt1024", 640, 384, 100, 25, 8, 1024)
    run_case("mid640_k16_rt1024", 640, 384, 100, 25, 16, 1024)
    run_case("mid960_k8_rt512", 960, 576, 100, 25, 8, 512)
    run_case("mid960_k16_rt1024", 960, 576, 100, 25, 16, 1024)
    # low-spp rows (the reference's 10-spp grid)
    run_case("small_k8_rt512_sorted", 320, 192, 10, 25, 8, 512, runs=5)
    run_case("mid640_10spp_k8_rt512", 640, 384, 10, 25, 8, 512)
    run_case("mid640_10spp_k8_rt1024", 640, 384, 10, 25, 8, 1024)

    # 4. per-layout headline rows (vmem row = case 2 above)
    run_case("headline_hbm_k16_rt1024", 1280, 768, 100, 25, 16, 1024,
             layout="hbm")
    run_case("headline_packed_k1_rt1024", 1280, 768, 100, 25, 1, 1024,
             layout="packed", runs=2)
    run_case("small_packed_k1_rt512", 320, 192, 10, 25, 1, 512,
             layout="packed", runs=3)

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
