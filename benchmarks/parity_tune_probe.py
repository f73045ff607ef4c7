"""TPU probe: parity-estimator tuning (VERDICT round-2 item 2).

Two targets, both with the reference's exact estimator (no RR):
  * small config 320x192x10spp/25b — reference t8 render = 24.50 ms;
    round-1 repo number 58.5-61 ms. Hypothesis: the gap is tile-tail
    (difficulty sorting is gated off below 32 spp), so measure sorted
    orders (including cheap probes whose cost could be paid inline).
  * headline 1280x768x100spp/25b — reference t8 = 2879.33 ms; round-1
    parity best 2959 ms (K=16 sorted). Grid over K x ray_tile.

JSONL rows land as they finish (tunnel-wedge discipline).
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
    ap.add_argument("--out", default="benchmarks/results/parity_tune.jsonl")
    ap.add_argument("--skip-headline", action="store_true")
    ap.add_argument("--skip-small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_kernel import (
        _round_up, difficulty_order, measure_difficulty, render_pallas,
    )
    from raytracingincuda_tpu.utils.timing import force

    out = open(args.out, "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))

    def make_order(w, h, pd, ps, kpl, ray_tile):
        """Difficulty order extended to the main render's padding;
        returns (order, prepass_ms measured hot)."""
        prepass = jax.jit(lambda s, c: measure_difficulty(
            s, c, w, h, probe_depth=pd, probe_samples=ps))
        order_fn = jax.jit(lambda seg: difficulty_order(seg, pd, ps))
        order = order_fn(prepass(scene, cam))
        force(order)
        t0 = time.perf_counter()
        force(order_fn(prepass(scene, cam)))
        pre_ms = (time.perf_counter() - t0) * 1e3
        padded = _round_up(w * h, kpl * ray_tile)
        if order.shape[0] < padded:
            order = jnp.concatenate([
                order,
                jnp.arange(order.shape[0], padded, dtype=jnp.uint32),
            ])
        return order, pre_ms

    def run_case(tag, w, h, spp, depth, kpl, ray_tile, order, runs=3):
        try:
            f = jax.jit(lambda s, c, o: render_pallas(
                s, c, w, h, spp, depth, pixel_order=o,
                pixels_per_lane=kpl, ray_tile=ray_tile))
            t0 = time.perf_counter()
            force(f(scene, cam, order))
            comp = time.perf_counter() - t0
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                force(f(scene, cam, order))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=min(times), all_ms=[round(t, 1) for t in times],
                 compile_s=round(comp, 1))
            return min(times)
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:400])
            return None

    def run_unsorted(tag, w, h, spp, depth, kpl, ray_tile, runs=3):
        try:
            f = jax.jit(lambda s, c: render_pallas(
                s, c, w, h, spp, depth,
                pixels_per_lane=kpl, ray_tile=ray_tile))
            t0 = time.perf_counter()
            force(f(scene, cam))
            comp = time.perf_counter() - t0
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                force(f(scene, cam))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=min(times), all_ms=[round(t, 1) for t in times],
                 compile_s=round(comp, 1))
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:400])

    if not args.skip_small:
        W, H, SPP, D = 320, 192, 10, 25
        # baseline: production config today (K=8, unsorted below 32 spp)
        run_unsorted("small_k8_unsorted", W, H, SPP, D, 8, 512, runs=5)
        # full-quality order (6 samples x d8 probe)
        for kpl in (4, 8, 16):
            order, pre = make_order(W, H, 8, 6, kpl, 512)
            emit(case=f"small_prepass_d8s6_k{kpl}", prepass_ms=pre)
            run_case(f"small_k{kpl}_sorted_d8s6", W, H, SPP, D, kpl, 512,
                     order, runs=5)
        # cheap order (2 samples x d6): can its cost be paid inline?
        order, pre = make_order(W, H, 6, 2, 8, 512)
        emit(case="small_prepass_d6s2_k8", prepass_ms=pre)
        run_case("small_k8_sorted_d6s2", W, H, SPP, D, 8, 512, order, runs=5)

    if not args.skip_headline:
        W, H, SPP, D = 1280, 768, 100, 25
        for kpl, rt in [(8, 512), (16, 512), (32, 512),
                        (8, 1024), (16, 1024)]:
            order, pre = make_order(W, H, 8, 6, kpl, rt)
            run_case(f"headline_k{kpl}_rt{rt}", W, H, SPP, D, kpl, rt, order)

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
