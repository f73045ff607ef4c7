"""TPU probe 2: parity tuning follow-up.

(a) headline: does rt2048 / K32-rt1024 stack on the rt1024 win?
(b) small config at rt1024.
(c) wave accounting for the small config: exact per-pixel segment totals
    at the full config (return_depth), per-tile wave counts, and a
    fixed-cost isolation run (depth=1: every sample is exactly one
    segment, so waves/tile = K*spp with ZERO tail).
JSONL + an npz of the segment map for host-side packing simulation.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/parity_tune2.jsonl")
    ap.add_argument("--segnpz", default="benchmarks/results/small_segmap.npz")
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
        prepass = jax.jit(lambda s, c: measure_difficulty(
            s, c, w, h, probe_depth=pd, probe_samples=ps))
        order_fn = jax.jit(lambda seg: difficulty_order(seg, pd, ps))
        order = order_fn(prepass(scene, cam))
        force(order)
        padded = _round_up(w * h, kpl * ray_tile)
        if order.shape[0] < padded:
            order = jnp.concatenate([
                order,
                jnp.arange(order.shape[0], padded, dtype=jnp.uint32),
            ])
        return order

    def run_case(tag, w, h, spp, depth, kpl, ray_tile, order=None, runs=3):
        try:
            if order is not None:
                f = jax.jit(lambda s, c, o: render_pallas(
                    s, c, w, h, spp, depth, pixel_order=o,
                    pixels_per_lane=kpl, ray_tile=ray_tile))
                fargs = (scene, cam, order)
            else:
                f = jax.jit(lambda s, c: render_pallas(
                    s, c, w, h, spp, depth,
                    pixels_per_lane=kpl, ray_tile=ray_tile))
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
            return min(times)
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:400])
            return None

    # (a) headline
    W, H, SPP, D = 1280, 768, 100, 25
    for kpl, rt in [(16, 2048), (8, 2048), (32, 1024)]:
        order = make_order(W, H, 8, 6, kpl, rt)
        run_case(f"headline_k{kpl}_rt{rt}", W, H, SPP, D, kpl, rt, order)

    # (b) small config at rt1024
    W, H, SPP, D = 320, 192, 10, 25
    run_case("small_k8_rt1024_unsorted", W, H, SPP, D, 8, 1024, runs=5)
    for kpl in (8, 16):
        order = make_order(W, H, 8, 6, kpl, 1024)
        run_case(f"small_k{kpl}_rt1024_sorted", W, H, SPP, D, kpl, 1024,
                 order, runs=5)

    # (c1) fixed-cost isolation: depth=1 renders have ZERO tile tail
    # (every sample dies at the cap after exactly one segment), so
    # time = tiles * (K * spp) * t_wave + tiles * t_tile + t_dispatch.
    for spp, kpl, rt in [(64, 8, 512), (16, 8, 512), (64, 8, 1024),
                         (16, 8, 1024)]:
        run_case(f"d1_spp{spp}_k{kpl}_rt{rt}", W, H, spp, 1, kpl, rt,
                 runs=5)

    # (c2) exact per-pixel segment totals at the full small config, plus
    # per-tile wave counts (green channel), sorted and unsorted
    try:
        f = jax.jit(lambda s, c: render_pallas(
            s, c, W, H, SPP, D, return_depth=True))
        waves_g, seg = f(scene, cam)
        force(seg)
        seg_np = np.asarray(seg)
        waves_np = np.asarray(waves_g)
        np.savez(args.segnpz, seg=seg_np, waves=waves_np)
        n_tiles = seg_np.shape[0] // 512
        tile_waves = waves_np.reshape(n_tiles, 512)[:, 0]
        emit(case="small_seg_k1_unsorted",
             total_segments=float(seg_np.sum()),
             mean_seg_per_pixel=float(seg_np.sum() / (W * H * SPP)),
             total_waves=float(tile_waves.sum()),
             tile_waves=[float(x) for x in tile_waves])
    except Exception as e:  # noqa: BLE001
        emit(case="small_seg_k1_unsorted", error=repr(e)[:400])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
