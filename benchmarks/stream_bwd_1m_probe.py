"""TPU probe: stream-backward sphere ceiling with the HBM accumulator.

Round 4 ended at 200k spheres (the (16, N) scoped-VMEM accumulator;
300k wanted 18.9M > the 16M limit — hbm_park.jsonl stream_bwd_ceiling
rows). Round 5 moves the accumulator to an HBM output window-RMW'd
through a VMEM staging tile (pallas_stream_backward acc='hbm', the auto
above ~144k slots), so the differentiable ceiling should now match the
forward's (1M spheres, stream_1m.jsonl). This probe (VERDICT r4 next
#3):

  * consistency at the overlapping scale: 100k fused step acc='vmem'
    vs acc='hbm' — reports loss and gradient-norm deltas (bitwise
    identity is pinned in interpret by test_hbm_accumulator_*; two
    separately compiled programs on hardware retain the documented
    ~ulp cross-program channel, so hardware asserts allclose).
  * ceiling walk: fused full-park train step at 300k / 500k / 1M
    spheres — compile + run + finite-gradient check on device.

Appends to --out as rows land (one TPU process, never die mid-compile).
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
    ap.add_argument("--out",
                    default="benchmarks/results/stream_bwd_1m.jsonl")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_random_scene
    from raytracingincuda_tpu.ops.pallas_stream import (
        StreamScene, prepare_stream_scene, render_pallas_stream,
    )
    from raytracingincuda_tpu.ops.pallas_stream_backward import (
        mse_train_stream,
    )
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log(event="start", probe="stream_bwd_1m",
        devices=str(jax.devices()), calib=measure_calibration())
    cam = CameraConfig.reference_default()
    W, H = 640, 384

    def build(n, spp, depth):
        scene = build_random_scene(n, seed=7)
        stream = prepare_stream_scene(scene)
        target = render_pallas_stream(stream, cam, W, H, 1, depth,
                                      gamma=False) * 0.9
        target.block_until_ready()
        return stream, target

    def make_step(stream, spp, depth, acc):
        blk = stream.block

        # scene arrays as jit ARGS (closures bake scoped-VMEM
        # constants at this scale — verify skill)
        def step(t, mat, bounds):
            st = StreamScene(scene_mat=mat, bounds=bounds, block=blk)
            loss, d_stream, d_cam = mse_train_stream(
                st, cam, t, W, H, spp, depth, acc=acc)
            # device-side health + comparison scalars (full d_stream
            # fetch is tunnel-slow at 1M rows)
            return (loss, jnp.isfinite(d_stream).all(),
                    jnp.linalg.norm(d_stream), jnp.linalg.norm(d_cam))

        return jax.jit(step)

    def run_case(tag, stream, target, spp, depth, acc, runs=2):
        try:
            f = make_step(stream, spp, depth, acc)
            t0 = time.perf_counter()
            out = f(target, stream.scene_mat, stream.bounds)
            vals = [float(x) for x in out]
            cs = time.perf_counter() - t0
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                force(f(target, stream.scene_mat, stream.bounds))
                ts.append(time.perf_counter() - t0)
            log(case=tag, s=round(min(ts), 3), compile_s=round(cs, 1),
                loss=vals[0], grads_finite=bool(vals[1]),
                dscene_norm=vals[2], dcam_norm=vals[3])
            return vals
        except Exception as e:  # noqa: BLE001
            log(case=tag, error=repr(e)[:500])
            return None

    # ---- 100k consistency: vmem vs hbm accumulator ------------------
    spp, depth = 4, 10
    stream, target = build(100_000, spp, depth)
    v = run_case("stream100k_4spp_d10_accvmem", stream, target, spp,
                 depth, "vmem")
    h = run_case("stream100k_4spp_d10_acchbm", stream, target, spp,
                 depth, "hbm")
    if v and h:
        log(case="acc_consistency_100k",
            loss_rel=abs(v[0] - h[0]) / max(abs(v[0]), 1e-30),
            dscene_norm_rel=abs(v[2] - h[2]) / max(v[2], 1e-30),
            dcam_norm_rel=abs(v[3] - h[3]) / max(v[3], 1e-30))

    if args.quick:
        log(event="done")
        return 0

    # ---- ceiling walk (auto acc='hbm' at these N) -------------------
    for n, spp, depth in ((300_000, 2, 10), (500_000, 1, 8),
                          (1_000_000, 1, 6)):
        stream, target = build(n, spp, depth)
        run_case(f"stream{n // 1000}k_{spp}spp_d{depth}_fused",
                 stream, target, spp, depth, None, runs=1)

    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
