"""North-star config, actually run: scene 1, 1200x675, 500 spp,
forward + FULL scene/camera gradients on one chip, at depth 25 AND the
exact BASELINE.json configs[3] depth 50.

One ~109 s fused dispatch crashes the TPU worker (UPSTREAM_ISSUES #10),
so this runs the production composition instead: one forward render
(500 spp, ~13 s dispatch), the MSE cotangent chained on host, then the
backward as sample_offset-CHUNKED grad sweeps (cotangents are sums over
samples — test_sample_chunked_grads). Reports end-to-end fwd+bwd
Mrays/s including every dispatch.

Usage: northstar_chunked.py [out.jsonl] [depth] [chunk] [bwd_ray_tile]
                            [rr_start]

``chunk == 0`` (round 4): run the FULL-PARK fused step instead — ONE
dispatch computing render + loss + all gradients with the backward
reverse-only from the HBM-parked waves (mse_train_pallas
park_residuals auto -> 'hbm'; ~15 s on-device at d50/500spp, safely
under the ~100 s worker ceiling). Same 500-spp estimator: the fused
kernel's cotangent comes from its own (bit-identical) 500-spp render.
Measured 28.3 Mrays/s vs the chunked two-program path's 16.8
(hbm_park.jsonl).
Depth 50 notes: the backward residual scratch is (depth*32, ray_tile)
f32 — 6.6 MB at rt1024/d50, pressing the 16 MB VMEM cap together with
the forward sweep's (N, R) hit scan, so d50 drops to rt512 (3.3 MB)
by default; chunks shrink to keep each dispatch well under the ~100 s
worker ceiling.

``rr_start`` (round 3): render AND differentiate the Russian-roulette
estimator from that bounce — the backward replays the identical RR
streams (test_rr_grads_match_oracle), so this measures the production
rr2 estimator's fwd+bwd rate (unbiased; paths shorten at both passes).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import Scene, build_scene
from raytracingincuda_tpu.ops.pallas_backward import render_pallas_grads
from raytracingincuda_tpu.ops.pallas_backward import _order_ids
from raytracingincuda_tpu.ops.pallas_kernel import (
    _round_up, difficulty_order, measure_difficulty, render_pallas,
)
from raytracingincuda_tpu.utils.timing import force

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/northstar_chunked.jsonl"
W, H, SPP = 1200, 675, 500
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 25
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else (50 if DEPTH <= 25
                                                    else 25)
BWD_RT = int(sys.argv[4]) if len(sys.argv) > 4 else (1024 if DEPTH <= 25
                                                     else 512)
RR = int(sys.argv[5]) if len(sys.argv) > 5 else None


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    log({"event": "start", "devices": str(jax.devices()),
         "cfg": (f"scene1_{W}x{H}x{SPP}spp_d{DEPTH}_chunk{CHUNK}"
                 + (f"_rr{RR}" if RR is not None else ""))})
    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (H, W, 3), jnp.float32)

    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))
    order.block_until_ready()
    # prepass pads at K=1; the K16 forward pads to 16*1024 multiples
    # (K16/rt1024 measured 1.779 s vs K8's 1.789 at 100 spp/d50 —
    # bwd_d50.jsonl fwd_prod rows, round 4). The backward extends the
    # RAW order to its own (16*512) padding internally — the two
    # paddings differ, so each consumer gets its own extension.
    fwd_order = _order_ids(order, _round_up(W * H, 16 * 1024))

    if CHUNK == 0:
        # fused full-park single dispatch (render + loss + grads)
        from raytracingincuda_tpu.ops.pallas_backward import (
            mse_train_pallas,
        )
        from raytracingincuda_tpu.utils.timing import measure_calibration

        log({"event": "calib", **measure_calibration()})
        step = jax.jit(lambda p, c, t: mse_train_pallas(
            Scene(p, scene.mat_type, scene.active), c, t, W, H, SPP,
            DEPTH, pixel_order=order, rr_start=RR))
        out = step(scene.params, cam, target)
        force((out[0],) + out[2:])         # compile + complete
        log({"event": "compiled"})
        t0 = time.perf_counter()
        out = step(scene.params, cam, target)
        force((out[0],) + out[2:])
        total = time.perf_counter() - t0
        mrays = W * H * SPP / total / 1e6
        log({"case": f"fwdbwd_{SPP}spp_d{DEPTH}_fusedhbm"
                     + (f"_rr{RR}" if RR is not None else ""),
             "s": round(total, 2), "mrays_s": round(mrays, 2),
             "grad_finite": bool(jnp.isfinite(out[2]).all()
                                 & jnp.isfinite(out[3]).all())})
        log({"event": "done"})
        return

    fwd = jax.jit(lambda s, c: render_pallas(
        s, c, W, H, SPP, DEPTH, gamma=False, pixels_per_lane=16,
        ray_tile=1024, pixel_order=fwd_order, rr_start=RR))

    @jax.jit
    def cotangent(img, tgt):
        # dL/d_acc for L = mean((img - tgt)^2), img = acc / spp
        return (img - tgt) * (2.0 / (W * H * 3)) / SPP

    def bwd_chunk(off):
        return jax.jit(lambda p, c, gg, off=off: render_pallas_grads(
            Scene(p, scene.mat_type, scene.active), c, gg, W, H,
            CHUNK, DEPTH, sample_offset=off, pixel_order=order,
            ray_tile=BWD_RT, rr_start=RR))

    chunks = [bwd_chunk(off) for off in range(0, SPP, CHUNK)]

    # compile everything outside the timed run
    force(fwd(scene, cam))
    g0 = cotangent(fwd(scene, cam), target)
    for f in chunks:
        force(f(scene.params, cam, g0))
    log({"event": "compiled"})

    t0 = time.perf_counter()
    img = fwd(scene, cam)
    force(img)
    t_fwd = time.perf_counter() - t0
    g = cotangent(img, target)
    d_sm = None
    d_cr = None
    for f in chunks:
        a, b = f(scene.params, cam, g)
        d_sm = a if d_sm is None else d_sm + a
        d_cr = b if d_cr is None else d_cr + b
    force(d_sm)
    force(d_cr)
    total = time.perf_counter() - t0
    mrays = W * H * SPP / total / 1e6
    log({"case": f"fwdbwd_{SPP}spp_d{DEPTH}"
                  + ("_chunked" if DEPTH <= 25 else f"_chunk{CHUNK}")
                  + (f"_rr{RR}" if RR is not None else ""),
         "s": round(total, 2),
         "fwd_s": round(t_fwd, 2), "n_chunks": len(chunks),
         "mrays_s": round(mrays, 2),
         "grad_finite": bool(jnp.isfinite(d_sm).all()
                             & jnp.isfinite(d_cr).all())})
    log({"event": "done"})


if __name__ == "__main__":
    main()
