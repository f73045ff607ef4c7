"""d50 backward decomposition + knob ladder at the north-star shape
(VERDICT r3 next-steps #2).

Round 3 closed configs[3] (1200x675x500spp/d50 fwd+bwd) at 16.49
Mrays/s rr2 with the backward costing ~1.7x the forward, against the
roofline's ~1.4 forward-equivalent estimate. This probe decomposes the
gap at d50 and ladders the wave-sweep knobs, at spp=100 for speed
(rates are spp-flat; the winner re-runs at 500 spp via
northstar_chunked.py):

  retrace_floor   the backward's forward-sweep twin: a production
                  render at the BACKWARD's tile/K (rt512/K16) and the
                  same frozen order — what sweep 1 would cost with no
                  parking, no scatter, no reverse
  bwd_auto        render_pallas_grads at round-3 autos
                  (rt512, K16, window 10MB-auto)
  bwd_w{N}        window ladder (drain count: every window waves the
                  sweep stalls to walk the parked rows backward)
  bwd_k{K}        pixels-per-lane ladder (drain-tail statistics)
  bwd_rt{R}       tile ladder (scan working set vs scratch depth)

Usage: python benchmarks/bwd_d50_probe.py [--spp 100] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, DEPTH, RR = 1200, 675, 50, 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--out", default="benchmarks/results/bwd_d50.jsonl")
    ap.add_argument("--cases", nargs="*", default=None,
                    help="subset of case names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import Scene, build_scene
    from raytracingincuda_tpu.ops.pallas_backward import (
        render_pallas_grads,
    )
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty, render_pallas,
    )
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    spp = args.spp
    log(event="start", calib=measure_calibration(),
        cfg=f"{W}x{H}x{spp}spp/d{DEPTH}_rr{RR}")

    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (H, W, 3), jnp.float32)

    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))
    order.block_until_ready()

    g = (target * (2.0 / (W * H * 3)) / spp).astype(jnp.float32)
    rays = W * H * spp

    def timed(fn, *a, runs=2):
        t0 = time.perf_counter()
        force(fn(*a))
        cs = time.perf_counter() - t0
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts), cs

    cases = []

    # forward-sweep twin (retrace floor) at the backward's tile shape
    from raytracingincuda_tpu.ops.pallas_backward import _order_ids
    from raytracingincuda_tpu.ops.pallas_kernel import _round_up

    def fwd_twin(rt, k):
        o = _order_ids(order, _round_up(W * H, k * rt))
        return jax.jit(lambda s, c: render_pallas(
            s, c, W, H, spp, DEPTH, gamma=False, ray_tile=rt,
            pixels_per_lane=k, pixel_order=o, rr_start=RR))

    cases.append(("retrace_floor_rt512_k16",
                  lambda: timed(fwd_twin(512, 16), scene, cam)))
    # production-forward ladder: northstar_chunked historically ran the
    # forward at K8/rt1024 — is K16 (the headline knee) better here?
    cases.append(("fwd_prod_rt1024_k8",
                  lambda: timed(fwd_twin(1024, 8), scene, cam)))
    cases.append(("fwd_prod_rt1024_k16",
                  lambda: timed(fwd_twin(1024, 16), scene, cam)))

    def bwd(rt=512, k=None, window=0):
        f = jax.jit(lambda p, c, gg: render_pallas_grads(
            Scene(p, scene.mat_type, scene.active), c, gg, W, H,
            spp, DEPTH, pixel_order=order, ray_tile=rt, rr_start=RR,
            window=window, pixels_per_lane=k))
        return lambda: timed(f, scene.params, cam, g)

    cases += [
        ("bwd_auto_rt512_k16_w102", bwd()),
        ("bwd_w60", bwd(window=60)),
        ("bwd_w140", bwd(window=140)),
        ("bwd_k32", bwd(k=32)),
        ("bwd_k8", bwd(k=8)),
        ("bwd_rt256_wauto", bwd(rt=256)),
        ("bwd_rt768_wauto", bwd(rt=768)),
        ("bwd_rt1024_wauto", bwd(rt=1024)),
    ]

    for name, run in cases:
        if args.cases and name not in args.cases:
            continue
        try:
            dt, cs = run()
            log(case=name, s=round(dt, 3), compile_s=round(cs, 1),
                mrays_s=round(rays / dt / 1e6, 2))
        except Exception as e:  # noqa: BLE001
            log(case=name, error=repr(e)[:300])

    log(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
