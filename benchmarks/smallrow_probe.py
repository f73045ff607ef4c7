"""Small-row wall-clock probe: where do the fixed milliseconds go at
320x192x10spp/d25 (reference global_float row: 24.50 ms render,
250427_avg_gpu_global_float_timing.csv:3)?

Legs (all production parity estimator, scene 1):
  current   — production protocol: dispatch render program, then force()
              (a SECOND eagerly-dispatched checksum program + 4 B fetch)
  onedisp   — ONE program returning (img, checksum); wall = dispatch +
              float(checksum) readback only
  chkonly   — one program returning ONLY the checksum (upper bound on
              what dropping the img output buffer could buy)
  device    — pipelined x32 dispatch, forced once (the cudaEvent analog)

Writes benchmarks/results/smallrow.jsonl as rows land.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_scene
from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
from raytracingincuda_tpu.utils.timing import force

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "smallrow.jsonl")


def emit(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def bench(fn, *args, reps=10, complete=None):
    """best/median wall ms over reps; `complete(out)` must block until
    execution finished (defaults to force)."""
    complete = complete or force
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        complete(out)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[0], times[len(times) // 2]


def main() -> int:
    W, H, SPP, D = 320, 192, 10, 25
    scene = build_scene(1)
    cam = CameraConfig.reference_default()
    emit(event="start", backend=jax.default_backend(),
         config=f"{W}x{H}x{SPP}spp/d{D}")

    # pure transport floor: a trivial program timed with the same
    # dispatch+force protocol — the tunnel RTT every single-dispatch
    # wall number pays, and the piece that varies day to day
    noop = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(noop(x0)))
    best, med = bench(noop, x0, complete=lambda o: float(jnp.sum(o)))
    emit(leg="noop_rpc_floor", best_ms=round(best, 2),
         median_ms=round(med, 2))

    common = dict(img_width=W, img_height=H, samples_per_pixel=SPP,
                  max_depth=D)

    # production config (make_renderer auto: K=8, rt=512 at 10 spp)
    prod = jax.jit(functools.partial(render_pallas, pixels_per_lane=8,
                                     ray_tile=512, **common))
    force(prod(scene, cam))
    best, med = bench(prod, scene, cam)
    emit(leg="production_k8_rt512", best_ms=round(best, 2),
         median_ms=round(med, 2))
    N = 32
    t0 = time.perf_counter()
    outs = [prod(scene, cam) for _ in range(N)]
    force(outs[-1])
    emit(leg="production_device_x32",
         ms=round((time.perf_counter() - t0) * 1e3 / N, 2))

    # current protocol (kernel defaults K=1/rt512 — diagnostic)
    r = jax.jit(functools.partial(render_pallas, **common))
    force(r(scene, cam))  # compile
    best, med = bench(r, scene, cam)
    emit(leg="current", best_ms=round(best, 2), median_ms=round(med, 2))

    # one dispatch: img + checksum from one program
    def render_chk(s, c):
        img = render_pallas(s, c, **common)
        return img, jnp.sum(img)

    rc = jax.jit(render_chk)
    img, chk = rc(scene, cam)
    float(chk)
    best, med = bench(rc, scene, cam, complete=lambda o: float(o[1]))
    emit(leg="onedisp", best_ms=round(best, 2), median_ms=round(med, 2))

    # checksum only (no image output buffer)
    rk = jax.jit(lambda s, c: jnp.sum(render_pallas(s, c, **common)))
    float(rk(scene, cam))
    best, med = bench(rk, scene, cam, complete=lambda o: float(o))
    emit(leg="chkonly", best_ms=round(best, 2), median_ms=round(med, 2))

    # device bracket: pipelined x32
    N = 32
    t0 = time.perf_counter()
    outs = [r(scene, cam) for _ in range(N)]
    force(outs[-1])
    dev = (time.perf_counter() - t0) * 1e3 / N
    emit(leg="device_x32", ms=round(dev, 2))

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
