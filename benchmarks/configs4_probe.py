"""BASELINE.json configs[4] shape, single chip: 2400x1350x1000spp/d50
forward (the multi-host target's per-chip denominator — VERDICT r2 §7).

3.24 Grays at ~30-45 Mrays/s is a 75-110 s dispatch; a single Mosaic
dispatch beyond ~100 s crashes the TPU worker (UPSTREAM_ISSUES #10), so
the render is chunked by sample_offset with accumulate_only=True —
counter-RNG makes the chunked sum EXACTLY the single-pass render
(tests/test_checkpoint.py) — and scale+gamma chain on the host.

Usage: python benchmarks/configs4_probe.py [chunk_spp] [out.jsonl]
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_scene
from raytracingincuda_tpu.ops.pallas_kernel import (
    _round_up, difficulty_order, measure_difficulty, render_pallas,
)
from raytracingincuda_tpu.utils.timing import force

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 125
OUT = sys.argv[2] if len(sys.argv) > 2 else \
    "benchmarks/results/configs4.jsonl"
W, H, SPP, DEPTH = 2400, 1350, 1000, 50
KPL, RT = 16, 1024


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    log({"event": "start", "devices": str(jax.devices()),
         "cfg": f"scene1_{W}x{H}x{SPP}spp_d{DEPTH}_chunk{CHUNK}"})
    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()

    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))
    padded = _round_up(W * H, KPL * RT)
    if order.shape[0] < padded:
        order = jnp.concatenate([
            order, jnp.arange(order.shape[0], padded, dtype=jnp.uint32)])
    order = order[:padded]
    order.block_until_ready()

    def chunk_fn(off):
        return jax.jit(functools.partial(
            render_pallas, img_width=W, img_height=H,
            samples_per_pixel=CHUNK, max_depth=DEPTH,
            pixels_per_lane=KPL, ray_tile=RT, pixel_order=order,
            sample_offset=off, accumulate_only=True, gamma=False))

    offs = list(range(0, SPP, CHUNK))
    fns = [chunk_fn(o) for o in offs]
    # compile outside the timed region (one program per offset constant)
    for f in fns:
        force(f(scene, cam))
    log({"event": "compiled", "n_chunks": len(fns)})

    @jax.jit
    def finish(acc):
        x = acc * (1.0 / SPP)
        pos = x > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)

    t0 = time.perf_counter()
    acc = None
    for f in fns:
        a = f(scene, cam)
        acc = a if acc is None else acc + a
    img = finish(acc)
    force(img)
    total = time.perf_counter() - t0
    mrays = W * H * SPP / total / 1e6
    log({"case": f"configs4_fwd_{W}x{H}x{SPP}spp_d{DEPTH}",
         "s": round(total, 2), "mrays_s": round(mrays, 2),
         "chunks": len(fns),
         "finite": bool(jnp.isfinite(img).all())})
    log({"event": "done"})


if __name__ == "__main__":
    main()
