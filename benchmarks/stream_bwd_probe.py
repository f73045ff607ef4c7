"""TPU probe: streaming-HBM backward kernel at 10k spheres.

The VMEM backward cannot even compile at this scene size (the forward
VMEM kernel tops out ~5k); this measures the streaming backward's
gradient step so the differentiable-big-scene capability carries a real
number. Config matches the stream 10k forward case (stream_kpl.jsonl).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_random_scene
from raytracingincuda_tpu.ops.pallas_stream import (
    prepare_stream_scene, render_pallas_stream,
)
from raytracingincuda_tpu.ops.pallas_stream_backward import (
    render_pallas_stream_grads, stream_grads_to_scene_mat,
)
from raytracingincuda_tpu.utils.timing import force

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_bwd_probe.jsonl"
W, H, SPP, DEPTH = 640, 384, 4, 6
N_SPHERES = 10_000
RUNS = 3


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    log({"event": "start", "devices": str(jax.devices()),
         "cfg": f"{N_SPHERES}sph_{W}x{H}x{SPP}spp_d{DEPTH}"})
    scene = build_random_scene(N_SPHERES, seed=3)
    # NOTE: no jax.device_put on the NamedTuple — it would turn the static
    # int `block` field into a device scalar the kernel can't close over
    stream = prepare_stream_scene(scene)
    cam = CameraConfig.reference_default()
    g_acc = jnp.full((H, W, 3), 1.0 / (W * H * 3 * SPP), jnp.float32)

    # close over the StreamScene: its block/perm fields are static config,
    # not jit-traceable leaves (probe_lib pattern)
    fwd = jax.jit(lambda: render_pallas_stream(
        stream, cam, W, H, SPP, DEPTH, gamma=False))
    t0 = time.perf_counter()
    force(fwd())
    log({"case": "fwd_compile", "s": round(time.perf_counter() - t0, 1)})
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        force(fwd())
        times.append((time.perf_counter() - t0) * 1e3)
    log({"case": "stream_fwd", "ms": round(min(times), 1)})

    bwd = jax.jit(lambda: render_pallas_stream_grads(
        stream, cam, g_acc, W, H, SPP, DEPTH))
    t0 = time.perf_counter()
    d_stream, d_cr = bwd()
    force(d_cr)
    log({"case": "bwd_compile", "s": round(time.perf_counter() - t0, 1)})
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        d_stream, d_cr = bwd()
        force(d_cr)
        times.append((time.perf_counter() - t0) * 1e3)
    d_sm = stream_grads_to_scene_mat(d_stream, stream, scene.num_slots)
    nz = int(jnp.sum(jnp.any(d_sm != 0.0, axis=1)))
    log({"case": "stream_bwd", "ms": round(min(times), 1),
         "spheres_with_grad": nz})
    log({"event": "done"})


if __name__ == "__main__":
    main()
