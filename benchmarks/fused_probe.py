"""Fused train-step kernel vs the two-program custom_vjp path (real TPU).

Config matches the backward-kernel probe (bwd_probe.py): 640x384, 16 spp,
depth 8 — where the backward kernel alone measured 1124 ms and the oracle
recompute-VJP 6985 ms. Writes JSONL rows as results land (compile-service
discipline: one process, long timeout, never kill mid-compile).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_scene
from raytracingincuda_tpu.ops import grad as gradlib
from raytracingincuda_tpu.utils.timing import force

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fused_probe.jsonl"
W, H, SPP, DEPTH = 640, 384, 16, 8
RUNS = 3


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def time_steps(step_fn, state, cam, scene, target):
    t0 = time.perf_counter()
    state2, loss = step_fn(state, cam, scene.mat_type, scene.active, target)
    force(loss)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _, loss = step_fn(state, cam, scene.mat_type, scene.active, target)
        force(loss)
        times.append((time.perf_counter() - t0) * 1e3)
    return min(times), compile_s, float(loss)


def main():
    log({"event": "start", "devices": str(jax.devices()),
         "cfg": f"{W}x{H}x{SPP}spp_d{DEPTH}"})
    scene = jax.device_put(build_scene(2, pad_to_multiple=64))
    cam = CameraConfig.reference_default()
    # a fixed random target keeps the step cheap to set up (no extra
    # render program before the probe)
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (H, W, 3), jnp.float32)

    for impl in ("fused", "pallas"):
        init_fn, step_fn = gradlib.make_train_step(
            W, H, SPP, DEPTH, learning_rate=1e-2, impl=impl,
        )
        if impl == "fused":
            step_fn = jax.jit(step_fn)
        state = init_fn(scene.params)
        ms, compile_s, loss = time_steps(step_fn, state, cam, scene, target)
        log({"case": f"train_step_{impl}", "ms": round(ms, 1),
             "compile_s": round(compile_s, 1), "loss": loss})
    log({"event": "done"})


if __name__ == "__main__":
    main()
