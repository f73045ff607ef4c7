"""TPU probe: fused streaming train step vs two-program composition.

make_stream_train(fused=True) runs render+loss+grads+optimizer as ONE
jitted program (mse_train_stream kernel); fused=False composes a
forward program and a grad program eagerly, paying a tunnel dispatch
per phase. Config matches stream_bwd_probe (10k spheres,
640x384x4spp/d6) whose separate fwd/bwd kernels measured 1049/1415 ms.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_random_scene
from raytracingincuda_tpu.ops.grad import make_stream_train
from raytracingincuda_tpu.ops.pallas_stream import (
    prepare_stream_scene, render_pallas_stream,
)

W, H, SPP, DEPTH = 640, 384, 4, 6
N = 10_000
RUNS = 3
OUT = "benchmarks/results/stream_fused.jsonl"


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    log({"event": "start", "devices": str(jax.devices()),
         "cfg": f"{N}sph_{W}x{H}x{SPP}spp_d{DEPTH}"})
    scene = build_random_scene(N, seed=3)
    stream = prepare_stream_scene(scene)
    cam = CameraConfig.reference_default()
    target = jax.jit(lambda: render_pallas_stream(
        stream, cam, W, H, SPP, DEPTH, gamma=False))()
    target = target * 0.9
    jax.block_until_ready(target)

    for fused in (True, False):
        init_fn, step_fn = make_stream_train(
            stream, W, H, SPP, DEPTH, learning_rate=1e-3, fused=fused)
        state = init_fn(scene.params)
        t0 = time.perf_counter()
        state, loss = step_fn(state, cam, scene.mat_type, scene.active,
                              target)
        jax.block_until_ready(jax.tree_util.tree_leaves(state.params))
        cs = round(time.perf_counter() - t0, 1)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            state, loss = step_fn(state, cam, scene.mat_type,
                                  scene.active, target)
            jax.block_until_ready(
                jax.tree_util.tree_leaves(state.params))
            times.append((time.perf_counter() - t0) * 1e3)
        log({"case": f"train_step_fused{int(fused)}",
             "ms": round(min(times), 1), "compile_s": cs,
             "loss": float(loss)})
    log({"event": "done"})


if __name__ == "__main__":
    main()
