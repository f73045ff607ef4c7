"""North-star probe: fwd+bwd Mrays/s/chip at scene 1, 1200x675.

BASELINE.json's metric is "Mrays/s/chip fwd+bwd at scene1 1200x675x500spp".
The fused train-step kernel (ops/pallas_backward.make_mse_train) makes
fwd+bwd a single program; spp scales linearly, so we measure at a probe
spp and report camera-ray throughput (W*H*spp / t). Depth 25 matches the
reference CLI default; a depth-8 row shows the shallow-trace rate.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from raytracingincuda_tpu.models.camera import CameraConfig
from raytracingincuda_tpu.models.scene import build_scene
from raytracingincuda_tpu.ops.pallas_backward import make_mse_train
from raytracingincuda_tpu.ops.pallas_kernel import render_pallas
from raytracingincuda_tpu.utils.timing import force

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/northstar_probe.jsonl"
W, H = 1200, 675
RUNS = 3


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    log({"event": "start", "devices": str(jax.devices()),
         "cfg": f"scene1_{W}x{H}"})
    scene = jax.device_put(build_scene(1))
    cam = CameraConfig.reference_default()
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (H, W, 3), jnp.float32)

    # forward-only reference rows (the regen kernel); 500spp/d50 is
    # BASELINE.json configs[3] (single-chip row of it)
    for spp, depth in ((16, 25), (100, 25), (500, 50)):
        f = jax.jit(lambda s, c, spp=spp, depth=depth: render_pallas(
            s, c, W, H, spp, depth, pixels_per_lane=8))
        t0 = time.perf_counter()
        force(f(scene, cam))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            force(f(scene, cam))
            times.append((time.perf_counter() - t0) * 1e3)
        ms = min(times)
        log({"case": f"fwd_{spp}spp_d{depth}", "ms": round(ms, 1),
             "compile_s": round(compile_s, 1),
             "mrays_s": round(W * H * spp / ms / 1e3, 1)})

    # frozen difficulty order for the sorted fwd+bwd rows (prepass is a
    # separate program; in a train loop it runs once and amortizes)
    from raytracingincuda_tpu.ops.pallas_kernel import (
        difficulty_order, measure_difficulty,
    )
    pre = jax.jit(lambda s, c: measure_difficulty(
        s, c, W, H, probe_depth=8, probe_samples=6))
    order = jax.jit(lambda sg: difficulty_order(sg, 8, 6))(pre(scene, cam))
    order.block_until_ready()

    # fwd+bwd rows (fused train step; value+grads+SGD update, one
    # program). The north-star config (scene1 1200x675x500spp fwd+bwd)
    # is rate-derived from the 16spp sorted row: Mrays/s is spp-flat,
    # and running 500spp as ONE fused Mosaic dispatch (~109 s) crashes
    # the tunneled TPU worker ("TPU worker process crashed or
    # restarted") — single-dispatch wall time must stay well under
    # ~100 s; chunk big sample counts by sample_offset instead.
    for spp, depth, po, tag in ((16, 8, None, ""), (16, 25, None, ""),
                                (16, 8, "sorted", "_sorted"),
                                (16, 25, "sorted", "_sorted")):
        vg = make_mse_train(scene.mat_type, scene.active, W, H, spp, depth,
                            gamma=False,
                            pixel_order=order if po else None)

        @jax.jit
        def step(params, c, tgt):
            loss, _img, (dp, _dc) = vg(params, c, tgt)
            new = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g,
                                         params, dp)
            return loss, new

        t0 = time.perf_counter()
        loss, _ = step(scene.params, cam, target)
        force(loss)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            loss, _ = step(scene.params, cam, target)
            force(loss)
            times.append((time.perf_counter() - t0) * 1e3)
        ms = min(times)
        log({"case": f"fwdbwd_{spp}spp_d{depth}{tag}", "ms": round(ms, 1),
             "compile_s": round(compile_s, 1), "loss": float(loss),
             "mrays_s": round(W * H * spp / ms / 1e3, 1)})
    log({"event": "done"})


if __name__ == "__main__":
    main()
