"""TPU probe: fused train step with the wave-reversed grad sweep
(sweep='wave', round 3) vs the per-sample re-trace (sweep='sample'),
at the fused benchmark shape (scene 2, 640x384x16spp — fused_probe /
fused_park grids) at depths where parking does NOT fit (d25): the wave
sweep is the auto default there. rt and window laddered to find the
fused knee (the standalone grad kernel's knee was rt512/w128,
bwd_wave.jsonl). JSONL rows land as they finish."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_backward import mse_train_pallas
    from raytracingincuda_tpu.utils.timing import force

    out = open("benchmarks/results/fused_wave.jsonl", "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    scene = jax.device_put(build_scene(2))
    cam = CameraConfig.reference_default()
    W, H, SPP = 640, 384, 16
    target = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3),
                                jnp.float32)

    # (depth, rt, sweep, window); park off everywhere (d25 never fits)
    cases = [
        (25, 1024, "sample", 0),
        (25, 1024, "wave", 0),
        (25, 512, "wave", 0),      # auto window = 127
        (25, 512, "wave", 64),
        (25, 512, "sample", 0),
        (12, 512, "wave", 0),      # vs fused_park d12 rt256 park=225ms
    ]
    for depth, rt, sweep, window in cases:
        tag = f"fused_d{depth}_rt{rt}_{sweep}" + (
            f"_w{window}" if window else "_wauto")
        try:
            f = jax.jit(lambda s, c, t, d=depth, r=rt, sw=sweep, w=window:
                        mse_train_pallas(s, c, t, W, H, SPP, d,
                                         ray_tile=r, park_residuals=False,
                                         sweep=sw, window=w))
            t0 = time.perf_counter()
            force(f(scene, cam, target)[0])
            comp = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f(scene, cam, target)[0])
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=tag, ms=min(times), compile_s=round(comp, 1))
        except Exception as e:  # noqa: BLE001
            emit(case=tag, error=repr(e)[:300])

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
