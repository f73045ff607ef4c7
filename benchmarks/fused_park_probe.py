"""TPU probe: fused train step with parked residuals (reverse-only grad
sweep) vs the re-tracing fused kernel, at the fused benchmark config
(scene 2, 640x384x16spp, d8 — fused_probe.jsonl's shape) and d4/d12.
Parking needs a (spp*depth*32, R) VMEM scratch, so d8 runs at rt512
(8.4 MB) and d12 is expected to fail the auto gate / OOM — probed to
find the real ceiling. JSONL rows land as they finish."""
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

    out = open("benchmarks/results/fused_park.jsonl", "a", buffering=1)

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

    cases = [
        (4, 512, True), (4, 1024, False),
        (12, 1024, False), (12, 512, False), (12, 256, True),
        (8, None, None),            # auto: expect rt512 + park
        (8, 1024, True),            # expect fail-fast ValueError
    ]
    for depth, rt, park in cases:
        tag = (f"fused_d{depth}_rt{rt}_"
               f"{ {True: 'park', False: 'retrace', None: 'auto'}[park] }")
        try:
            f = jax.jit(lambda s, c, t, d=depth, r=rt, p=park:
                        mse_train_pallas(s, c, t, W, H, SPP, d,
                                         ray_tile=r,
                                         park_residuals=p))
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
