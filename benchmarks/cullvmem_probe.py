"""Same-day A/B: production VMEM scan vs the culled dense-resident walk
at the headline config (VERDICT r3 next-steps #1).

The production VMEM kernel brute-forces all 488 spheres per wave
(hittable.h:80-98 structure at 86%-of-ceiling efficiency); the offline
walk replay (cull_stats_scene1.jsonl, production difficulty-sorted
tiles) says a 32-sphere Morton-block walk with front-to-back (camdist)
block order + running-t_best bound culling would skip ~33% of
block-waves at whole-tile granularity (~50% at 128-lane groups). The
machinery already exists: render_pallas_stream resident=True walks
VMEM-resident blocks with pl.when bound culling; `dense=True` packs the
16-column matrix so the per-block winner gather stays as cheap as the
VMEM kernel's.

This probe measures, same session: the production vmem renderer
(parity + rr2 controls) and the culled walk at block {32, 64} x
lane_group {0, 128} — all at the production K16/rt1024 + sorted tiles.
Images are bit-identical variants (verified in interpret mode; see
test_stream.py::test_dense_resident_cull_matches_vmem).

Usage: python benchmarks/cullvmem_probe.py [--out ...]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, SPP, DEPTH = 1280, 768, 100, 25
KPL, RT = 16, 1024


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/cullvmem.jsonl")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip_controls", action="store_true")
    ap.add_argument("--blocks", type=int, nargs="*", default=[32, 64])
    ap.add_argument("--groups", type=int, nargs="*", default=[0, 128])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.models.camera import CameraConfig, initialize
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.pallas_kernel import (
        _round_up, difficulty_order, measure_difficulty,
    )
    from raytracingincuda_tpu.ops.pallas_stream import (
        StreamScene, prepare_stream_scene, render_pallas_stream,
    )
    from raytracingincuda_tpu.render_api import make_renderer
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log(event="start", calib=measure_calibration(),
        config=f"{W}x{H}x{SPP}spp/d{DEPTH}")

    scene = build_scene(1)
    cam = CameraConfig.reference_default()
    interpret = jax.default_backend() == "cpu"

    def timed(fn, *a):
        t0 = time.perf_counter()
        force(fn(*a))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            force(fn(*a))
            ts.append((time.perf_counter() - t0) * 1e3)
        return min(ts), compile_s

    # ---- controls: production vmem renderer --------------------------
    base = dict(scene_id=1, width=W, height=H, samples=SPP, bounces=DEPTH)
    if not args.skip_controls:
        for name, kw in [("vmem_parity", {}), ("vmem_rr2", {"rr_start": 2})]:
            try:
                r = make_renderer(RenderConfig(**base, **kw))
                ms, cs = timed(r, scene, cam)
                log(case=name, render_ms=round(ms, 1),
                    compile_s=round(cs, 1))
            except Exception as e:  # noqa: BLE001
                log(case=name, error=repr(e)[:300])

    # ---- one shared difficulty order at the walk's padding -----------
    pd, ps = 8, 6
    seg = jax.jit(functools.partial(
        measure_difficulty, img_width=W, img_height=H, probe_depth=pd,
        probe_samples=ps, interpret=interpret,
    ))(scene, cam)
    order = difficulty_order(seg, pd, ps)
    padded = _round_up(W * H, KPL * RT)
    if order.shape[0] < padded:
        order = jnp.concatenate([
            order, jnp.arange(order.shape[0], padded, dtype=jnp.uint32),
        ])
    order = order[:padded]

    cc = initialize(cam, W, H).center
    campt = [float(cc.x), float(cc.y), float(cc.z)]

    # ---- culled dense-resident walks ---------------------------------
    for block in args.blocks:
        st = prepare_stream_scene(scene, block=block, pad_pairs=False,
                                  dense=True, camdist_from=campt)
        for group in args.groups:
            for name, rr in [(f"cull_b{block}_g{group}_parity", None),
                             (f"cull_b{block}_g{group}_rr2", 2)]:
                def call(scene_mat, bounds, rr=rr, group=group,
                         block=block):
                    stream = StreamScene(scene_mat=scene_mat,
                                         bounds=bounds, block=block)
                    return render_pallas_stream(
                        stream, cam, W, H, SPP, DEPTH,
                        rr_start=rr, lane_group=group,
                        pixels_per_lane=KPL, ray_tile=RT,
                        pixel_order=order, resident=True,
                        interpret=interpret,
                    )

                try:
                    fn = jax.jit(call)
                    ms, cs = timed(fn, st.scene_mat, st.bounds)
                    log(case=name, block=block, lane_group=group,
                        nb=st.n_blocks, render_ms=round(ms, 1),
                        compile_s=round(cs, 1))
                except Exception as e:  # noqa: BLE001
                    log(case=name, block=block, lane_group=group,
                        error=repr(e)[:300])

    log(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
