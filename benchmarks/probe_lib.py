"""Shared scaffolding for TPU measurement probes.

Every probe used to re-implement the same pieces: repo-path bootstrap,
JSONL emit-as-you-go (compile-service etiquette: one long-lived process,
rows land as they finish), wall/pipelined timing with forced completion,
and the difficulty-order builder. One copy lives here; probe scripts keep
only their measurement logic (round-2 VERDICT weak #6).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def emitter(out_path: str):
    """Append-as-you-land JSONL writer (+ stdout echo)."""
    def emit(**kw):
        kw["ts"] = time.time()
        with open(out_path, "a") as f:
            f.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    return emit


def time_wall(fn, *args, reps: int = 5):
    """{best, med} wall ms over reps, after one untimed warmup/compile
    call; completion forced via the device-checksum read."""
    from raytracingincuda_tpu.utils.timing import force

    force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return {"best_ms": round(ts[0], 2), "med_ms": round(ts[len(ts) // 2], 2)}


def time_pipelined(fn, *args, n: int = 32):
    """Device-bracket analog: n back-to-back dispatches, forced once;
    per-render ms (amortizes the tunnel RTT like the reference's
    cudaEvent bracket excludes dispatch latency by construction)."""
    from raytracingincuda_tpu.utils.timing import force

    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    force(outs[-1])
    return round((time.perf_counter() - t0) * 1e3 / n, 2)


def difficulty_order_for(scene, cam, width, height, kpl, ray_tile,
                         probe_depth=8, probe_samples=6, seed=1227,
                         interpret=False, mesh=None):
    """Difficulty-sorted pixel order extended to the main render's
    padding (the separate-jit prepass render_api uses)."""
    import jax
    import jax.numpy as jnp

    from raytracingincuda_tpu.ops.pallas_kernel import (
        _round_up, difficulty_order, measure_difficulty,
    )

    seg = jax.jit(functools.partial(
        measure_difficulty, img_width=width, img_height=height,
        probe_depth=probe_depth, probe_samples=probe_samples, seed=seed,
        interpret=interpret, mesh=mesh,
    ))(scene, cam)
    order = difficulty_order(seg, probe_depth, probe_samples)
    padded = _round_up(width * height, kpl * ray_tile)
    if order.shape[0] < padded:
        order = jnp.concatenate([
            order, jnp.arange(order.shape[0], padded, dtype=jnp.uint32),
        ])
    return order[:padded]


def build_forward(spec: dict, scene, cam):
    """Jitted forward renderer from a knob dict.

    spec keys (all optional except width/height/samples/bounces):
      impl: pallas | stream | df64 | oracle     (default pallas)
      k, rt: pixels_per_lane / ray_tile         (impl defaults if absent)
      sorted: difficulty-ordered tiles (bool)
      rr_start, mxu_dots, layout: render_pallas passthroughs
      block, lane_group, resident: stream knobs (block also re-prepares)
      gamma: default True
    Returns (callable(scene, cam) -> image-like, static_info dict).
    """
    import jax

    W, H = spec["width"], spec["height"]
    spp, depth = spec["samples"], spec["bounces"]
    impl = spec.get("impl", "pallas")
    interpret = jax.default_backend() == "cpu"
    info = {}

    if impl == "oracle":
        from raytracingincuda_tpu.ops import tracer

        fn = jax.jit(functools.partial(
            tracer.render, img_width=W, img_height=H,
            samples_per_pixel=spp, max_depth=depth,
            rr_start=spec.get("rr_start"),
        ))
        return fn, info

    if impl == "df64":
        import jax.numpy as jnp

        from raytracingincuda_tpu.ops.df64_trace import (
            initialize_f64, pack_scene_matrix_df64_device,
        )
        from raytracingincuda_tpu.ops.pallas_df64 import make_df64_render

        kpl = spec.get("k", 16)
        rt = spec.get("rt", 512)
        order = (difficulty_order_for(scene, cam, W, H, kpl, rt,
                                      interpret=interpret)
                 if spec.get("sorted") else None)
        sm_hi, sm_lo = pack_scene_matrix_df64_device(scene)
        kern = make_df64_render(
            W, H, spp, depth, sm_hi.shape[0], seed=spec.get("seed", 1227),
            ray_tile=rt, pixels_per_lane=kpl, pixel_order=order,
            interpret=interpret,
        )

        def fn(s, c, _hi=sm_hi, _lo=sm_lo):
            rows = jnp.asarray(initialize_f64(c, W, H), jnp.float32)
            out = kern(_hi, _lo, rows)
            return jnp.stack([out.hi, out.lo], axis=-1)

        info.update(k=kpl, rt=rt)
        return fn, info

    if impl == "stream":
        from raytracingincuda_tpu.ops.pallas_stream import (
            StreamScene, prepare_stream_scene, render_pallas_stream,
        )

        stream = prepare_stream_scene(
            scene, block=spec.get("block", 256),
            pad_pairs=not spec.get("one_block", False),
        )
        kpl = spec.get("k", 1)
        rt = spec.get("rt", 512)
        resident = spec.get("resident")
        order = (difficulty_order_for(scene, cam, W, H, kpl, rt,
                                      interpret=interpret)
                 if spec.get("sorted") else None)
        render = jax.jit(functools.partial(
            render_pallas_stream, img_width=W, img_height=H,
            samples_per_pixel=spp, max_depth=depth,
            seed=spec.get("seed", 1227), rr_start=spec.get("rr_start"),
            lane_group=spec.get("lane_group", 0), pixels_per_lane=kpl,
            ray_tile=rt, pixel_order=order, resident=resident,
            gamma=spec.get("gamma", True), interpret=interpret,
        ))

        def fn(s, c, _st=stream):
            return render(_st, c)

        info.update(k=kpl, rt=rt, block=stream.block,
                    n_blocks=stream.n_blocks,
                    lane_group=spec.get("lane_group", 0))
        return fn, info

    # impl == pallas (the production VMEM/HBM kernel)
    from raytracingincuda_tpu.ops.pallas_kernel import render_pallas

    kpl = spec.get("k", 1)
    rt = spec.get("rt", 512)
    order = (difficulty_order_for(scene, cam, W, H, kpl, rt,
                                  interpret=interpret)
             if spec.get("sorted") else None)
    fn = jax.jit(functools.partial(
        render_pallas, img_width=W, img_height=H, samples_per_pixel=spp,
        max_depth=depth, seed=spec.get("seed", 1227),
        layout=spec.get("layout", "vmem"), rr_start=spec.get("rr_start"),
        mxu_dots=spec.get("mxu_dots", False), pixels_per_lane=kpl,
        ray_tile=rt, pixel_order=order, gamma=spec.get("gamma", True),
        interpret=interpret,
    ))
    info.update(k=kpl, rt=rt, layout=spec.get("layout", "vmem"))
    return fn, info
