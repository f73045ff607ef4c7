"""TPU probe 3: overhead decomposition + hit-test op-shaving A/B.

(a) RPC floor: force() on a trivial hot program — the per-dispatch
    tunnel latency that wall-clock timing charges to every render.
(b) Pipelined timing: N back-to-back renders forced once — approximates
    device-only time per render (the reference's cudaEvent bracket,
    main.cu:334-343, which excludes dispatch latency too).
(c) Hit-test variants at the headline (K16/rt1024 sorted), timing-only
    monkeypatches of _hit_select:
      real    — current kernel
      nummin  — min in the numerator domain (saves the per-sphere
                root_num * inv_a multiply; candidate real change)
      nosqrt  — sqrt replaced by a multiply (WRONG image; bounds the
                sqrt's share of wave time)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    import raytracingincuda_tpu.ops.pallas_kernel as pk
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.ops.intersect import T_MIN, T_MISS
    from raytracingincuda_tpu.utils.timing import force

    out = open("benchmarks/results/parity_tune3.jsonl", "a", buffering=1)

    def emit(**kw):
        kw["ts"] = time.time()
        out.write(json.dumps(kw) + "\n")
        print(kw, flush=True)

    emit(event="start", devices=str(jax.devices()))
    cam = CameraConfig.reference_default()
    scene = jax.device_put(build_scene(1))

    # (a) RPC floor
    tiny = jax.jit(lambda x: x * 2 + 1)
    v = jnp.float32(1.0)
    force(tiny(v))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        force(tiny(v))
        ts.append((time.perf_counter() - t0) * 1e3)
    emit(case="rpc_floor_force", ms_min=min(ts), ms_median=sorted(ts)[5])

    def make_order(w, h, kpl, rt):
        prepass = jax.jit(lambda s, c: pk.measure_difficulty(
            s, c, w, h, probe_depth=8, probe_samples=6))
        order_fn = jax.jit(lambda seg: pk.difficulty_order(seg, 8, 6))
        order = order_fn(prepass(scene, cam))
        force(order)
        padded = pk._round_up(w * h, kpl * rt)
        if order.shape[0] < padded:
            order = jnp.concatenate([
                order, jnp.arange(order.shape[0], padded, dtype=jnp.uint32),
            ])
        return order

    # (b) pipelined small config
    W, H, SPP, D = 320, 192, 10, 25
    order_s = make_order(W, H, 8, 512)
    f_small = jax.jit(lambda s, c, o: pk.render_pallas(
        s, c, W, H, SPP, D, pixel_order=o, pixels_per_lane=8, ray_tile=512))
    force(f_small(scene, cam, order_s))
    for n in (1, 10):
        t0 = time.perf_counter()
        outs = [f_small(scene, cam, order_s) for _ in range(n)]
        force(outs[-1])
        ms = (time.perf_counter() - t0) * 1e3 / n
        emit(case=f"small_pipelined_x{n}", ms_per_render=ms)

    # (c) hit-test variants at the headline
    real_hit_select = pk._hit_select

    def nummin(cxc, cyc, czc, rc, active, a, d_dot_o, o2, c_dot_d, c_dot_o):
        c2r2 = cxc * cxc + cyc * cyc + czc * czc - rc * rc
        h = c_dot_d - d_dot_o
        c = (c2r2 + o2) - 2.0 * c_dot_o
        disc = h * h - a * c
        disc_pos = disc > 0.0
        sqrtd = jnp.sqrt(jnp.where(disc_pos, disc, 1.0))
        tmin_a = T_MIN * a
        near_num = h - sqrtd
        root_num = jnp.where(near_num > tmin_a, near_num, h + sqrtd)
        valid = disc_pos & (root_num > tmin_a) & (active > 0.5)
        t_num_all = jnp.where(valid, root_num, T_MISS)
        t_num = jnp.min(t_num_all, axis=0, keepdims=True)
        hit = t_num < T_MISS
        t = t_num * (1.0 / a)
        one_hot = (hit & (t_num_all == t_num)).astype(t_num_all.dtype)
        return hit, t, one_hot

    def nosqrt(cxc, cyc, czc, rc, active, a, d_dot_o, o2, c_dot_d, c_dot_o):
        c2r2 = cxc * cxc + cyc * cyc + czc * czc - rc * rc
        h = c_dot_d - d_dot_o
        c = (c2r2 + o2) - 2.0 * c_dot_o
        disc = h * h - a * c
        disc_pos = disc > 0.0
        sqrtd = jnp.where(disc_pos, disc, 1.0) * 0.49999  # WRONG: timing only
        tmin_a = T_MIN * a
        near_num = h - sqrtd
        root_num = jnp.where(near_num > tmin_a, near_num, h + sqrtd)
        valid = disc_pos & (root_num > tmin_a) & (active > 0.5)
        t_num_all = jnp.where(valid, root_num, T_MISS)
        t_num = jnp.min(t_num_all, axis=0, keepdims=True)
        hit = t_num < T_MISS
        t = t_num * (1.0 / a)
        one_hot = (hit & (t_num_all == t_num)).astype(t_num_all.dtype)
        return hit, t, one_hot

    W, H, SPP, D = 1280, 768, 100, 25
    order = make_order(W, H, 16, 1024)
    for tag, fn in (("real", real_hit_select), ("nummin", nummin),
                    ("nosqrt", nosqrt)):
        pk._hit_select = fn
        try:
            f = jax.jit(lambda s, c, o: pk.render_pallas(
                s, c, W, H, SPP, D, pixel_order=o,
                pixels_per_lane=16, ray_tile=1024))
            t0 = time.perf_counter()
            force(f(scene, cam, order))
            comp = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(f(scene, cam, order))
                times.append((time.perf_counter() - t0) * 1e3)
            emit(case=f"headline_k16_rt1024_{tag}", ms=min(times),
                 compile_s=round(comp, 1))
        except Exception as e:  # noqa: BLE001
            emit(case=f"headline_k16_rt1024_{tag}", error=repr(e)[:400])
        finally:
            pk._hit_select = real_hit_select

    emit(event="done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
