"""Issue-slot census of the forward hit-scan's (N, R) math.

The roofline credits the forward wave with 95% of "achievable VPU" —
but its achievable-rate microbench used row shapes, which rowshape.jsonl
shows run at HALF the machine's dense rate. The scan is (512, 512)
DENSE, and its measured per-wave budget (~30 vreg-slot-equivalents)
matches its naive op count, i.e. one slot per counted op — which would
mean the dot products' mul+add pairs are NOT being FMA-fused and the
scan has real headroom.

This probe times the REAL scan core (c_dot_d/c_dot_o + _hit_select) in
isolation on resident (512, 512) data, plus decomposed variants, and
reports vreg-slots per iteration (ns x 1.88 slots/ns at the measured
issue rate) against each variant's counted op budget.

Usage: python benchmarks/scan_slots_probe.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, R = 512, 512
ITERS = 20_000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/scan_slots.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from raytracingincuda_tpu.ops.pallas_kernel import _hit_select
    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log(event="start", calib=measure_calibration(), n=N, r=R)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    cx = jax.random.normal(ks[0], (N, 1), jnp.float32)
    cy = jax.random.normal(ks[1], (N, 1), jnp.float32)
    cz = jax.random.normal(ks[2], (N, 1), jnp.float32)
    rc = jax.random.uniform(ks[3], (N, 1), jnp.float32) + 0.2
    active = jnp.ones((N, 1), jnp.float32)
    dx = jax.random.normal(ks[4], (1, R), jnp.float32)
    dy = jax.random.normal(ks[5], (1, R), jnp.float32)
    dz = jax.random.normal(ks[6], (1, R), jnp.float32)
    o0 = jax.random.normal(ks[7], (1, R), jnp.float32) * 0.1

    def make(body_fn, n_in=10):
        def kern(*refs):
            ins = [r[:, :] for r in refs[:-1]]
            out = refs[-1]

            def body(_, carry):
                return body_fn(ins, carry)

            out[:, :] = lax.fori_loop(0, ITERS, body, ins[9] * 1.0)

        return kern

    # variant bodies: carry is a (1, R) row fed back so nothing hoists.
    # counted ops = hand-counted (N,R)-equivalent primitive ops
    def full_scan(ins, carry):
        (cx, cy, cz, rc, active, dx, dy, dz, ox, oy) = ins
        oxc = ox + carry * 1e-30
        a = dx * dx + dy * dy + dz * dz
        d_dot_o = dx * oxc + dy * oy + dz * oy
        o2 = oxc * oxc + oy * oy + oy * oy
        c_dot_d = cx * dx + cy * dy + cz * dz          # (N, R) 5 ops
        c_dot_o = cx * oxc + cy * oy + cz * oy         # (N, R) 5 ops
        hit, t, one_hot = _hit_select(
            cx, cy, cz, rc, active, a, d_dot_o, o2, c_dot_d, c_dot_o
        )
        return t + jnp.max(one_hot, axis=0, keepdims=True) * 1e-30

    def dots_only(ins, carry):
        (cx, cy, cz, rc, active, dx, dy, dz, ox, oy) = ins
        oxc = ox + carry * 1e-30
        c_dot_d = cx * dx + cy * dy + cz * dz          # 5 (N,R) ops
        c_dot_o = cx * oxc + cy * oy + cz * oy         # 5 (N,R) ops
        return jnp.max(c_dot_d, axis=0, keepdims=True) + jnp.max(
            c_dot_o, axis=0, keepdims=True) * 1e-30

    def muladd_chain(ins, carry):
        # 10 explicitly FMA-shaped (N,R) ops (x = x*a + b): the best
        # case the dots could reach if fully fused
        (cx, cy, cz, rc, active, dx, dy, dz, ox, oy) = ins
        x = cx * (dx + carry * 1e-30)
        for _ in range(9):
            x = x * 1.0000001 + cx
        return jnp.max(x, axis=0, keepdims=True)

    def sqrt_only(ins, carry):
        (cx, cy, cz, rc, active, dx, dy, dz, ox, oy) = ins
        x = cx * dx + carry * 1e-30                    # 2
        s = jnp.sqrt(jnp.abs(x) + 1.0)                 # abs,add,sqrt
        return jnp.max(s, axis=0, keepdims=True)

    cases = [
        ("full_scan", full_scan, 32),
        ("dots_only", dots_only, 10),
        ("muladd10", muladd_chain, 10),
        ("sqrt_only", sqrt_only, 5),
    ]
    ins = (cx, cy, cz, rc, active, dx, dy, dz, o0, o0 * 0.5)
    for name, fn, counted in cases:
        try:
            f = pl.pallas_call(
                make(fn),
                out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
            )
            g = jax.jit(lambda *a: jnp.sum(f(*a)))
            t0 = time.perf_counter()
            force(g(*ins))
            cs = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(g(*ins))
                ts.append(time.perf_counter() - t0)
            s = min(ts)
            ns_it = s / ITERS * 1e9
            # vreg slots: (N,R) op = N*R/1024 = 256 vregs; issue rate
            # ~1.88 slots/ns (rowshape tp8 dense)
            slots = ns_it * 1.88 / 256
            log(case=name, s=round(s, 4), ns_per_iter=round(ns_it, 1),
                slots_per_nr_op_budget=round(slots, 2), counted=counted,
                compile_s=round(cs - s, 1))
        except Exception as e:  # noqa: BLE001
            log(case=name, error=repr(e)[:300])
    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
