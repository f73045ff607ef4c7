"""VPU utilization of (1, R) lane rows vs (R/128, 128) sublane blocks.

The reverse-phase ablation (bwd_rev_ablate.jsonl) attributes ~70% of
the reverse walk to the bounce-vjp replay — which is entirely (1, R)
row math. Mosaic tiles vregs as (8, 128); a (1, 512) row should occupy
4 vregs with 1/8 sublane utilization, i.e. every logical row-op costs
4 single-issue VPU slots where a (4, 128) layout costs 1. If measured
true, re-shaping the reverse's per-wave math to (R/128, 128) blocks is
a ~4x lever on ~70% of the reverse.

Cases: a serial FMA chain (x = x*a + b, OPS per fori iteration) on
each shape; plus a reshape-roundtrip case measuring the (1,512) ->
(4,128) relayout cost that a mixed-layout kernel would pay per parked
row.

Usage: python benchmarks/rowshape_probe.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = 256          # chained FMAs per loop iteration


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/rowshape.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytracingincuda_tpu.utils.timing import (
        force, measure_calibration,
    )

    def log(**rec):
        rec["ts"] = time.time()
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    log(event="start", calib=measure_calibration())

    def chain_kernel(a_ref, b_ref, o_ref, *, iters, reshape_to=None,
                     nchains=1):
        def kern(a, b, o):
            av = a[:, :]
            bv = b[:, :]

            def body(_, xs):
                if reshape_to is not None:
                    xs = tuple(x.reshape(reshape_to) for x in xs)
                    a2 = av.reshape(reshape_to)
                    b2 = bv.reshape(reshape_to)
                else:
                    a2, b2 = av, bv
                for _k in range(OPS):
                    xs = tuple(x * a2 + b2 for x in xs)
                if reshape_to is not None:
                    xs = tuple(x.reshape(av.shape) for x in xs)
                return xs

            init = tuple(av + float(i) * 1e-8 for i in range(nchains))
            out = lax.fori_loop(0, iters, body, init)
            acc = out[0]
            for x in out[1:]:
                acc = acc + x
            o[:, :] = acc

        return kern

    def run_case(name, shape, iters, reshape_to=None, nchains=1):
        a = jnp.full(shape, 1.0000001, jnp.float32)
        b = jnp.full(shape, 1e-9, jnp.float32)
        try:
            f = pl.pallas_call(
                chain_kernel(None, None, None, iters=iters,
                             reshape_to=reshape_to, nchains=nchains),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            )
            g = jax.jit(lambda x, y: jnp.sum(f(x, y)))
            t0 = time.perf_counter()
            force(g(a, b))
            cs = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(g(a, b))
                ts.append(time.perf_counter() - t0)
            s = min(ts)
            n_ops = iters * OPS * nchains  # logical row-ops (FMA = 2 flop)
            elems = shape[0] * shape[1]
            log(case=name, shape=list(shape), s=round(s, 4),
                compile_s=round(cs - s, 1),
                ns_per_rowop=round(s / n_ops * 1e9, 3),
                gflops=round(2 * n_ops * elems / s / 1e9, 1))
        except Exception as e:  # noqa: BLE001
            log(case=name, error=repr(e)[:300])

    IT = 400_000
    run_case("row_1x512", (1, 512), IT)
    run_case("blk_4x128", (4, 128), IT)
    run_case("row_1x1024", (1, 1024), IT // 2)
    run_case("blk_8x128", (8, 128), IT)
    run_case("blk_8x512", (8, 512), IT // 4)
    run_case("blk_32x128", (32, 128), IT // 4)
    # relayout amortization: same logical work as row_1x512 but the
    # chain runs in (4,128) with a reshape in/out per OPS-block
    run_case("reshape_roundtrip_512", (1, 512), IT, reshape_to=(4, 128))
    # THROUGHPUT cases: 8 independent chains expose issue-slot cost
    # (the serial single-chain cases above measure FMA latency and come
    # out shape-flat at ~3 ns)
    run_case("tp8_row_1x512", (1, 512), IT // 8, nchains=8)
    run_case("tp8_blk_4x128", (4, 128), IT // 8, nchains=8)
    run_case("tp8_blk_8x128", (8, 128), IT // 8, nchains=8)
    run_case("tp8_row_1x1024", (1, 1024), IT // 16, nchains=8)
    run_case("tp8_blk_8x512", (8, 512), IT // 32, nchains=8)
    run_case("tp8_reshape_512", (1, 512), IT // 8, reshape_to=(4, 128),
             nchains=8)
    log(event="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
