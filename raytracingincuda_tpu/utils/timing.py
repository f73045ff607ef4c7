"""Timing helpers with forced device execution.

The reference brackets its kernel with cudaEvents (main.cu:84-96,334-345).
The JAX analog is wall-clock around a dispatch plus a forced completion.
On some PJRT transports (e.g. tunneled/relayed devices) ``block_until_ready``
acks dispatch without waiting for execution, and fetching a full image pays
for the transport, not the render — so we force completion with a
device-side scalar reduction and read back 4 bytes.
"""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def force(x) -> float:
    """Force execution of x; returns a checksum scalar (device-side sum)."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(l) for l in leaves))


def time_fn(fn: Callable, *args, runs: int = 3) -> Tuple[float, float]:
    """(best_ms, checksum) over ``runs`` timed executions of fn(*args)."""
    best = float("inf")
    chk = 0.0
    for _ in range(runs):
        t0 = time.perf_counter()
        chk = force(fn(*args))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best, chk


def measure_calibration(mxu: bool = True, runs: int = 10) -> dict:
    """Day-calibration record to commit BESIDE wall-clock artifacts.

    Wall numbers on the tunneled device are hostage to two day-varying
    quantities (VERDICT r3 weak #4): the tunnel RTT (noop
    dispatch+force floor measured 3 ms on one day, 25.6 ms on another —
    `results/smallrow.jsonl`) and the device-day kernel clock (the same
    commit measured 312 vs 444 ms across days — verify skill, round-3
    session 2). Committing this record with every sweep/bench makes
    cross-round comparisons auditable against that drift.

      rtt_floor_ms   min over ``runs`` of a cached noop jit
                     dispatch + force() roundtrip — the wall-clock tax
                     every sub-100 ms render pays on this transport
      mxu_tflops_bf16 / mxu_clock_ghz
                     chained 1024^2 bf16 matmul peak and the implied
                     single-MXU clock (128x128 MACs/cycle) — the
                     device-day frequency reference (roofline.py
                     measures the fuller 2048^2 version)
      backend_version
                     the PJRT platform_version string (plugin version,
                     SerializedExecutable/compile-cache versions, build
                     cl) + jax version. Motivation: round-4 session-1
                     perf rows became unreproducible after a
                     compile-service-side change (docs/ROADMAP.md
                     "Superseded") and nothing recorded which service
                     produced them.
    """
    rec: dict = {}
    try:
        from jax._src import xla_bridge

        pv = getattr(xla_bridge.get_backend(), "platform_version", "")
        rec["backend_version"] = "; ".join(
            s for s in str(pv).splitlines() if s) + f"; jax {jax.__version__}"
    except Exception:  # noqa: BLE001 — calibration must never fail a bench
        rec["backend_version"] = f"jax {jax.__version__}"
    f = jax.jit(lambda v: (v * 2 + 1).sum())
    x = jnp.arange(8.0)
    float(f(x))  # compile
    floors = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(f(x))
        floors.append((time.perf_counter() - t0) * 1e3)
    rec["rtt_floor_ms"] = round(min(floors), 2)
    if mxu and jax.default_backend() != "cpu":
        from jax import lax

        # the chain must dwarf the RTT floor or the measurement reads the
        # transport, not the MXU (a 1024^2 x64 chain is ~4 ms of matmul
        # against a ~30 ms floor — measured 4.9 "TF/s" on a 35 TF/s
        # part). 2048^2 x1024 is ~100 ms of matmul at ~180 TF/s, and the
        # measured floor is subtracted besides — chain=256 (~24 ms body)
        # still spread 159-213 TF/s across same-day calls from ±3 ms of
        # floor noise.
        n, chain = 2048, 1024
        a = (jnp.eye(n, dtype=jnp.float32) * 1.0000001).astype(jnp.bfloat16)
        b = (jnp.ones((n, n), jnp.float32) / n).astype(jnp.bfloat16)

        def fn(a, b):
            return lax.fori_loop(
                0, chain,
                lambda i, c: jnp.dot(a, c).astype(jnp.bfloat16), b,
            )

        jf = jax.jit(fn)
        force(jf(a, b))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(jf(a, b))
            ts.append(time.perf_counter() - t0)
        dt = max(min(ts) - rec["rtt_floor_ms"] * 1e-3, 1e-9)
        tflops = 2 * n**3 * chain / dt / 1e12
        rec["mxu_tflops_bf16"] = round(tflops, 2)
        rec["mxu_clock_ghz"] = round(tflops * 1e12 / (128 * 128 * 2) / 1e9,
                                     3)
    return rec
