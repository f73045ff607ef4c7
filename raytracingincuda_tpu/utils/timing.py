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
