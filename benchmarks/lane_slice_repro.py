"""Minimal Mosaic repro: which lane-dim slicing construct kills the
compile service? (stream lane_group=128 500s; g0 compiles fine.)

Variants, each a tiny kernel compiled separately:
  a) value lane-slice at offset 128:    y = x[:, 128:256]
  b) scratch-ref lane-slice load/store: s[0:1, 128:256]
  c) pl.when-guarded ref lane-slice store (the real pattern)
  d) control: whole-row ops only
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

R = 512
G = 128


def run_case(name, kernel, n_scratch=0):
    scratch = [pltpu.VMEM((1, R), jnp.float32)] * n_scratch
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        scratch_shapes=scratch,
    )
    x = jnp.arange(R, dtype=jnp.float32).reshape(1, R)
    try:
        t0 = time.perf_counter()
        y = jax.block_until_ready(f(x))
        print(json.dumps({"case": name, "ok": True,
                          "s": round(time.perf_counter() - t0, 1),
                          "sum": float(y.sum())}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name, "ok": False,
                          "err": str(e)[:200]}), flush=True)


def k_value_slice(x_ref, o_ref):
    x = x_ref[0:1, :]
    parts = []
    for g in range(R // G):
        parts.append(x[:, g * G:(g + 1) * G] * (g + 1.0))
    o_ref[0:1, :] = jnp.concatenate(parts, axis=1)


def k_ref_slice(x_ref, o_ref, s_ref):
    s_ref[0:1, :] = x_ref[0:1, :]
    for g in range(R // G):
        sl = slice(g * G, (g + 1) * G)
        s_ref[0:1, sl] = s_ref[0:1, sl] * (g + 1.0)
    o_ref[0:1, :] = s_ref[0:1, :]


def k_when_ref_slice(x_ref, o_ref, s_ref):
    s_ref[0:1, :] = x_ref[0:1, :]
    for g in range(R // G):
        sl = slice(g * G, (g + 1) * G)
        cur = s_ref[0:1, sl]

        @pl.when(jnp.max(cur) > -1.0)
        def _(sl=sl, cur=cur):
            s_ref[0:1, sl] = cur * (g + 1.0)

    o_ref[0:1, :] = s_ref[0:1, :]


def k_control(x_ref, o_ref):
    o_ref[0:1, :] = x_ref[0:1, :] * 2.0


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    run_case("control", k_control)
    run_case("value_slice", k_value_slice)
    run_case("ref_slice", k_ref_slice, n_scratch=1)
    run_case("when_ref_slice", k_when_ref_slice, n_scratch=1)


def run_case2(name, kernel):
    """(128, R) scratch variant."""
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((128, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, R), jnp.float32),
                        pltpu.VMEM((1, R), jnp.float32)],
    )
    x = jnp.ones((128, R), jnp.float32)
    try:
        t0 = time.perf_counter()
        y = jax.block_until_ready(f(x))
        print(json.dumps({"case": name, "ok": True,
                          "s": round(time.perf_counter() - t0, 1),
                          "sum": float(y.sum())}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name, "ok": False,
                          "err": str(e)[:200]}), flush=True)


def k_mat_store(x_ref, o_ref, p_ref, t_ref):
    p_ref[:, :] = jnp.zeros((128, R), jnp.float32)
    t_ref[0:1, :] = jnp.full((1, R), 0.0, jnp.float32)
    blk = x_ref[:, :]                                 # (128, R)
    for g in range(R // G):
        sl = slice(g * G, (g + 1) * G)
        cur = t_ref[0:1, sl]

        @pl.when(jnp.max(cur) > -1.0)
        def _(g=g, sl=sl, cur=cur):
            one_hot = (blk[:, sl] > 0.5).astype(jnp.float32)  # (128, G)
            pb = jax.lax.dot_general(
                blk[:, 0:128], one_hot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # (R... (128, G)
            t_ref[0:1, sl] = cur + 1.0
            p_ref[:, sl] = jnp.where(cur > -1.0, pb, p_ref[:, sl])

    o_ref[0:1, :] = t_ref[0:1, :] + p_ref[0:1, :]


def k_mat_store_loop(x_ref, o_ref, p_ref, t_ref):
    from jax import lax

    p_ref[:, :] = jnp.zeros((128, R), jnp.float32)
    t_ref[0:1, :] = jnp.full((1, R), 0.0, jnp.float32)

    def body(b, c):
        blk = x_ref[:, :]
        for g in range(R // G):
            sl = slice(g * G, (g + 1) * G)
            cur = t_ref[0:1, sl]

            @pl.when(jnp.max(cur) < 100.0)
            def _(g=g, sl=sl, cur=cur):
                one_hot = (blk[:, sl] > 0.5).astype(jnp.float32)
                pb = jax.lax.dot_general(
                    blk[:, 0:128], one_hot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                t_ref[0:1, sl] = cur + 1.0
                p_ref[:, sl] = jnp.where(cur > -1.0, pb, p_ref[:, sl])

        return c

    lax.fori_loop(0, 4, body, jnp.int32(0))
    o_ref[0:1, :] = t_ref[0:1, :] + p_ref[0:1, :]


print("extended:", flush=True)
run_case2("mat_store", k_mat_store)
run_case2("mat_store_loop", k_mat_store_loop)
