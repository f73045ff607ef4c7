"""One process of a multi-host render: the per-host half of the
multi-host flow (launched by multihost_probe.py, one instance per host).

Exercises the PRODUCTION multi-host path end-to-end:
  parallel.mesh.maybe_initialize_distributed (env-driven jax.distributed)
  -> render_api.make_renderer over the global mesh (all hosts' devices)
  -> per-host part writes (utils.stitch.save_image_part)

The reference is single-GPU (main.cu:81); multi-host is the new TPU-native
capability (SURVEY.md §2.4 / §5 "distributed communication backend"). On a
real pod this same script shape runs one-per-host under the cluster's env;
here the launcher simulates two hosts with 4 virtual CPU devices each.

Env contract (set by the launcher BEFORE this process starts):
  JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID  (cluster)
  RT_VIRTUAL_DEVICES  (virtual CPU devices per process, e.g. 4)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Per-process virtual device count must be set before jax import. Strip
# any inherited device-count flag first (e.g. the test conftest's =8):
# a duplicate flag would fight over the per-process device count.
_nv = int(os.environ.get("RT_VIRTUAL_DEVICES", "0"))
if _nv:
    _flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
              if "xla_force_host_platform_device_count" not in f]
    _flags.append(f"--xla_force_host_platform_device_count={_nv}")
    os.environ["XLA_FLAGS"] = " ".join(_flags)
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if _nv:
    # the env's sitecustomize force-overrides JAX_PLATFORMS; the config
    # update after import wins (tests/conftest.py pattern)
    jax.config.update("jax_platforms", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_id", type=int, default=2)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--impl", default="oracle")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--grads", action="store_true",
                    help="also compute scene-parameter gradients over the "
                         "global mesh (the cross-host all-reduce path)")
    ap.add_argument("--train", action="store_true",
                    help="also run the FUSED Pallas train step "
                         "(mse_train_pallas, interpret) over the global "
                         "mesh — the shard_map psum path across hosts")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raytracingincuda_tpu.config import RenderConfig
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.models.scene import build_scene
    from raytracingincuda_tpu.parallel import mesh as meshlib
    from raytracingincuda_tpu.render_api import make_renderer
    from raytracingincuda_tpu.utils.stitch import save_image_part
    from raytracingincuda_tpu.utils.timing import force

    cfg = RenderConfig(
        scene_id=args.scene_id, width=args.width, height=args.height,
        samples=args.samples, bounces=args.bounces, impl=args.impl,
    )
    if args.impl == "pallas":
        # the PRODUCTION Pallas shard_map path over the multi-process
        # mesh (interpret mode on CPU — make_renderer would route CPU to
        # the oracle, so drive the kernel wrapper directly)
        import functools

        meshlib.maybe_initialize_distributed()
        from raytracingincuda_tpu.ops.pallas_kernel import render_pallas

        renderer = jax.jit(functools.partial(
            render_pallas, img_width=args.width, img_height=args.height,
            samples_per_pixel=args.samples, max_depth=args.bounces,
            mesh=meshlib.make_mesh(0),
            interpret=jax.default_backend() == "cpu",
        ))
    else:
        # make_renderer -> maybe_initialize_distributed (must precede any
        # backend use; nothing above touched a device)
        renderer = make_renderer(cfg, n_devices=0)
    pid = jax.process_index()
    nproc = jax.process_count()
    ndev = len(jax.devices())

    scene = build_scene(args.scene_id)
    cam = CameraConfig.reference_default()

    t0 = time.perf_counter()
    img = renderer(scene, cam)  # global (H, W, 3) over all hosts' devices
    force(img)
    render_ms = (time.perf_counter() - t0) * 1e3

    # Contiguous per-device flat pixel slices for the part files: reshard
    # the flat image over the global 1-D mesh (a cross-host collective —
    # exactly the transport the PPM gather would otherwise pay in full).
    n_pix = args.width * args.height
    mesh = meshlib.make_mesh(0)
    flat_sh = NamedSharding(mesh, P("dp", None))
    flat = jax.jit(lambda a: a.reshape(n_pix, 3), out_shardings=flat_sh)(img)

    parts = []
    for k, shard in enumerate(flat.addressable_shards):
        off = shard.index[0].start or 0
        path = os.path.join(args.outdir,
                            f"out.part_p{pid}_d{k}.npz")
        save_image_part(path, np.asarray(shard.data), off,
                        (args.height, args.width))
        parts.append({"path": path, "offset": int(off),
                      "rows": int(shard.data.shape[0])})

    status = {
        "process_id": pid, "process_count": nproc, "global_devices": ndev,
        "local_devices": len(jax.local_devices()),
        "backend": jax.default_backend(),
        "render_ms": round(render_ms, 2), "parts": parts,
    }

    if args.grads:
        # Scene-parameter gradients of a pixel MSE over the same global
        # mesh: scene params are replicated, so their cotangents are
        # all-reduced across hosts by GSPMD (the north-star psum path).
        from raytracingincuda_tpu.ops import grad as gradlib

        target = jnp.zeros((args.height, args.width, 3), jnp.float32)
        loss, (sgrads, _) = gradlib.render_grads(
            scene, cam, target, args.width, args.height,
            min(args.samples, 2), min(args.bounces, 4),
            pixel_sharding=meshlib.pixel_sharding(mesh),
        )
        gnorm = float(
            sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(sgrads))
        ) ** 0.5
        status["grads"] = {"loss": float(loss),
                           "scene_grad_norm": round(gnorm, 10)}

    if args.train:
        # The fused Pallas train step over the SAME multi-process mesh:
        # one shard_map program computes loss + image + scene/camera
        # cotangents, psum'd across all hosts' devices (interpret-mode
        # Mosaic on CPU). Every process must see bit-identical results
        # (same global program, replicated outputs).
        from raytracingincuda_tpu.ops.pallas_backward import (
            mse_train_pallas,
        )

        target = jnp.zeros((args.height, args.width, 3), jnp.float32)
        spp_t, d_t = min(args.samples, 2), min(args.bounces, 4)
        loss_t, _img_t, d_sm, d_cr = jax.jit(
            lambda s, c, t: mse_train_pallas(
                s, c, t, args.width, args.height, spp_t, d_t,
                mesh=meshlib.make_mesh(0), interpret=True,
            )
        )(scene, cam, target)
        status["train"] = {
            "loss": float(loss_t),
            "d_scene_norm": round(float(jnp.linalg.norm(d_sm)), 10),
            "d_cam_norm": round(float(jnp.linalg.norm(d_cr)), 10),
        }

    with open(os.path.join(args.outdir, f"status_p{pid}.json"), "w") as f:
        json.dump(status, f)
    print(json.dumps(status), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
