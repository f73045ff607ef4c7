"""Incremental rendering with checkpoint/resume.

The reference has nothing resumable — every run overwrites its PPM
(SURVEY.md §5). Here the Monte-Carlo accumulator is a pure sum over
counter-keyed sample streams, so progressive refinement is exact: render
samples [0,k), checkpoint the raw radiance sum, resume with samples [k,n),
and the result is bit-equivalent (up to summation order) to a single
[0,n) render.

Checkpoint format: .npz with the linear radiance sum, samples-done count,
and the identifying config; resuming validates the config hash so a
checkpoint can't silently continue a different render.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.camera import CameraConfig
from ..models.scene import Scene
from ..ops import tracer
from ..ops.tracer import _linear_to_gamma


def _config_token(cfg: RenderConfig) -> str:
    d = dataclasses.asdict(cfg)
    d.pop("chunk_pixels", None)  # execution detail, not identity
    d.pop("impl", None)          # oracle/pallas accumulate identically
    return json.dumps(d, sort_keys=True)


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' to extension-less paths but np.load does
    not — normalize once so save and resume agree on the filename."""
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, acc: np.ndarray, samples_done: int,
                    cfg: RenderConfig) -> None:
    path = _npz_path(path)
    # atomic: a kill mid-save (OOM/preemption — the events checkpointing
    # exists for) must not corrupt the only checkpoint
    tmp = path + ".tmp.npz"
    np.savez(
        tmp, acc=np.asarray(acc, np.float32),
        samples_done=np.int64(samples_done),
        config=np.frombuffer(_config_token(cfg).encode(), np.uint8),
    )
    os.replace(tmp, path)


def load_checkpoint(path: str, cfg: RenderConfig) -> Tuple[np.ndarray, int]:
    z = np.load(_npz_path(path))
    token = bytes(z["config"]).decode()
    if token != _config_token(cfg):
        raise ValueError(
            f"checkpoint {path} belongs to a different render config:\n"
            f"  checkpoint: {token}\n  requested:  {_config_token(cfg)}"
        )
    return z["acc"], int(z["samples_done"])


def render_incremental(
    scene: Scene,
    cam_cfg: CameraConfig,
    cfg: RenderConfig,
    *,
    checkpoint_path: Optional[str] = None,
    samples_per_round: Optional[int] = None,
    resume: bool = True,
) -> np.ndarray:
    """Render cfg.samples samples in rounds, checkpointing after each.

    Returns the finished gamma-encoded image. If ``checkpoint_path`` holds
    a partial accumulator for the same config (and resume=True), rendering
    continues from there.
    """
    acc = np.zeros((cfg.height, cfg.width, 3), np.float32)
    done = 0
    if checkpoint_path and resume:
        try:
            acc, done = load_checkpoint(checkpoint_path, cfg)
        except FileNotFoundError:
            pass

    rounds = samples_per_round or cfg.samples
    while done < cfg.samples:
        n = min(rounds, cfg.samples - done)
        part = tracer.render(
            scene, cam_cfg, cfg.width, cfg.height, n, cfg.bounces,
            seed=cfg.seed, dtype=cfg.jnp_dtype,
            chunk_pixels=cfg.chunk_pixels, legacy_sky=cfg.legacy_sky,
            rr_start=cfg.rr_start,
            sample_offset=done, accumulate_only=True,
        )
        acc = acc + np.asarray(part, np.float32)
        done += n
        if checkpoint_path:
            save_checkpoint(checkpoint_path, acc, done, cfg)

    img = acc / float(cfg.samples)
    return np.asarray(_linear_to_gamma(jnp.asarray(img)))


def save_train_state(path: str, state, token: str = "") -> None:
    """Checkpoint an inverse-rendering TrainState (or any pytree of
    arrays: params + optimizer state + step) to one .npz, atomically.

    ``token``: an identifying string (training config, scene hash, …)
    validated on load — the same guard the render checkpoint uses so a
    checkpoint can't silently continue a different run. Restore with
    :func:`load_train_state` against a template built by the SAME
    ``init_fn`` (the treedef lives in code; the file stores leaves)."""
    import jax

    path = _npz_path(path)
    leaves = jax.tree_util.tree_leaves(state)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        token=np.frombuffer(token.encode(), np.uint8),
        n_leaves=np.int64(len(leaves)),
        **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)},
    )
    os.replace(tmp, path)


def load_train_state(path: str, template, token: str = ""):
    """Restore a pytree saved by :func:`save_train_state`.

    ``template``: a structurally identical pytree (e.g. a fresh
    ``init_fn(params)`` result) supplying the treedef and leaf dtypes;
    leaf values are replaced by the checkpoint's, bit-exactly."""
    import jax

    z = np.load(_npz_path(path))
    saved = bytes(z["token"]).decode()
    if saved != token:
        raise ValueError(
            f"train checkpoint {path} belongs to a different run:\n"
            f"  checkpoint: {saved!r}\n  requested:  {token!r}"
        )
    tleaves, treedef = jax.tree_util.tree_flatten(template)
    n = int(z["n_leaves"])
    if n != len(tleaves):
        raise ValueError(
            f"train checkpoint {path} has {n} leaves; the template has "
            f"{len(tleaves)} — built by a different init_fn/optimizer?"
        )
    leaves = []
    for i, t in enumerate(tleaves):
        v = z[f"leaf_{i}"]
        if v.shape != np.shape(t):
            raise ValueError(
                f"leaf {i}: checkpoint shape {v.shape} != template "
                f"shape {np.shape(t)}"
            )
        leaves.append(jnp.asarray(v, dtype=getattr(t, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
