"""Compacted-wavefront renderer (forward/production path).

The reference's megakernel traces each pixel's sample to completion in one
thread; its own ncu profile shows the cost is divergence, not bandwidth
(SURVEY.md §5). The classic wavefront answer (see PAPERS.md, "Megakernel
vs Wavefront GPU Path Tracing") separates bounce *waves* and compacts the
ray pool between waves, so wave k only pays for rays still alive at depth
k — on the cover scene the survival curve drops ~50%/bounce, so total
intersection work is ~2.2x R instead of max_depth x R.

Design (all-XLA; the per-wave math reuses the oracle's components):
  * a chunk of rays = (pixel-subset x all samples) flattened into one pool;
    every ray carries its pixel id — the counter-based RNG (ops/rng.py)
    makes results bit-identical to the depth-scan oracle regardless of
    pool order or chunk shape;
  * per wave: one batched hit+scatter (ops/intersect + models/materials),
    radiance banked on miss, then a cumsum-based stable partition moves
    live rays to the pool prefix;
  * the next wave processes only a prefix bucket: a lax.switch over a
    static ladder of sizes (R, R/2, R/4, ..., R_MIN) picked from the live
    count — shapes stay static for XLA while work tracks survival;
  * final radiance lands in the image by a segment-sum over pixel ids.

Gradients: this path is forward-only (while_loop + scatter-add); the
differentiable path is ops/tracer.render (scan) or the custom-VJP pairing
in ops/pallas_kernel.make_diff_render.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..models.camera import CameraConfig, initialize
from ..models.scene import Scene
from . import rng as rtrng
from . import vec
from .tracer import (
    _linear_to_gamma,
    _sky_color,
    make_primary_rays,
    shade_hit,
)
from .vec import Vec3

# Smallest prefix bucket: below this, partition overhead beats the savings.
MIN_BUCKET = 2048


class Pool(NamedTuple):
    """Ray pool state (R,) arrays; live rays occupy the prefix."""

    pixel: jnp.ndarray        # uint32 pixel id (RNG stream + output slot)
    sample: jnp.ndarray       # uint32 sample id (RNG stream)
    o: Vec3
    d: Vec3
    atten: Vec3
    rad: Vec3                 # radiance banked so far (accumulated at death)
    alive: jnp.ndarray        # f32 mask 1.0/0.0


def _bounce_wave(scene: Scene, pool: Pool, bounce, key, dtype,
                 legacy_sky: bool, primary_d: Optional[Vec3]) -> Pool:
    """One bounce for every pooled ray (lane-masked); same math as
    tracer.trace_sample's bounce_body."""
    alive = pool.alive > 0.5
    b_u = jnp.asarray(bounce, jnp.uint32)
    hit, p, sc = shade_hit(
        scene, pool.o, pool.d, pool.pixel, pool.sample, b_u, key, dtype
    )

    sky_src = primary_d if legacy_sky else pool.d
    sky = _sky_color(sky_src, dtype)
    miss_now = alive & ~hit
    zero = Vec3.zeros(pool.rad.shape, dtype=dtype)
    rad = pool.rad + vec.where(miss_now, pool.atten * sky, zero)

    scattered_alive = alive & hit & sc.scattered
    return Pool(
        pixel=pool.pixel,
        sample=pool.sample,
        o=vec.where(scattered_alive, p, pool.o),
        d=vec.where(scattered_alive, sc.direction, pool.d),
        atten=vec.where(scattered_alive, pool.atten * sc.attenuation,
                        pool.atten),
        rad=rad,
        alive=jnp.where(scattered_alive, 1.0, 0.0).astype(dtype),
    )


def _partition_live_prefix(pool: Pool) -> Pool:
    """Stable partition: live rays to the prefix (cumsum + one gather).

    Dead rays keep their banked radiance and ride along in the suffix —
    they are never traced again (their lanes fall outside the processed
    bucket) but still contribute at the final segment-sum.
    """
    alive = pool.alive > 0.5
    n = pool.alive.shape[0]
    alive_i = alive.astype(jnp.int32)
    n_alive = jnp.sum(alive_i)
    pos_alive = jnp.cumsum(alive_i) - 1
    pos_dead = n_alive + jnp.cumsum(1 - alive_i) - 1
    dest = jnp.where(alive, pos_alive, pos_dead)
    perm = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    take = lambda a: jnp.take(a, perm, axis=0)
    return jax.tree_util.tree_map(take, pool)


def _bucket_sizes(r: int):
    sizes = []
    s = r
    while s > MIN_BUCKET:
        sizes.append(s)
        s //= 2
    sizes.append(max(s, min(r, MIN_BUCKET)))
    return sizes  # descending, last is the floor


def _wave_on_prefix(scene, pool: Pool, size: int, bounce, key, dtype,
                    legacy_sky) -> Pool:
    """Trace one wave on the first ``size`` pool slots only."""
    sl = lambda a: lax.dynamic_slice_in_dim(a, 0, size, axis=0)
    sub = jax.tree_util.tree_map(sl, pool)
    sub = _bounce_wave(scene, sub, bounce, key, dtype, legacy_sky, None)
    upd = lambda full, part: lax.dynamic_update_slice_in_dim(
        full, part, 0, axis=0
    )
    return jax.tree_util.tree_map(upd, pool, sub)


def render_wavefront(
    scene: Scene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    dtype=jnp.float32,
    pool_rays: int = 1 << 17,
    pixel_sharding=None,
    legacy_sky: bool = False,
    gamma: bool = True,
) -> jnp.ndarray:
    """Compacted-wavefront render; semantics and RNG identical to
    tracer.render (bit-equal streams; values equal up to reassociation).

    ``legacy_sky`` falls back to the oracle (it needs the primary ray kept
    per pooled ray; not worth carrying for a quirk-compat mode).
    """
    if legacy_sky:
        from . import tracer as _tracer

        return _tracer.render(
            scene, cam_cfg, img_width, img_height, samples_per_pixel,
            max_depth, seed=seed, dtype=dtype, legacy_sky=True, gamma=gamma,
            pixel_sharding=None,
        )

    key = rtrng.key_from_seed(seed)
    cam = initialize(cam_cfg, img_width, img_height)
    num_pixels = img_width * img_height

    # Choose pixels-per-chunk so the pool holds all samples of a chunk.
    px_chunk = max(1, pool_rays // samples_per_pixel)
    px_chunk = min(px_chunk, num_pixels)
    r = px_chunk * samples_per_pixel
    padded_px = _round_up(num_pixels, px_chunk)
    n_chunks = padded_px // px_chunk

    sizes = _bucket_sizes(r)

    def chunk_fn(pixel_base: jnp.ndarray) -> jnp.ndarray:
        pix = pixel_base[:, None] + jnp.zeros(
            (1, samples_per_pixel), jnp.uint32
        )
        smp = jnp.broadcast_to(
            jnp.arange(samples_per_pixel, dtype=jnp.uint32)[None, :],
            pix.shape,
        )
        pix = pix.reshape(r)
        smp = smp.reshape(r)

        o, d = make_primary_rays(cam, pix, img_width, smp, key, dtype)
        pool = Pool(
            pixel=pix, sample=smp, o=o, d=d,
            atten=Vec3.full((r,), 1.0, 1.0, 1.0, dtype=dtype),
            rad=Vec3.zeros((r,), dtype=dtype),
            alive=jnp.ones((r,), dtype),
        )

        def cond(state):
            b, pool, n_alive = state
            return (b < max_depth) & (n_alive > 0)

        sizes_arr = jnp.asarray(sizes, jnp.int32)  # descending ladder

        def body(state):
            b, pool, n_alive = state
            # smallest ladder size covering the live prefix: sizes are
            # descending, so it's the last index with size >= n_alive
            covering = jnp.maximum(
                jnp.sum((sizes_arr >= n_alive).astype(jnp.int32)) - 1, 0
            )
            pool = lax.switch(
                covering,
                [
                    (lambda s: lambda pl: _wave_on_prefix(
                        scene, pl, s, b, key, dtype, False
                    ))(s)
                    for s in sizes
                ],
                pool,
            )
            pool = _partition_live_prefix(pool)
            n_alive = jnp.sum(pool.alive > 0.5)
            return b + 1, pool, n_alive

        init = (jnp.int32(0), pool, jnp.int32(r))
        _, pool, _ = lax.while_loop(cond, body, init)

        # Segment-sum radiance back to this chunk's pixels.
        local = (pool.pixel - pixel_base[0]).astype(jnp.int32)
        img = jnp.zeros((px_chunk, 3), dtype)
        rgb = jnp.stack([pool.rad.x, pool.rad.y, pool.rad.z], axis=-1)
        img = img.at[local].add(rgb)
        return img

    bases = (
        jnp.arange(padded_px, dtype=jnp.uint32)
        .reshape(n_chunks, px_chunk)
    )
    out = lax.map(chunk_fn, bases)                    # (n_chunks, px_chunk, 3)

    scale = jnp.asarray(1.0 / samples_per_pixel, dtype)
    img = out.reshape(padded_px, 3)[:num_pixels] * scale
    if gamma:
        img = _linear_to_gamma(img)
    return img.reshape(img_height, img_width, 3)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
