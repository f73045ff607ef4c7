"""The wavefront path tracer (jnp oracle + production forward path).

TPU-native re-design of the reference's render kernel
(``GlobalFloat…/camera.h:78-172``): one CUDA thread per pixel with three
nested loops (samples x bounces x spheres) becomes

  lax.map over pixel *chunks*                (the Pallas/grid tile analog)
    lax.scan over samples                    (sequential, like camera.h:141)
      lax.scan over bounces, lane-masked     (the wavefront loop)
        (N_spheres, R_rays) batched hit test (intersect.hit_world)
        all-material predicated scatter      (materials.scatter)

Rays are identified by global pixel index; all randomness is counter-based
on (pixel, sample, bounce, draw) — so results are bit-identical under any
chunk size, any device count, and any sharding of the pixel axis.

Deviation from the reference, frozen by design (SURVEY.md §3.1 quirks):
  * The sky gradient uses the *current* bounce direction (the book's and the
    serial baseline's semantics). The CUDA variants accidentally use the
    primary camera ray (camera.h:121). Set ``legacy_sky=True`` to reproduce
    the reference quirk exactly.
  * The sky lerp runs in the working dtype (the reference promotes to
    double even in float builds, camera.h:122-123).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..models import materials
from ..models.camera import Camera, CameraConfig, initialize
from ..models.scene import Scene
from . import rng as rtrng
from . import vec
from .intersect import gather_hit_params, hit_world
from .vec import Vec3

DEFAULT_CHUNK_PIXELS = 8192

SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)


class RayState(NamedTuple):
    origin: Vec3
    direction: Vec3
    attenuation: Vec3
    radiance: Vec3
    alive: jnp.ndarray


def make_primary_rays(
    cam: Camera,
    pixel_ids: jnp.ndarray,   # (R,) uint32 global pixel index
    img_width: int,
    sample_idx: jnp.ndarray,  # scalar uint32
    key,
    dtype=jnp.float32,
):
    """Jittered, defocus-blurred camera rays (camera.h:141-155 "get_ray")."""
    i = (pixel_ids % jnp.uint32(img_width)).astype(dtype)
    j = (pixel_ids // jnp.uint32(img_width)).astype(dtype)
    return primary_rays_from_ij(cam, i, j, pixel_ids, sample_idx, key, dtype)


def primary_ray_draws(pixel_ids, sample_idx, key, dtype=jnp.float32):
    """The primary ray's detached RNG draws (pixel jitter u0/u1 +
    defocus-disk px/py), functions of (pixel, sample) only — bitwise
    the draws primary_rays_from_ij historically made inline, in the
    same order. Hoisted so the full-park render can PARK them (rows
    _R_CU0.._R_CPY) and the reverse's camera vjp can skip the Threefry
    + disk-mapping recompute (~half its op count)."""
    u0, u1 = rtrng.uniform2(key, pixel_ids, sample_idx, 0,
                            rtrng.DRAW_JITTER, dtype)
    px, py = rtrng.random_in_unit_disk(key, pixel_ids, sample_idx, dtype)
    return u0, u1, px, py


def primary_rays_from_ij(
    cam: Camera,
    i: jnp.ndarray,           # pixel column, float
    j: jnp.ndarray,           # pixel row, float
    pixel_ids: jnp.ndarray,   # uint32 global pixel index (RNG stream id)
    sample_idx: jnp.ndarray,  # scalar uint32
    key,
    dtype=jnp.float32,
    draws=None,
):
    """Ray construction from precomputed pixel coordinates.

    Split out so the Pallas kernel (which precomputes i/j on the host to
    avoid vector integer div/mod) shares this exact math with the oracle.
    ``draws``: optional precomputed primary_ray_draws (detached).
    """
    if draws is None:
        draws = primary_ray_draws(pixel_ids, sample_idx, key, dtype)
    u0, u1, px, py = draws
    off_x = u0 - 0.5
    off_y = u1 - 0.5

    pixel_sample = (
        cam.pixel00_loc
        + cam.pixel_delta_u * (i + off_x)
        + cam.pixel_delta_v * (j + off_y)
    )
    defocus_origin = cam.center + cam.defocus_disk_u * px + cam.defocus_disk_v * py
    center = Vec3(
        jnp.broadcast_to(cam.center.x, pixel_ids.shape),
        jnp.broadcast_to(cam.center.y, pixel_ids.shape),
        jnp.broadcast_to(cam.center.z, pixel_ids.shape),
    )
    origin = vec.where(cam.use_defocus, defocus_origin, center)
    direction = pixel_sample - origin
    return origin, direction


def _sky_color(direction: Vec3, dtype) -> Vec3:
    """Blue-to-white background gradient (camera.h:120-124)."""
    ud = vec.unit(direction)
    a = 0.5 * (ud.y + 1.0)
    white = Vec3.of(*SKY_WHITE, dtype=dtype)
    blue = Vec3.of(*SKY_BLUE, dtype=dtype)
    return vec.lerp(a, white, blue)


def shade_hit(scene: Scene, o: Vec3, d: Vec3, pixel_ids, sample_idx,
              bounce_u, key, dtype):
    """Shared jnp hit-shading prologue: closest hit -> hit point ->
    oriented normal (signed radius division, hittable.h:59-62 — negative
    radii flip the normal, the hollow-glass trick) -> RNG draws ->
    material scatter. Used by trace_sample; the Pallas kernels mirror the
    same math under the interpret-mode bit-exactness tests.
    Returns (hit, p, sc)."""
    hit, t, idx = hit_world(scene, o, d)
    hp = gather_hit_params(scene, idx)

    # Hit point & oriented normal (hittable.h:59-62, :21-26).
    t_safe = jnp.where(hit, t, 1.0)
    p = o + d * t_safe
    outward = (p - hp.center) / vec.safe_radius(hp.radius)
    front_face = vec.dot(d, outward) < 0.0
    normal = vec.where(front_face, outward, -outward)

    unit_rand = rtrng.random_unit_vector(
        key, pixel_ids, sample_idx, bounce_u, rtrng.DRAW_SCATTER, dtype
    )
    coin_u, _ = rtrng.uniform2(
        key, pixel_ids, sample_idx, bounce_u, rtrng.DRAW_COIN, dtype
    )
    sc = materials.scatter(
        d, normal, front_face,
        hp.mat_type, hp.albedo, hp.fuzz, hp.ior,
        unit_rand, coin_u,
    )
    return hit, p, sc


def trace_sample(
    scene: Scene,
    cam: Camera,
    pixel_ids: jnp.ndarray,
    img_width: int,
    sample_idx: jnp.ndarray,
    key,
    max_depth: int,
    dtype=jnp.float32,
    legacy_sky: bool = False,
    rr_start=None,
) -> Vec3:
    """Radiance for one Monte-Carlo sample of a flat batch of rays.

    The masked scan replaces ``ray_color``'s early-return bounce loop
    (camera.h:78-128): misses bank attenuation * sky and kill the lane;
    absorbed lanes (metal below surface) bank nothing; lanes alive at
    max_depth contribute black (camera.h:126-127).
    """
    R = pixel_ids.shape[0]
    origin, direction = make_primary_rays(
        cam, pixel_ids, img_width, sample_idx, key, dtype
    )
    primary_dir = direction

    state = RayState(
        origin=origin,
        direction=direction,
        attenuation=Vec3.full((R,), 1.0, 1.0, 1.0, dtype=dtype),
        radiance=Vec3.zeros((R,), dtype=dtype),
        alive=jnp.ones((R,), bool),
    )

    def bounce_body(s: RayState, bounce: jnp.ndarray) -> tuple:
        hit, p, sc = shade_hit(
            scene, s.origin, s.direction, pixel_ids, sample_idx,
            bounce, key, dtype,
        )

        # Miss => bank sky radiance and terminate lane.
        sky_dir = primary_dir if legacy_sky else s.direction
        sky = _sky_color(sky_dir, dtype)
        miss_now = s.alive & ~hit
        zero = Vec3.zeros((R,), dtype=dtype)
        radiance = s.radiance + vec.where(miss_now, s.attenuation * sky, zero)

        scattered_alive = s.alive & hit & sc.scattered
        atten_upd = s.attenuation * sc.attenuation
        if rr_start is not None:
            # Russian roulette (matches the pallas kernel's streams/math)
            p_surv = jnp.clip(
                jnp.maximum(jnp.maximum(atten_upd.x, atten_upd.y),
                            atten_upd.z),
                0.05, 1.0,
            )
            u_rr, _ = rtrng.uniform2(
                key, pixel_ids, sample_idx, bounce, rtrng.DRAW_RR, dtype
            )
            rr_zone = bounce.astype(dtype) >= float(rr_start)
            rr_kill = scattered_alive & rr_zone & (u_rr >= p_surv)
            scattered_alive = scattered_alive & ~rr_kill
            atten_upd = atten_upd * jnp.where(rr_zone, 1.0 / p_surv, 1.0)
        attenuation = vec.where(
            scattered_alive, atten_upd, s.attenuation
        )
        new_origin = vec.where(scattered_alive, p, s.origin)
        new_dir = vec.where(scattered_alive, sc.direction, s.direction)

        return (
            RayState(new_origin, new_dir, attenuation, radiance, scattered_alive),
            None,
        )

    bounces = jnp.arange(max_depth, dtype=jnp.uint32)
    final, _ = lax.scan(bounce_body, state, bounces)
    return final.radiance


def _linear_to_gamma(x: jnp.ndarray) -> jnp.ndarray:
    """gamma 2 (color.h:10-13). Double-where: sqrt's derivative is
    infinite at 0 and all-absorbed pixels accumulate exactly 0.0, so a
    bare sqrt(max(x, 0)) leaks inf into jax.grad (NaN hygiene); the
    subgradient at black is 0, matching make_diff_render's host chain.
    Primal values are bit-identical to sqrt(max(x, 0))."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def render(
    scene: Scene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = rtrng.DEFAULT_SEED,
    dtype=jnp.float32,
    chunk_pixels: Optional[int] = None,
    pixel_sharding=None,
    legacy_sky: bool = False,
    gamma: bool = True,
    remat: bool = False,
    sample_offset: int = 0,
    accumulate_only: bool = False,
    rr_start=None,
) -> jnp.ndarray:
    """Render the full image. Returns (H, W, 3) in the working dtype.

    Jit-friendly: all shape-determining args are static python ints. The
    pixel axis is processed in chunks of ``chunk_pixels`` rays (lax.map —
    the CUDA grid analog, main.cu:137-139); within a chunk samples
    accumulate sequentially (camera.h:141-161).

    ``pixel_sharding``: optional jax.sharding.Sharding for the *within-
    chunk* ray axis; chunks are scanned, rays inside a chunk are sharded,
    so every device traces an equal slice of each chunk. The RNG streams
    are bit-identical with or without sharding; pixel values agree to
    float-reassociation precision (<=1e-4, exact at PPM quantization).
    """
    rtrng.validate_stream_ids(sample_offset + samples_per_pixel,
                              max_depth)
    rr_start = rtrng.validate_rr_start(rr_start)
    key = rtrng.key_from_seed(seed)
    cam = initialize(cam_cfg, img_width, img_height)

    num_pixels = img_width * img_height
    chunk = chunk_pixels or min(DEFAULT_CHUNK_PIXELS, _round_up(num_pixels, 256))
    padded = _round_up(num_pixels, chunk)
    n_chunks = padded // chunk

    ids = jnp.arange(padded, dtype=jnp.uint32).reshape(n_chunks, chunk)
    if pixel_sharding is not None:
        ids = lax.with_sharding_constraint(ids, pixel_sharding)

    # sample_offset supports incremental refinement / checkpoint-resume:
    # sample ids are global counters, so rendering samples [0,k) now and
    # [k,n) later sums to exactly the [0,n) render (SURVEY.md §5
    # checkpoint/resume: accumulation is a sum over decorrelated streams).
    sample_ids = jnp.arange(
        sample_offset, sample_offset + samples_per_pixel, dtype=jnp.uint32
    )

    def chunk_fn(ids_chunk: jnp.ndarray) -> Vec3:
        def one_sample(s: jnp.ndarray) -> Vec3:
            return trace_sample(
                scene, cam, ids_chunk, img_width, s, key, max_depth,
                dtype=dtype, legacy_sky=legacy_sky, rr_start=rr_start,
            )

        if remat:
            # Trade FLOPs for memory on the backward pass: each sample's
            # bounce trace is recomputed instead of storing residuals for
            # samples x bounces x rays (jax.checkpoint / rematerialisation).
            one_sample = jax.checkpoint(one_sample)

        def sample_body(acc: Vec3, s: jnp.ndarray):
            return acc + one_sample(s), None

        acc0 = Vec3.zeros((chunk,), dtype=dtype)
        acc, _ = lax.scan(sample_body, acc0, sample_ids)
        return acc

    acc = lax.map(chunk_fn, ids)  # Vec3 of (n_chunks, chunk)

    img = acc.stack(axis=-1).reshape(padded, 3)[:num_pixels]
    if accumulate_only:
        # raw radiance sum over this sample range (for incremental renders)
        return img.reshape(img_height, img_width, 3)
    img = img * jnp.asarray(1.0 / samples_per_pixel, dtype)
    if gamma:
        img = _linear_to_gamma(img)
    return img.reshape(img_height, img_width, 3)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def make_render_fn(
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    **kw,
):
    """A jitted renderer closed over all static config."""
    f = functools.partial(
        render,
        img_width=img_width,
        img_height=img_height,
        samples_per_pixel=samples_per_pixel,
        max_depth=max_depth,
        **kw,
    )
    return jax.jit(lambda scene, cam_cfg: f(scene, cam_cfg))
