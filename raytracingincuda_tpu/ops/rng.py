"""Counter-based (Threefry-2x32) RNG for the wavefront tracer.

The reference keeps one mutable ``curandState`` (XORWOW) per pixel, seeded
``curand_init(1227, pixel_index, 0, ...)`` (``rtweekend.h:43-50``) and
threads it through every sample/bounce.  Mutable per-lane state is exactly
what a TPU (and a functional, shardable program) does not want, so we
replace it with a *stateless* Threefry-2x32 stream: every random draw is a
pure function

    u = threefry(key(seed), counter(pixel, sample, bounce, draw))

This gives the same guarantees the reference relies on — fixed seed =>
bit-deterministic renders per config (SURVEY.md §3.5) — plus two it cannot
offer: the render is *bit-identical under any sharding / chunking* of the
pixel or sample axes (the counter encodes global ids, not device-local
state), and the same code runs in the jnp oracle and inside Pallas kernels,
so kernel-vs-oracle tests compare bit-equal random streams.

Threefry-2x32 (20 rounds) follows the Random123 specification
(Salmon et al., SC'11) — the same generator JAX's core PRNG uses.

Counter layout (uint32 words):
  c0 = ray id (global pixel index; 32 bits, images up to 4G pixels)
  c1 = (sample << 11) | (bounce << 3) | draw
       sample < 2^21, bounce < 256, draw < 8

Distribution notes vs the reference (documented deviations, SURVEY.md §7):
  * unit sphere vectors use the exact inversion method (z = 1-2u,
    phi = 2*pi*u) instead of cube rejection (``vec3.h:117-127``) — the
    *distribution* is identical (uniform on S^2) but rejection loops do not
    vectorize on a TPU.
  * unit disk points use r = sqrt(u), theta = 2*pi*u instead of rejection
    (``vec3.h:109-115``) — again the same distribution.
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .vec import Vec3

# Default seed: matches the reference's curand seed (rtweekend.h:46).
DEFAULT_SEED = 1227

# Draw ids (the `draw` field of c1). Camera draws use the bounce=0 slots
# 4..7 so they never collide with per-bounce scatter draws 0..3.
DRAW_SCATTER = 0      # unit-vector draw shared by lambertian/metal
DRAW_COIN = 1         # dielectric reflect/refract coin
DRAW_RR = 2           # Russian-roulette survival coin (optional estimator)
DRAW_JITTER = 4       # pixel-square antialiasing jitter (2 uniforms)
DRAW_DEFOCUS = 5      # defocus disk sample (2 uniforms)

_SAMPLE_SHIFT = 11
_BOUNCE_SHIFT = 3

# numpy (not jnp) scalar: a module-level jnp array would be a captured
# constant inside Pallas kernels, which pallas_call rejects.
_KS_PARITY = np.uint32(0x1BD11BDA)
_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    r = jnp.uint32(r)
    return (x << r) | (x >> (jnp.uint32(32) - r))


def threefry2x32(
    k0: jnp.ndarray, k1: jnp.ndarray, c0: jnp.ndarray, c1: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """20-round Threefry-2x32 block cipher: (key, counter) -> 2 uint32 words.

    Pure elementwise uint32 arithmetic — runs on VPU lanes and inside
    Pallas. All arguments broadcast together.
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1
    ks = (k0, k1, k0 ^ k1 ^ _KS_PARITY)

    for group in range(5):
        rots = _ROT_A if group % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        i = group + 1
        x0 = x0 + ks[i % 3]
        x1 = x1 + ks[(i + 1) % 3] + jnp.uint32(i)
    return x0, x1


def key_from_seed(seed: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Derive a 2x32 key from a python int seed (64 bits used)."""
    seed = int(seed)
    return (
        jnp.uint32(seed & 0xFFFFFFFF),
        jnp.uint32((seed >> 32) & 0xFFFFFFFF),
    )


def make_counter(sample, bounce, draw) -> jnp.ndarray:
    """Pack (sample, bounce, draw) into the c1 counter word."""
    sample = jnp.asarray(sample, jnp.uint32)
    bounce = jnp.asarray(bounce, jnp.uint32)
    draw = jnp.asarray(draw, jnp.uint32)
    return (sample << _SAMPLE_SHIFT) | (bounce << _BOUNCE_SHIFT) | draw


def _bits_to_unit_float(bits: jnp.ndarray, dtype) -> jnp.ndarray:
    """uint32 -> float in [0, 1).

    f32: standard mantissa-fill trick ((bits>>9)|one) - 1 gives 23 random
    mantissa bits. For f64 we keep the same 23-bit resolution (parity with
    the f32 stream; the reference's double variant similarly just widens
    arithmetic, curand_uniform_double draws a wider mantissa but the
    *stream positions* match).
    """
    f = (
        jnp.asarray(bits >> jnp.uint32(9), jnp.uint32) | jnp.uint32(0x3F800000)
    ).view(jnp.float32) - jnp.float32(1.0)
    return f.astype(dtype)


def uniform2(key, ray_id, sample, bounce, draw, dtype=jnp.float32):
    """Two independent uniforms in [0,1) per lane for one (bounce, draw) slot."""
    b0, b1 = threefry2x32(key[0], key[1], ray_id, make_counter(sample, bounce, draw))
    return _bits_to_unit_float(b0, dtype), _bits_to_unit_float(b1, dtype)


def random_unit_vector(key, ray_id, sample, bounce, draw, dtype=jnp.float32) -> Vec3:
    """Uniform direction on S^2 via inversion (replaces vec3.h:117-127)."""
    u0, u1 = uniform2(key, ray_id, sample, bounce, draw, dtype)
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = (2.0 * math.pi) * u1
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def random_in_unit_disk(key, ray_id, sample, dtype=jnp.float32):
    """Uniform point in the unit disk via inversion (replaces vec3.h:109-115)."""
    u0, u1 = uniform2(key, ray_id, sample, 0, DRAW_DEFOCUS, dtype)
    r = jnp.sqrt(u0)
    theta = (2.0 * math.pi) * u1
    return r * jnp.cos(theta), r * jnp.sin(theta)


# counter field capacities (the packing above): exceeding them would
# silently alias adjacent fields — e.g. bounce 256 == (sample+1, bounce 0)
# — correlating streams with no error. Render wrappers validate at entry.
MAX_SAMPLE_ID = 1 << 21
MAX_BOUNCE = 1 << (_SAMPLE_SHIFT - _BOUNCE_SHIFT)


def validate_stream_ids(max_sample_id_exclusive: int,
                        max_depth: int) -> None:
    """Host-side check that (sample, bounce) ids fit their counter
    fields (sample < 2^21, bounce < 256)."""
    if max_sample_id_exclusive > MAX_SAMPLE_ID:
        raise ValueError(
            f"sample ids up to {max_sample_id_exclusive} exceed the "
            f"counter field ({MAX_SAMPLE_ID}); streams would alias "
            "(sample_offset + samples_per_pixel must fit 21 bits)"
        )
    if max_depth > MAX_BOUNCE:
        raise ValueError(
            f"max_depth {max_depth} exceeds the bounce counter field "
            f"({MAX_BOUNCE}); bounce streams would alias the next sample"
        )


def validate_rr_start(rr_start):
    """Host-side check that ``rr_start`` is a non-negative integer (or
    None); returns it as a python int. Forward kernels/oracle test the
    RR zone as ``bounce_f >= float(rr_start)`` while the backward
    kernels replay it in the integer domain (``b_u >= uint32(rr_start)``
    — Mosaic cannot lower uint32->f32 casts); a non-integer rr_start
    would make the two disagree by one bounce and silently desync the
    bitwise stream replay. Integer bounces decide identically in both
    domains, so requiring an int here makes every path agree."""
    if rr_start is None:
        return None
    r = int(rr_start)
    if r != rr_start or r < 0:
        raise ValueError(
            f"rr_start must be a non-negative integer (got {rr_start!r}):"
            " the backward kernels replay the RR zone test in the integer"
            " domain and a fractional rr_start would desync the forward's"
            " float-domain test by one bounce"
        )
    return r
