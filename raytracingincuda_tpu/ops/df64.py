"""Double-float ("df64") arithmetic: ~49-bit-mantissa reals from f32 pairs.

TPU has no fp64 hardware at all, yet the reference publishes full
double-precision render variants as first-class benchmark axes
(``GlobalDouble…/rtweekend.h:32-40``, 40 270 ms at its headline — its
consumer GPU runs fp64 at 1:64 rate). The TPU-native answer is the classic
double-word representation: every value is an unevaluated sum ``hi + lo``
of two f32 with ``|lo| <= ulp(hi)/2``, giving 2x24-1 = 47-49 significand
bits — between f32's 24 and f64's 53 — entirely out of f32 VPU ops.

Algorithms are the error-free transformations of Dekker (1971) and Knuth
(TAOCP v2), in their NO-FMA forms (Mosaic exposes no fused
multiply-add with guaranteed single rounding): ``two_sum`` (6 flops),
Veltkamp splitting + ``two_prod`` (17 flops), and the double-word
add/mul/div/sqrt compositions from Hida-Li-Bailey's QD library design.
Everything here is pure jnp on same-shaped arrays, so the SAME functions
run in the jnp oracle (tracer parity path) and inside Pallas kernels
(ops/pallas_df64.py) — which is what makes interpret-mode bit-exactness
between the two achievable, exactly like the f32 pair
(ops/tracer.py <-> ops/pallas_kernel.py).

Gradient support is deliberately out of scope: the reference's double
variants are forward render configs for precision comparison (README
"Precision: the fp64 axis"); the differentiable paths stay f32.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp
import numpy as np
from jax import lax

# Veltkamp split constant for f32: 2^ceil(24/2) + 1. Splits a 24-bit
# significand into two 12-bit halves whose products are exact in f32.
# numpy (not jnp) scalar: a module-level jnp array would be a captured
# constant inside Pallas kernels, which pallas_call rejects (same rule
# as ops/rng.py's _KS_PARITY).
_SPLIT = np.float32(4097.0)


class D(NamedTuple):
    """A double-float array: value = hi + lo (unevaluated, normalized)."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return jnp.shape(self.hi)


Like = Union[D, jnp.ndarray, float]


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, jnp.float32)


def of(x: Like) -> D:
    """Promote an f32 array / python float to df64 (lo = 0)."""
    if isinstance(x, D):
        return x
    return D(_f32(x), jnp.zeros_like(_f32(x)))


def const(x: float, shape=()) -> D:
    """A df64 constant from a python float, split exactly via numpy f64.

    The hi part is round-to-nearest f32(x); lo carries the remainder, so
    e.g. 0.1 or 1/3 enter df64 with ~49 correct bits, not 24."""
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return D(jnp.full(shape, hi, jnp.float32), jnp.full(shape, lo, jnp.float32))


def from_f64(x) -> D:
    """Split a numpy float64 array into (hi, lo) f32 parts (host side)."""
    x64 = np.asarray(x, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return D(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(x: D) -> np.ndarray:
    """Host-side exact reconstruction (f64 holds hi+lo exactly)."""
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


# -- error-free transformations (f32 in, exact pair out) -------------------
#
# EFT algebra is only correct if every operand is a ROUNDED f32 value.
# XLA's CPU backend breaks that silently: when a product feeds a
# subtract/add inside one fusion, LLVM contracts it to an FMA — the
# consumer then sees the EXACT product instead of the rounded one, and
# e.g. quick_two_sum's `b - (s - a)` returns garbage at ulp scale
# (measured: a 2^-47-accurate pipeline degraded to ~1e-5 image error;
# optimization_barrier does NOT survive the CPU pipeline). The fix is
# `lax.reduce_precision(x, 8, 23)` — an identity VALUE for f32 that the
# compiler must treat as a real rounding op, pinning x to its rounded
# bits. TPU XLA and Mosaic were measured to preserve EFTs even without
# it (no f32 FMA contraction), and _rnd is value-identity there, so
# interpret(CPU) and Mosaic(TPU) still agree.


# Mosaic cannot lower reduce_precision ("Unimplemented primitive"), and
# measurably does not need it (no f32 FMA contraction: the EFT micro-
# probe is bit-exact in a TPU kernel without laundering). Kernel bodies
# disable laundering for the duration of their trace; _rnd is value-
# identity, so interpret (CPU, laundered) and Mosaic (TPU, bare) compute
# the same reals.
_TRUST_ROUNDING = False


class trusted_rounding:
    """Context manager: skip _rnd while tracing a Mosaic kernel body."""

    def __enter__(self):
        global _TRUST_ROUNDING
        self._saved = _TRUST_ROUNDING
        _TRUST_ROUNDING = True

    def __exit__(self, *exc):
        global _TRUST_ROUNDING
        _TRUST_ROUNDING = self._saved
        return False


def _rnd(x):
    """Pin x to its rounded-f32 value (blocks FMA contraction; identity)."""
    if _TRUST_ROUNDING:
        return x
    return lax.reduce_precision(x, exponent_bits=8, mantissa_bits=23)


def two_sum(a, b):
    """a + b = s + err exactly, any magnitudes (Knuth, 6 flops)."""
    a, b = _rnd(a), _rnd(b)
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """a + b = s + err exactly, REQUIRES |a| >= |b| (Dekker, 3 flops)."""
    a, b = _rnd(a), _rnd(b)
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Veltkamp: a = a_hi + a_lo with 12-bit halves (exact products)."""
    a = _rnd(a)
    t = _rnd(_SPLIT * a)
    a_hi = t - (t - a)
    return a_hi, a - a_hi


def two_prod(a, b):
    """a * b = p + err exactly (Dekker two-product, no FMA; 17 flops).

    The inner error products are left un-laundered: contracting
    `a_hi*b_hi - p` to an FMA computes that difference MORE exactly, and
    ulp-level shifts in the other error terms move `err` by O(err*u) —
    below the representation's 2^-47, harmless."""
    a, b = _rnd(a), _rnd(b)
    p = _rnd(a * b)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


# -- double-word arithmetic --------------------------------------------------

def add(x: Like, y: Like) -> D:
    """df64 + df64 (accurate variant, ~20 flops)."""
    x, y = of(x), of(y)
    s_hi, s_lo = two_sum(x.hi, y.hi)
    t_hi, t_lo = two_sum(x.lo, y.lo)
    s_lo = s_lo + t_hi
    s_hi, s_lo = quick_two_sum(s_hi, s_lo)
    s_lo = s_lo + t_lo
    return D(*quick_two_sum(s_hi, s_lo))


def neg(x: Like) -> D:
    x = of(x)
    return D(-x.hi, -x.lo)


def sub(x: Like, y: Like) -> D:
    return add(x, neg(y))


def mul(x: Like, y: Like) -> D:
    """df64 * df64 (~28 flops)."""
    x, y = of(x), of(y)
    p_hi, p_lo = two_prod(x.hi, y.hi)
    p_lo = p_lo + (x.hi * y.lo + x.lo * y.hi)
    return D(*quick_two_sum(p_hi, p_lo))


def div(x: Like, y: Like) -> D:
    """df64 / df64: long division with two corrections (~3 f32 divides)."""
    x, y = of(x), of(y)
    q1 = x.hi / y.hi
    r = sub(x, mul(y, q1))
    q2 = r.hi / y.hi
    r = sub(r, mul(y, q2))
    q3 = r.hi / y.hi
    q_hi, q_lo = quick_two_sum(q1, q2)
    return add(D(q_hi, q_lo), q3)


def sqrt(x: Like) -> D:
    """df64 sqrt via Karp's trick from an f32 seed + one refinement.

    Domain: x >= 0 (callers guard). x == 0 returns exactly 0 (the seed
    path divides by sqrt(x.hi) guarded below)."""
    x = of(x)
    pos = x.hi > 0.0
    hi_safe = jnp.where(pos, x.hi, 1.0)
    s = jnp.sqrt(hi_safe)                       # 24-bit approximation
    inv2s = 0.5 / s
    # e = x - s^2 exactly; correction e * (1 / (2 s))
    s2_hi, s2_lo = two_prod(s, s)
    e = sub(x, D(s2_hi, s2_lo))
    r = add(D(s, jnp.zeros_like(s)), e.hi * inv2s)
    # one more Newton-style correction for full df64 accuracy
    r2 = mul(r, r)
    e2 = sub(x, r2)
    r = add(r, e2.hi * inv2s)
    return D(jnp.where(pos, r.hi, 0.0), jnp.where(pos, r.lo, 0.0))


# -- comparisons / selection (normalized representation assumed) -----------

def lt(x: Like, y: Like) -> jnp.ndarray:
    x, y = of(x), of(y)
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def gt(x: Like, y: Like) -> jnp.ndarray:
    return lt(y, x)


def le(x: Like, y: Like) -> jnp.ndarray:
    return ~gt(x, y)

def eq(x: Like, y: Like) -> jnp.ndarray:
    x, y = of(x), of(y)
    return (x.hi == y.hi) & (x.lo == y.lo)


def where(mask: jnp.ndarray, a: Like, b: Like) -> D:
    a, b = of(a), of(b)
    return D(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def minimum(x: Like, y: Like) -> D:
    return where(lt(x, y), x, y)


def maximum(x: Like, y: Like) -> D:
    return where(lt(x, y), y, x)


def min_axis0(x: D) -> D:
    """Min over axis 0 (the sphere/sublane axis), keepdims.

    hi decides; exact hi ties are broken by the min lo among them —
    correct for normalized pairs (sign of lo orders equal-hi values)."""
    m_hi = jnp.min(x.hi, axis=0, keepdims=True)
    big = jnp.full_like(x.lo, np.float32(np.inf))
    m_lo = jnp.min(jnp.where(x.hi == m_hi, x.lo, big), axis=0,
                   keepdims=True)
    return D(m_hi, m_lo)


# -- df64 3-vectors (SoA of D, mirroring ops/vec.py) ------------------------

class D3(NamedTuple):
    x: D
    y: D
    z: D

    def __add__(self, o: "D3") -> "D3":
        return D3(add(self.x, o.x), add(self.y, o.y), add(self.z, o.z))

    def __sub__(self, o: "D3") -> "D3":
        return D3(sub(self.x, o.x), sub(self.y, o.y), sub(self.z, o.z))

    def __neg__(self) -> "D3":
        return D3(neg(self.x), neg(self.y), neg(self.z))

    def scale(self, t: Like) -> "D3":
        return D3(mul(self.x, t), mul(self.y, t), mul(self.z, t))

    def hadamard(self, o: "D3") -> "D3":
        return D3(mul(self.x, o.x), mul(self.y, o.y), mul(self.z, o.z))


def d3_of(v) -> D3:
    """Promote a Vec3 of f32 arrays (or of D) to D3."""
    return D3(of(v.x), of(v.y), of(v.z))


def d3_where(mask: jnp.ndarray, a: D3, b: D3) -> D3:
    return D3(where(mask, a.x, b.x), where(mask, a.y, b.y),
              where(mask, a.z, b.z))


def d3_dot(u: D3, v: D3) -> D:
    return add(add(mul(u.x, v.x), mul(u.y, v.y)), mul(u.z, v.z))


def d3_length_sq(v: D3) -> D:
    return d3_dot(v, v)


def d3_unit(v: D3, eps: float = 1e-30) -> D3:
    """Normalize, safe at 0 like vec.unit (dead lanes stay finite)."""
    len2 = maximum(d3_length_sq(v), const(eps))
    inv = div(const(1.0), sqrt(len2))
    return v.scale(inv)


def d3_reflect(v: D3, n: D3) -> D3:
    return v - n.scale(mul(const(2.0), d3_dot(v, n)))
