"""Structure-of-arrays 3-vector math for TPU.

The reference (``GlobalFloatCUDAInOneWeekend/vec3.h``) keeps a per-thread
``vec3 {float e[3]}``.  On TPU a trailing axis of length 3 would waste the
(8, 128) VPU tile (3/128 lane utilization), so vectors over a batch of rays
are stored as three *separate* arrays of identical shape — each component
fills whole vector registers.  ``Vec3`` is a NamedTuple and therefore a JAX
pytree: it jits, vmaps, shards and differentiates transparently, and the
same ops run unchanged inside Pallas kernels.

Reference parity map (file:line into /root/reference):
  vec3 operators        -> Vec3 dunder ops          (vec3.h:18-91)
  dot / cross           -> dot / cross              (vec3.h:93-103)
  unit_vector           -> unit                     (vec3.h:105-107)
  length/length_squared -> length / length_sq       (vec3.h:40-46)
  near_zero (eps 1e-6)  -> near_zero                (vec3.h:48-52)
  reflect               -> reflect                  (vec3.h:129-131)
  refract               -> refract                  (vec3.h:133-138)
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class Vec3(NamedTuple):
    """SoA 3-vector: three arrays of identical shape (one per component)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic -------------------------------------------------------
    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def __mul__(self, o: Union["Vec3", Scalar]) -> "Vec3":
        if isinstance(o, Vec3):  # componentwise (Hadamard), like vec3.h:77-79
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o: Scalar) -> "Vec3":
        return Vec3(self.x * o, self.y * o, self.z * o)

    def __truediv__(self, t: Scalar) -> "Vec3":
        inv = 1.0 / t
        return Vec3(self.x * inv, self.y * inv, self.z * inv)

    # -- shape helpers ----------------------------------------------------
    @property
    def shape(self):
        return jnp.shape(self.x)

    @property
    def dtype(self):
        return jnp.asarray(self.x).dtype

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))

    def reshape(self, *shape) -> "Vec3":
        return Vec3(
            self.x.reshape(*shape), self.y.reshape(*shape), self.z.reshape(*shape)
        )

    def stack(self, axis: int = -1) -> jnp.ndarray:
        """Materialize as a dense (..., 3) array (host/IO boundary only)."""
        return jnp.stack([self.x, self.y, self.z], axis=axis)

    @staticmethod
    def from_stacked(a: jnp.ndarray, axis: int = -1) -> "Vec3":
        parts = jnp.split(jnp.asarray(a), 3, axis=axis)
        return Vec3(*(p.squeeze(axis) for p in parts))

    @staticmethod
    def full(shape, cx, cy, cz, dtype=jnp.float32) -> "Vec3":
        return Vec3(
            jnp.full(shape, cx, dtype),
            jnp.full(shape, cy, dtype),
            jnp.full(shape, cz, dtype),
        )

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Vec3":
        z = jnp.zeros(shape, dtype)
        return Vec3(z, z, z)

    @staticmethod
    def of(cx, cy, cz, dtype=jnp.float32) -> "Vec3":
        """A Vec3 of scalars (camera constants etc.)."""
        return Vec3(
            jnp.asarray(cx, dtype), jnp.asarray(cy, dtype), jnp.asarray(cz, dtype)
        )


# -- free functions (mirror vec3.h utility fns) ---------------------------

def dot(u: Vec3, v: Vec3) -> jnp.ndarray:
    return u.x * v.x + u.y * v.y + u.z * v.z


def length_sq(v: Vec3) -> jnp.ndarray:
    return dot(v, v)


def length(v: Vec3) -> jnp.ndarray:
    return jnp.sqrt(length_sq(v))


def cross(u: Vec3, v: Vec3) -> Vec3:
    return Vec3(
        u.y * v.z - u.z * v.y,
        u.z * v.x - u.x * v.z,
        u.x * v.y - u.y * v.x,
    )


def unit(v: Vec3, eps: float = 1e-30) -> Vec3:
    """Normalize; safe for zero-length inputs (returns ~0 instead of NaN).

    The guard matters for gradients: dead wavefront lanes must never produce
    NaN, or the backward pass poisons live lanes through 0*NaN.
    """
    inv = jax.lax.rsqrt(jnp.maximum(length_sq(v), eps))
    return v * inv


def near_zero(v: Vec3, eps: float = 1e-6) -> jnp.ndarray:
    """Componentwise |v| < eps (vec3.h:48-52; degenerate-scatter guard)."""
    return (
        (jnp.abs(v.x) < eps) & (jnp.abs(v.y) < eps) & (jnp.abs(v.z) < eps)
    )


def reflect(v: Vec3, n: Vec3) -> Vec3:
    return v - n * (2.0 * dot(v, n))


def refract(uv: Vec3, n: Vec3, etai_over_etat: jnp.ndarray) -> Vec3:
    """Snell refraction of unit vector uv about unit normal n (vec3.h:133-138)."""
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_perp = (uv + n * cos_theta) * etai_over_etat
    # |1 - |perp|^2| guarded away from 0: sqrt has unbounded gradient there
    # (exact total-internal-reflection boundary; those lanes are selected
    # away by the caller's cannot_refract mask anyway).
    par_len = jnp.sqrt(jnp.maximum(jnp.abs(1.0 - length_sq(r_out_perp)), 1e-12))
    r_out_parallel = n * (-par_len)
    return r_out_perp + r_out_parallel


def where(mask: jnp.ndarray, a: Vec3, b: Vec3) -> Vec3:
    """Lane-masked select, the wavefront replacement for branches."""
    return Vec3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def lerp(t: jnp.ndarray, a: Vec3, b: Vec3) -> Vec3:
    """(1-t)*a + t*b — the sky gradient blend (camera.h:123)."""
    return a * (1.0 - t) + b * t


def safe_radius(r: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """SIGNED radius guarded away from zero: ``(p - c) / safe_radius(r)``
    is the reference's signed outward-normal division (hittable.h:61 —
    a NEGATIVE radius flips the normal inward, the book's hollow-glass
    bubble trick) while dead/miss lanes whose gathered radius is 0 stay
    finite. Bitwise equal to ``max(r, eps)`` for every r >= eps, i.e.
    for all real positive radii."""
    return jnp.where(jnp.abs(r) > eps, r, eps)
