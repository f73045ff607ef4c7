"""Scene construction: SoA sphere worlds for the three hard-coded scenes.

The reference builds AoS ``sphere[]``/``material[]`` host arrays with raw
device pointers patched up on the GPU (``GlobalFloat…/main.cu:142-321``).
Its own evolution (Const/Tex variants) already moved to integer material
indices and SoA texture arrays — which is exactly the TPU-native data model:
a pytree of flat arrays, replicated to every chip, indexed by position.

Scene layout quirk handled here (SURVEY.md §3.1): the reference indexes
small-sphere slots by grid formula and *skips* slots failing the
distance-to-(4,0.2,0) filter, leaving uninitialized spheres in the array
that ``hit_world`` still tests (latent UB).  We define clean semantics: an
explicit ``active`` mask; inactive slots are parked far away with zero
contribution, and intersection validity is ANDed with the mask.

Scene ids (``main.cu:148-284``):
  1        — book cover: 22x22 grid, a,b in [-11,11), 488 slots
  2        — off-center patch: 6x6 grid, a,b in [5,11), 40 slots
  default  — quadrant: 11x11 grid, a,b in [-11,0), 125 slots

Scene *randomness*: the reference uses unseeded ``std::rand()``
(``rtweekend.h:22-25``) — deterministic per libc but not reproducible by
construction.  We define scenes by construction rule + named seed
(default 1227, the reference's curand seed) using a PCG64 host generator,
with the reference's exact per-cell draw order (choose_mat, x-offset,
z-offset, then material draws only if the slot is kept) so the scene
*structure and statistics* match; bit parity with libc rand() is
impossible and not a goal (SURVEY.md §7).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..ops.rng import DEFAULT_SEED
from ..ops.vec import Vec3

# Material type ids (material.h:11-15; DIELETRIC sic in the reference).
LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2


class SceneParams(NamedTuple):
    """Differentiable scene parameters (the gradient targets)."""

    center: Vec3          # (N,) each
    radius: jnp.ndarray   # (N,)
    albedo: Vec3          # (N,) each
    fuzz: jnp.ndarray     # (N,)
    ior: jnp.ndarray      # (N,)


class Scene(NamedTuple):
    params: SceneParams
    mat_type: jnp.ndarray  # (N,) int32
    active: jnp.ndarray    # (N,) bool

    @property
    def num_slots(self) -> int:
        return self.mat_type.shape[0]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class _Builder:
    def __init__(self, n_slots: int):
        self.center = np.zeros((n_slots, 3), np.float64)
        # Parked placeholder geometry for inactive slots: tiny sphere far
        # below the world; active mask makes it irrelevant regardless.
        self.center[:, 1] = -1.0e6
        self.radius = np.full(n_slots, 1.0, np.float64)
        self.albedo = np.zeros((n_slots, 3), np.float64)
        self.fuzz = np.zeros(n_slots, np.float64)
        self.ior = np.ones(n_slots, np.float64)
        self.mat = np.zeros(n_slots, np.int32)
        self.active = np.zeros(n_slots, bool)

    def set(self, i, center, radius, mat, albedo=(0, 0, 0), fuzz=0.0, ior=1.0):
        self.center[i] = center
        self.radius[i] = radius
        self.mat[i] = mat
        self.albedo[i] = albedo
        self.fuzz[i] = min(fuzz, 1.0)  # metal ctor clamp (material.h:29-30)
        self.ior[i] = ior
        self.active[i] = True


def _fill_small_spheres(b: _Builder, rng: np.random.Generator,
                        a_range, b_range, slot_fn):
    """The reference's small-sphere loop (main.cu:163-194), draw order kept."""
    for a in range(*a_range):
        for bb in range(*b_range):
            choose_mat = rng.random()
            center = np.array(
                [a + 0.9 * rng.random(), 0.2, bb + 0.9 * rng.random()]
            )
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) > 0.9:
                i = slot_fn(a, bb)
                if choose_mat < 0.8:  # diffuse: albedo = rand_color * rand_color
                    albedo = rng.random(3) * rng.random(3)
                    b.set(i, center, 0.2, LAMBERTIAN, albedo)
                elif choose_mat < 0.95:  # metal
                    albedo = 0.5 + 0.5 * rng.random(3)
                    fuzz = 0.5 * rng.random()
                    b.set(i, center, 0.2, METAL, albedo, fuzz=fuzz)
                else:  # glass
                    b.set(i, center, 0.2, DIELECTRIC, ior=1.5)


def num_slots_for_scene(scene_id: int) -> int:
    """1 ground + grid slots + 3 big spheres (main.cu:152,199,243)."""
    if scene_id == 1:
        return 1 + 22 * 22 + 3
    if scene_id == 2:
        return 1 + 6 * 6 + 3
    return 1 + 11 * 11 + 3


def build_scene(
    scene_id: int,
    seed: int = DEFAULT_SEED,
    dtype=jnp.float32,
    pad_to_multiple: Optional[int] = 128,
) -> Scene:
    """Build one of the three reference scenes as a padded SoA pytree.

    ``pad_to_multiple`` rounds the sphere-slot count up (inactive padding)
    so the (spheres x rays) intersection batch tiles the 8x128 VPU cleanly.
    """
    n = num_slots_for_scene(scene_id)
    n_padded = _round_up(n, pad_to_multiple) if pad_to_multiple else n
    b = _Builder(n_padded)
    rng = np.random.default_rng(seed)

    # ground sphere (main.cu:158-160)
    b.set(0, (0.0, -1000.0, 0.0), 1000.0, LAMBERTIAN, (0.5, 0.5, 0.5))

    if scene_id == 1:
        _fill_small_spheres(
            b, rng, (-11, 11), (-11, 11),
            lambda a, bb: (a + 11) * 22 + (bb + 11) + 1,
        )
    elif scene_id == 2:
        _fill_small_spheres(
            b, rng, (5, 11), (5, 11),
            lambda a, bb: (a - 5) * 6 + (bb - 5) + 1,
        )
    else:
        _fill_small_spheres(
            b, rng, (-11, 0), (-11, 0),
            lambda a, bb: (a + 11) * 11 + (bb + 11) + 1,
        )

    # shared 3 big spheres (main.cu:287-296)
    i = n - 3
    b.set(i, (0.0, 1.0, 0.0), 1.0, DIELECTRIC, ior=1.5)
    b.set(i + 1, (-4.0, 1.0, 0.0), 1.0, LAMBERTIAN, (0.4, 0.2, 0.1))
    b.set(i + 2, (4.0, 1.0, 0.0), 1.0, METAL, (0.7, 0.6, 0.5), fuzz=0.0)

    params = SceneParams(
        center=Vec3(
            jnp.asarray(b.center[:, 0], dtype),
            jnp.asarray(b.center[:, 1], dtype),
            jnp.asarray(b.center[:, 2], dtype),
        ),
        radius=jnp.asarray(b.radius, dtype),
        albedo=Vec3(
            jnp.asarray(b.albedo[:, 0], dtype),
            jnp.asarray(b.albedo[:, 1], dtype),
            jnp.asarray(b.albedo[:, 2], dtype),
        ),
        fuzz=jnp.asarray(b.fuzz, dtype),
        ior=jnp.asarray(b.ior, dtype),
    )
    return Scene(
        params=params,
        mat_type=jnp.asarray(b.mat, jnp.int32),
        active=jnp.asarray(b.active, bool),
    )


def build_random_scene(
    n_spheres: int,
    seed: int = DEFAULT_SEED,
    dtype=jnp.float32,
    pad_to_multiple: Optional[int] = 128,
    half_extent: float = 50.0,
) -> Scene:
    """A large random scene for the streaming-HBM path (scenes >> VMEM).

    The reference caps out at 488 spheres (const-memory limit,
    deviceQuery.txt:19); this generator scales the same material mix
    (main.cu:175-191 roll) to arbitrary N, scattered uniformly in a
    [-half_extent, half_extent]^2 ground patch, plus the reference's
    ground sphere. Vectorized numpy (a Python loop at N=100k would
    dominate startup)."""
    n = n_spheres + 1
    n_padded = _round_up(n, pad_to_multiple) if pad_to_multiple else n
    rng = np.random.default_rng(seed)
    m = n_spheres

    center = np.zeros((n_padded, 3), np.float64)
    # park padding slots per the module's inactive-slot convention
    # (far below the world, unit radius — same as _Builder /
    # scene_from_arrays) instead of degenerate origin spheres
    center[:, 1] = -1e6
    radius = np.ones(n_padded)
    albedo = np.zeros((n_padded, 3))
    fuzz = np.zeros(n_padded)
    ior = np.ones(n_padded)
    mat = np.zeros(n_padded, np.int32)
    active = np.zeros(n_padded, bool)

    center[0] = (0.0, -1000.0, 0.0)
    radius[0] = 1000.0
    albedo[0] = (0.5, 0.5, 0.5)
    active[0] = True

    r = rng.uniform(0.15, 0.35, m)
    center[1:n, 0] = rng.uniform(-half_extent, half_extent, m)
    center[1:n, 2] = rng.uniform(-half_extent, half_extent, m)
    center[1:n, 1] = r
    radius[1:n] = r
    roll = rng.uniform(0.0, 1.0, m)
    lam = roll < 0.8
    met = (roll >= 0.8) & (roll < 0.95)
    die = roll >= 0.95
    mat[1:n][met] = METAL
    mat[1:n][die] = DIELECTRIC
    albedo[1:n][lam] = (rng.uniform(0, 1, (m, 3))
                        * rng.uniform(0, 1, (m, 3)))[lam]
    albedo[1:n][met] = rng.uniform(0.5, 1.0, (m, 3))[met]
    fuzz[1:n][met] = rng.uniform(0.0, 0.5, m)[met]
    ior[1:n][die] = 1.5
    active[1:n] = True

    params = SceneParams(
        center=Vec3(*(jnp.asarray(center[:, k], dtype) for k in range(3))),
        radius=jnp.asarray(radius, dtype),
        albedo=Vec3(*(jnp.asarray(albedo[:, k], dtype) for k in range(3))),
        fuzz=jnp.asarray(fuzz, dtype),
        ior=jnp.asarray(ior, dtype),
    )
    return Scene(
        params=params,
        mat_type=jnp.asarray(mat, jnp.int32),
        active=jnp.asarray(active, bool),
    )
