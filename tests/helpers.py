"""Shared test helpers: hand-built scenes."""
import numpy as np
import jax.numpy as jnp

from raytracingincuda_tpu.models.scene import Scene, SceneParams
from raytracingincuda_tpu.ops.vec import Vec3


def scene_from_spheres(spheres, pad_to=8, dtype=jnp.float32):
    """spheres: list of dicts with center, radius, mat, albedo, fuzz, ior."""
    n = max(pad_to, len(spheres))
    center = np.zeros((n, 3)); center[:, 1] = -1e6
    radius = np.ones(n); albedo = np.zeros((n, 3))
    fuzz = np.zeros(n); ior = np.ones(n)
    mat = np.zeros(n, np.int32); active = np.zeros(n, bool)
    for i, s in enumerate(spheres):
        center[i] = s["center"]
        radius[i] = s["radius"]
        mat[i] = s.get("mat", 0)
        albedo[i] = s.get("albedo", (0, 0, 0))
        fuzz[i] = s.get("fuzz", 0.0)
        ior[i] = s.get("ior", 1.0)
        active[i] = True
    return Scene(
        params=SceneParams(
            center=Vec3(*(jnp.asarray(center[:, k], dtype) for k in range(3))),
            radius=jnp.asarray(radius, dtype),
            albedo=Vec3(*(jnp.asarray(albedo[:, k], dtype) for k in range(3))),
            fuzz=jnp.asarray(fuzz, dtype),
            ior=jnp.asarray(ior, dtype),
        ),
        mat_type=jnp.asarray(mat),
        active=jnp.asarray(active),
    )


def empty_scene(pad_to=8, dtype=jnp.float32):
    return scene_from_spheres([], pad_to=pad_to, dtype=dtype)
