"""Scene asset import/export.

The reference hard-codes its three scenes in ``main()``
(``GlobalFloat…/main.cu:148-284``); a production framework needs scenes as
data. Two formats:

  .npz  — binary SoA arrays, the native format (a 100k-sphere asset loads
          in milliseconds; use for the streaming-HBM path).
  .csv  — human-editable sphere list, one sphere per row:
          ``cx,cy,cz,radius,mat,albedo_r,albedo_g,albedo_b,fuzz,ior``
          with ``#`` comments and blank lines ignored. ``mat`` accepts
          the integer ids or the names lambertian/metal/dielectric.

Both round-trip exactly through ``save_scene``/``load_scene`` (modulo
float32 storage in npz when the scene was built at float32). Padding to a
slot multiple (VPU-tile alignment, models/scene.py) is applied on load,
not stored.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.vec import Vec3
from .scene import (
    DIELECTRIC, LAMBERTIAN, METAL, Scene, SceneParams, _round_up,
)

_MAT_NAMES = {"lambertian": LAMBERTIAN, "metal": METAL,
              "dielectric": DIELECTRIC,
              # the reference's spelling (material.h: "dieletric" sic)
              "dieletric": DIELECTRIC}
_MAT_IDS = {LAMBERTIAN: "lambertian", METAL: "metal",
            DIELECTRIC: "dielectric"}


def scene_from_arrays(
    center: np.ndarray,          # (N, 3)
    radius: np.ndarray,          # (N,)
    mat_type: np.ndarray,        # (N,) int
    albedo: Optional[np.ndarray] = None,   # (N, 3)
    fuzz: Optional[np.ndarray] = None,     # (N,)
    ior: Optional[np.ndarray] = None,      # (N,)
    active: Optional[np.ndarray] = None,   # (N,) bool
    dtype=jnp.float32,
    pad_to_multiple: Optional[int] = 128,
) -> Scene:
    """Build a padded Scene pytree from host arrays (the programmatic
    import path; file loaders call this)."""
    center = np.asarray(center, np.float64).reshape(-1, 3)
    n = center.shape[0]
    radius = np.asarray(radius, np.float64).reshape(n)
    mat_type = np.asarray(mat_type, np.int32).reshape(n)
    albedo = (np.zeros((n, 3)) if albedo is None
              else np.asarray(albedo, np.float64).reshape(n, 3))
    # the reference's metal ctor clamps fuzz at 1 (material.h:29-30);
    # apply the same rule to imported scenes so every construction path
    # agrees (_Builder.set does this for programmatic scenes)
    fuzz = (np.zeros(n) if fuzz is None
            else np.minimum(np.asarray(fuzz, np.float64).reshape(n), 1.0))
    ior = (np.ones(n) if ior is None
           else np.asarray(ior, np.float64).reshape(n))
    active = (np.ones(n, bool) if active is None
              else np.asarray(active, bool).reshape(n))
    if not np.isin(mat_type, (LAMBERTIAN, METAL, DIELECTRIC)).all():
        raise ValueError("mat_type must be 0 (lambertian), 1 (metal) or "
                         "2 (dielectric)")
    if (radius == 0).any():
        raise ValueError(
            "radius must be nonzero (negative radii are allowed: they "
            "flip the normal inward — the hollow-glass trick)"
        )
    if (ior <= 0).any():
        raise ValueError(
            "ior must be > 0 (a zero/negative index produces NaN "
            "refraction directions)"
        )

    n_padded = _round_up(max(n, 1), pad_to_multiple) if pad_to_multiple \
        else max(n, 1)
    pad = n_padded - n

    def padf(a, fill=0.0):
        if pad == 0:
            return a
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, a.dtype)])

    center = padf(center)
    if pad:
        center[n:, 1] = -1.0e6     # parked placeholders (models/scene.py)
    radius = padf(radius, 1.0)
    albedo = padf(albedo)
    fuzz = padf(fuzz)
    ior = padf(ior, 1.0)
    mat_type = padf(mat_type)
    active = padf(active, False)

    params = SceneParams(
        center=Vec3(*(jnp.asarray(center[:, k], dtype) for k in range(3))),
        radius=jnp.asarray(radius, dtype),
        albedo=Vec3(*(jnp.asarray(albedo[:, k], dtype) for k in range(3))),
        fuzz=jnp.asarray(fuzz, dtype),
        ior=jnp.asarray(ior, dtype),
    )
    return Scene(params=params,
                 mat_type=jnp.asarray(mat_type, jnp.int32),
                 active=jnp.asarray(active, bool))


def _scene_to_arrays(scene: Scene):
    p = scene.params
    active = np.asarray(scene.active)
    keep = np.flatnonzero(active)    # drop padding on save
    center = np.stack([np.asarray(p.center.x), np.asarray(p.center.y),
                       np.asarray(p.center.z)], axis=1)[keep]
    albedo = np.stack([np.asarray(p.albedo.x), np.asarray(p.albedo.y),
                       np.asarray(p.albedo.z)], axis=1)[keep]
    return dict(
        center=center,
        radius=np.asarray(p.radius)[keep],
        albedo=albedo,
        fuzz=np.asarray(p.fuzz)[keep],
        ior=np.asarray(p.ior)[keep],
        mat_type=np.asarray(scene.mat_type)[keep],
    )


def save_scene(path: str, scene: Scene) -> None:
    """Write a Scene to .npz or .csv by extension (active slots only —
    padding is a load-time concern)."""
    ext = os.path.splitext(path)[1].lower()
    arrs = _scene_to_arrays(scene)
    if ext == ".npz":
        np.savez_compressed(path, **arrs)
    elif ext in (".csv", ".txt"):
        with open(path, "w") as f:
            f.write("# cx,cy,cz,radius,mat,albedo_r,albedo_g,albedo_b,"
                    "fuzz,ior\n")
            for i in range(arrs["center"].shape[0]):
                c = arrs["center"][i]
                a = arrs["albedo"][i]
                f.write(
                    f"{c[0]:.9g},{c[1]:.9g},{c[2]:.9g},"
                    f"{arrs['radius'][i]:.9g},"
                    f"{_MAT_IDS[int(arrs['mat_type'][i])]},"
                    f"{a[0]:.9g},{a[1]:.9g},{a[2]:.9g},"
                    f"{arrs['fuzz'][i]:.9g},{arrs['ior'][i]:.9g}\n"
                )
    else:
        raise ValueError(f"unsupported scene format: {ext} "
                         "(use .npz or .csv)")


def load_scene(
    path: str,
    dtype=jnp.float32,
    pad_to_multiple: Optional[int] = 128,
) -> Scene:
    """Load a scene asset (.npz or .csv) into a padded Scene pytree."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        with np.load(path) as z:
            return scene_from_arrays(
                z["center"], z["radius"], z["mat_type"],
                albedo=z.get("albedo"), fuzz=z.get("fuzz"),
                ior=z.get("ior"),
                active=z.get("active"),
                dtype=dtype, pad_to_multiple=pad_to_multiple,
            )
    if ext in (".csv", ".txt"):
        rows = []
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = [p.strip() for p in line.split(",")]
                if len(parts) != 10:
                    raise ValueError(
                        f"{path}:{lineno}: expected 10 fields "
                        f"(cx,cy,cz,radius,mat,albedo_rgb,fuzz,ior), "
                        f"got {len(parts)}"
                    )
                mat = parts[4].lower()
                mat_id = (_MAT_NAMES[mat] if mat in _MAT_NAMES
                          else int(mat))
                rows.append([float(parts[0]), float(parts[1]),
                             float(parts[2]), float(parts[3]), mat_id,
                             float(parts[5]), float(parts[6]),
                             float(parts[7]), float(parts[8]),
                             float(parts[9])])
        if not rows:
            raise ValueError(f"{path}: no spheres")
        arr = np.asarray(rows, np.float64)
        return scene_from_arrays(
            arr[:, 0:3], arr[:, 3], arr[:, 4].astype(np.int32),
            albedo=arr[:, 5:8], fuzz=arr[:, 8], ior=arr[:, 9],
            dtype=dtype, pad_to_multiple=pad_to_multiple,
        )
    raise ValueError(f"unsupported scene format: {ext} (use .npz or .csv)")
