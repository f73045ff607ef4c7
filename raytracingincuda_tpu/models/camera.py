"""Positionable defocus-blur camera.

TPU-native re-design of the reference camera (``GlobalFloat…/camera.h:10-76``):
instead of a mutable POD struct initialized in-place, the camera is split
into

  * ``CameraConfig`` — the user-facing parameters (the reference hard-codes
    these in ``main.cu:114-121``; here they are data, and differentiable),
  * ``Camera`` — the derived frame produced by :func:`initialize`, the exact
    viewport math of ``camera.h:33-68`` expressed in jnp so gradients flow
    from rendered pixels back to vfov/lookfrom/etc.

Both are pytrees of scalars; ``Vec3`` fields are scalar-component vectors
broadcast against ray batches at use sites.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..ops import vec
from ..ops.vec import Vec3


class CameraConfig(NamedTuple):
    """User parameters (defaults = the reference's hard-coded values,
    ``main.cu:114-121``)."""

    vfov: jnp.ndarray            # vertical field of view, degrees
    lookfrom: Vec3
    lookat: Vec3
    vup: Vec3
    defocus_angle: jnp.ndarray   # degrees; <=0 disables defocus blur
    focus_dist: jnp.ndarray

    @staticmethod
    def reference_default(dtype=jnp.float32) -> "CameraConfig":
        # HOST (numpy) scalars, deliberately: a config constant lives on
        # the host — jit uploads it with the dispatch. jnp scalars here
        # would sit on the accelerator and every host-side consumer
        # (e.g. the df64 camera pack, initialize_f64) would pay one
        # device->host fetch PER FIELD — ~14 tunnel RTTs ≈ 350 ms inside
        # the render bracket on relayed TPU (smallrow/df64 round-3 probe).
        # Values are exactly the reference's (main.cu:114-121) either way.
        import numpy as np

        npdt = np.dtype(jnp.dtype(dtype).name)

        def s(v):
            return np.asarray(v, npdt)

        return CameraConfig(
            vfov=s(20.0),
            lookfrom=Vec3(s(13.0), s(2.0), s(3.0)),
            lookat=Vec3(s(0.0), s(0.0), s(0.0)),
            vup=Vec3(s(0.0), s(1.0), s(0.0)),
            defocus_angle=s(0.6),
            focus_dist=s(10.0),
        )


class Camera(NamedTuple):
    """Derived camera frame (the outputs of ``camera.h:33-68``)."""

    center: Vec3
    pixel00_loc: Vec3
    pixel_delta_u: Vec3
    pixel_delta_v: Vec3
    defocus_disk_u: Vec3
    defocus_disk_v: Vec3
    use_defocus: jnp.ndarray     # bool scalar: defocus_angle > 0 (camera.h:152)


def initialize(cfg: CameraConfig, img_width: int, img_height: int) -> Camera:
    """Viewport math of ``camera.h:33-68`` (differentiable)."""
    theta = cfg.vfov * (math.pi / 180.0)
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h * cfg.focus_dist
    viewport_width = viewport_height * (float(img_width) / float(img_height))

    w = vec.unit(cfg.lookfrom - cfg.lookat)
    u = vec.unit(vec.cross(cfg.vup, w))
    v = vec.cross(w, u)

    viewport_u = u * viewport_width
    viewport_v = (-v) * viewport_height

    pixel_delta_u = viewport_u / float(img_width)
    pixel_delta_v = viewport_v / float(img_height)

    center = cfg.lookfrom
    viewport_upper_left = (
        center - w * cfg.focus_dist - viewport_u / 2.0 - viewport_v / 2.0
    )
    pixel00_loc = viewport_upper_left + (pixel_delta_u + pixel_delta_v) * 0.5

    defocus_radius = cfg.focus_dist * jnp.tan(
        (cfg.defocus_angle / 2.0) * (math.pi / 180.0)
    )
    defocus_disk_u = u * defocus_radius
    defocus_disk_v = v * defocus_radius

    return Camera(
        center=center,
        pixel00_loc=pixel00_loc,
        pixel_delta_u=pixel_delta_u,
        pixel_delta_v=pixel_delta_v,
        defocus_disk_u=defocus_disk_u,
        defocus_disk_v=defocus_disk_v,
        use_defocus=cfg.defocus_angle > 0.0,
    )
