"""Run configuration: the reference's six CLI flags plus TPU-native axes.

The reference bakes its variant axes (float/double x global/const/texture)
into six separate executables (SURVEY.md §2.1); here they are config values
of one tracer:

  dtype:  float32 ('float') | float64 ('double') | bfloat16
  layout: hbm ('global') | vmem ('const') | packed ('tex')
          — scene placement strategy for the Pallas kernel; the jnp oracle
          ignores it (XLA manages residency).
  impl:   oracle (pure-jnp reference path) | pallas (wavefront kernel)

Flag set and defaults mirror ``GlobalFloat…/main.cu:42-55``; ``--threads``
(CUDA threads per 2-D block row) has no TPU meaning but is kept for CLI,
filename and benchmark-CSV parity, and doubles as a tile-size hint:
chunk_pixels defaults to threads^2 * 128 (the reference's block area times
the VPU lane width).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from .ops.rng import DEFAULT_SEED

DTYPE_NAMES = {"float32": "float", "float64": "double", "bfloat16": "bfloat16"}
LAYOUT_NAMES = {"hbm": "global", "vmem": "const", "packed": "tex"}


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    scene_id: int
    width: int = 320
    height: int = 192
    samples: int = 10
    bounces: int = 25
    threads: int = 8          # CLI/filename parity knob (see module docstring)
    dtype: str = "float32"
    layout: str = "vmem"
    impl: str = "pallas"
    seed: int = DEFAULT_SEED
    legacy_sky: bool = False
    chunk_pixels: Optional[int] = None
    # Russian-roulette start depth (None = off = reference-parity
    # estimator). Unbiased variance/speed tradeoff: paths beyond this
    # depth survive with p = max-channel throughput (clamped to [0.05,1])
    # and are reweighted 1/p.
    rr_start: Optional[int] = None
    # impl='adaptive': probe at `samples` spp, refine noisy pixels up to
    # max_samples (default 4x samples) targeting relative error
    # adaptive_tol (ops/adaptive.py).
    max_samples: Optional[int] = None
    adaptive_tol: float = 0.05
    # impl='adaptive': refine rounds; >1 re-estimates error after each
    # refine pass (two half-budget launches per round, ops/adaptive.py)
    adaptive_rounds: int = 1
    # pixels per lane in the regen kernel (None = auto by sample count).
    # K>1 averages each lane's work over K pixels, shrinking the
    # max-over-lanes tile tail (measured on v5e at the headline config:
    # K=16 with ray_tile=1024 is the round-2 production point,
    # benchmarks/results/parity_tune*.jsonl).
    pixels_per_lane: Optional[int] = None
    # rays per kernel tile (None = auto by image size: 1024 from 640x384
    # up — bigger tiles amortize per-wave overhead, measured -7% at the
    # headline — 512 below, where fewer pixels per tile keeps the frame
    # subdivided). Explicit values must be multiples of 128 (VPU lanes).
    ray_tile: Optional[int] = None
    # impl='stream' (scenes larger than VMEM, streamed from HBM in
    # Morton-sorted sphere blocks — ops/pallas_stream.py): block size and
    # lane-group cull granularity (0 = one skip decision per wave;
    # None = auto — 256-lane groups once the scene is big enough that
    # the skipped compute outweighs the per-group scalar test, measured
    # crossover ~50k spheres on v5e, benchmarks/results/cull_tpu.jsonl).
    stream_block: int = 256
    stream_lane_group: Optional[int] = None
    # impl='pallas': compute the hit test's C.D / C.O contractions on the
    # MXU at bf16x3 precision (~2^-22 relative error — can flip hits only
    # at silhouette tangencies; noise, not bias). Off by default to keep
    # exact checksum parity with the jnp oracle.
    mxu_dots: bool = False

    def effective_pixels_per_lane(self) -> int:
        if self.pixels_per_lane:
            return self.pixels_per_lane
        # auto: enough samples to amortize pulls; small images keep K
        # modest so tiles still subdivide the frame
        if self.samples >= 32:
            return 16
        if self.samples >= 8:
            return 8
        return 1

    def effective_ray_tile(self) -> int:
        if self.ray_tile:
            return self.ray_tile
        return 1024 if self.width * self.height >= 640 * 384 else 512

    def __post_init__(self):
        if self.dtype not in DTYPE_NAMES:
            raise ValueError(f"dtype must be one of {list(DTYPE_NAMES)}")
        if self.layout not in LAYOUT_NAMES:
            raise ValueError(f"layout must be one of {list(LAYOUT_NAMES)}")
        if self.impl not in ("oracle", "pallas", "adaptive", "stream"):
            raise ValueError(
                "impl must be 'oracle', 'pallas', 'adaptive' or 'stream'"
            )
        for f in ("width", "height", "samples", "bounces"):
            if getattr(self, f) <= 0:
                raise ValueError(f"{f} must be positive")
        # optional knobs: None means auto; an EXPLICIT value must be
        # positive (0 silently flipping to auto hid user errors)
        for f in ("chunk_pixels", "pixels_per_lane", "max_samples",
                  "stream_lane_group"):
            v = getattr(self, f)
            if v is not None and v < 0:
                raise ValueError(f"{f} must be >= 0 (None = auto)")
        for f in ("chunk_pixels", "pixels_per_lane", "max_samples"):
            v = getattr(self, f)
            if v == 0:
                raise ValueError(f"{f} must be positive (or None = auto)")
        if self.stream_block <= 0:
            raise ValueError("stream_block must be positive")
        if self.ray_tile is not None and (
                self.ray_tile <= 0 or self.ray_tile % 128 != 0):
            raise ValueError(
                "ray_tile must be a positive multiple of 128 (or None = "
                "auto)"
            )
        if self.threads <= 0:
            raise ValueError("threads must be positive")
        if not 0.0 < self.adaptive_tol:
            raise ValueError("adaptive_tol must be positive")
        if self.impl == "adaptive":
            if self.samples % 2 != 0:
                raise ValueError(
                    "impl=adaptive needs even --samples (two half-buffers)"
                )
            if self.effective_max_samples < self.samples:
                raise ValueError("max_samples must be >= samples")
            if self.adaptive_rounds < 1:
                raise ValueError("adaptive_rounds must be >= 1")

    @property
    def effective_max_samples(self) -> int:
        return self.max_samples if self.max_samples else 4 * self.samples

    @property
    def jnp_dtype(self):
        return {"float32": jnp.float32, "float64": jnp.float64,
                "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def effective_chunk_pixels(self) -> int:
        if self.chunk_pixels is not None:
            return self.chunk_pixels
        return max(self.threads * self.threads * 128, 1024)

    def output_filename(self) -> str:
        """Reference filename convention (main.cu:349-358):
        <layout>_<dtype>_scene<id>_<W>x<H>_<S>samples_<B>bounces_
        <threads>threadsPerBlockRow.ppm"""
        return (
            f"{LAYOUT_NAMES[self.layout]}_{DTYPE_NAMES[self.dtype]}"
            f"_scene{self.scene_id}"
            f"_{self.width}x{self.height}"
            f"_{self.samples}samples"
            f"_{self.bounces}bounces"
            f"_{self.threads}threadsPerBlockRow.ppm"
        )
