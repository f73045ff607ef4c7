"""Adaptive sampling: per-pixel Monte-Carlo budgets from measured variance.

The reference (and the book) spend the same ``samples`` budget on every
pixel (``camera.h:141``), though per-pixel cost AND per-pixel noise vary by
orders of magnitude across the image (sky pixels converge in a couple of
samples; glass/caustic paths need hundreds). The counter-based RNG
(ops/rng.py) makes adaptivity exact here: pixel p's samples are the global
ids [0, n_p), so a multi-pass schedule that keeps raw accumulator sums is
bit-identical to a single pass at the final per-pixel counts.

Schedule (split-buffer error estimate, the production standard):
  1. probe: render base_spp samples as two half-buffers A = [0, k),
     B = [k, 2k) — one kernel launch each (the compile service rejects two
     Mosaic kernels per program, so phases are separate jits anyway).
  2. error: e_p = |A/k - B/k| luminance, relative to the mean luminance
     (+ floor). This is the classic split-buffer estimator of per-pixel
     standard error.
  3. refine: extra_p = clip(round(base_spp * (e_p/tol)^2 - base_spp), 0,
     max_spp - base_spp) — the sample count that would bring pixel p's
     relative error down to ~tol under 1/sqrt(n) scaling. One more kernel
     launch renders samples [base_spp, base_spp + extra_p) with the
     per-lane budget row; difficulty-style bucket ordering groups pixels
     with similar extra_p so tiles stay load-balanced.
  4. image = (A + B + C) / (base_spp + extra_p), gamma.

Multi-round (``rounds`` > 1): each refine renders its budget as TWO
half-budget launches accumulated into the A/B split buffers, so the
error can be re-estimated at the new counts and refined again. Every
round draws from a disjoint static sample-id window — the counter-based
RNG needs distinct stream ids, not contiguous ones, which is what makes
per-round windows exact without per-pixel dynamic offsets.

Estimator note: budgets depend only on already-drawn samples and each
pixel's estimate is the mean of ALL its samples, so the image is unbiased
conditional on the budget schedule (standard adaptive-MC practice; the
reference has no analog).

Measured (v5e, scene 1, 640x384/25b vs a 1024-spp truth —
benchmarks/results/adaptive_probe.jsonl): with the dilated+blurred budget
map, adaptive beats uniform sampling by 17-69% in err^2 x time, growing
with the quality target; with the RAW split-buffer budgets it LOSES to
uniform (probe noise misallocates), which is why _dilate_blur is on by
default.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.camera import CameraConfig
from ..models.scene import Scene
from . import rng as rtrng
from .pallas_kernel import _bucket_order, _round_up, render_pallas
from .tracer import _linear_to_gamma

_LUM = (0.2126, 0.7152, 0.0722)


def _luminance(img: jnp.ndarray) -> jnp.ndarray:
    return (
        _LUM[0] * img[..., 0] + _LUM[1] * img[..., 1] + _LUM[2] * img[..., 2]
    )


class AdaptiveResult(NamedTuple):
    image: jnp.ndarray        # (H, W, 3), gamma per config
    spp_map: jnp.ndarray      # (H, W) int32 final per-pixel sample counts
    error_map: jnp.ndarray    # (H, W) relative split-buffer error estimate


def split_buffer_error(a_acc, b_acc, half) -> jnp.ndarray:
    """Relative per-pixel error from two half-buffers of raw radiance
    sums. ``half`` is the per-buffer sample count: a scalar, or an
    (H, W) per-pixel array (multi-round schedules)."""
    half = jnp.asarray(half, a_acc.dtype)
    if half.ndim:
        half = half[..., None]
    a = a_acc / half
    b = b_acc / half
    mean_lum = _luminance((a + b) * 0.5)
    diff_lum = jnp.abs(_luminance(a) - _luminance(b))
    # floor keeps dark pixels from demanding infinite relative precision
    return diff_lum / jnp.maximum(mean_lum, 0.05)


def _dilate_blur(err: jnp.ndarray) -> jnp.ndarray:
    """3x3 max (dilate) then 3x3 mean (blur) of a (H, W) error map.

    The split-buffer estimate at probe sample counts is itself very noisy
    — a firefly path the probe never sampled reads as converged. Sharing
    evidence across neighborhoods (noise sources are spatial: glass,
    silhouettes, caustics) makes the budget map robust: dilate so a noisy
    pixel protects its neighbors, blur to kill single-pixel flukes."""
    def shifts(x):
        p = jnp.pad(x, 1, mode="edge")
        h, w = x.shape
        return [p[i:i + h, j:j + w] for i in range(3) for j in range(3)]

    mx = err
    for s in shifts(err):
        mx = jnp.maximum(mx, s)
    return sum(shifts(mx)) / 9.0


def budgets_from_error(
    err: jnp.ndarray, base_spp, max_spp: int, tol: float,
    smooth: bool = True,
) -> jnp.ndarray:
    """Extra-sample budget per pixel under 1/sqrt(n) error scaling.
    ``base_spp`` is the current per-pixel count: a scalar, or an (H, W)
    array (multi-round schedules re-plan at heterogeneous counts)."""
    plan_err = _dilate_blur(err) if smooth else err
    counts = jnp.asarray(base_spp, jnp.float32)
    want = counts * (plan_err / tol) ** 2
    extra = jnp.clip(
        jnp.round(want - counts), 0, max_spp - counts
    ).astype(jnp.int32)
    return extra


@functools.lru_cache(maxsize=32)
def _make_phases(
    img_width, img_height, max_depth, base_spp, max_spp, tol, seed, gamma,
    ray_tile, mesh, interpret, rr_start, legacy_sky, rounds=1,
    stream_block=0, stream_lane_group=0,
):
    """Jitted phase programs for one adaptive config. Each phase holds at
    most ONE Mosaic kernel (TPU compile-service constraint); host glue
    (error map, budgets, bucket order, normalization) jits separately.

    ``stream_block`` > 0 selects the STREAMING-HBM kernel: each phase then
    takes a StreamScene instead of a Scene (the block size is part of the
    cached config; the matrix/bounds arrays are call-time inputs)."""
    half = base_spp // 2
    # multi-pixel lanes flatten the refine pass's extreme per-lane budget
    # variance (pixels_per_lane=8 measured best at high spp; K must keep
    # lanes*K <= padded pixels, trivially true here). Streamed scenes pay
    # O(N) block walks per wave, so the max-over-lanes tail is ~100x more
    # expensive there — K=32 is the measured stream knee (stream_kpl.jsonl)
    # and carries over to the adaptive phases (adaptive_stream.jsonl).
    kpl = 8 if not legacy_sky else 1
    if stream_block > 0:
        kpl = 32

    if stream_block > 0:
        from .pallas_stream import StreamScene, render_pallas_stream

        common_stream = dict(
            img_width=img_width, img_height=img_height,
            max_depth=max_depth, seed=seed, gamma=False,
            ray_tile=ray_tile, mesh=mesh, interpret=interpret,
            accumulate_only=True, rr_start=rr_start,
            pixels_per_lane=kpl, lane_group=stream_lane_group,
        )

        def make_phase(spp, soff):
            @jax.jit
            def run(sm, bd, cam_cfg, sample_budgets=None,
                    pixel_order=None):
                st = StreamScene(sm, bd, stream_block)
                return render_pallas_stream(
                    st, cam_cfg, samples_per_pixel=spp,
                    sample_offset=soff, sample_budgets=sample_budgets,
                    pixel_order=pixel_order, **common_stream,
                )

            return lambda st, cam, **kw: run(
                st.scene_mat, st.bounds, cam, **kw
            )
    else:
        common = dict(
            img_width=img_width, img_height=img_height,
            max_depth=max_depth, seed=seed, gamma=False,
            ray_tile=ray_tile, mesh=mesh, interpret=interpret,
            accumulate_only=True, rr_start=rr_start,
            legacy_sky=legacy_sky, pixels_per_lane=kpl,
        )

        def make_phase(spp, soff):
            return jax.jit(functools.partial(
                render_pallas, samples_per_pixel=spp,
                sample_offset=soff, **common,
            ))

    probe_a = make_phase(half, 0)
    probe_b = make_phase(half, half)

    num_pixels = img_width * img_height
    n_shards = 1
    if mesh is not None:
        import numpy as _np

        n_shards = int(_np.prod(list(mesh.shape.values())))
    padded = _round_up(num_pixels, kpl * ray_tile * n_shards)
    max_extra_cap = max_spp - base_spp

    @jax.jit
    def plan(a_acc, b_acc, counts):
        # the public helpers, at per-pixel counts (round 1: counts ==
        # base_spp everywhere, identical to the scalar form)
        err = split_buffer_error(
            a_acc, b_acc, jnp.maximum(counts // 2, 1)
        )
        extra = budgets_from_error(err, counts, max_spp, tol)
        if rounds > 1:
            # multi-round refines render as two half-budget launches so
            # the split buffers stay balanced — budgets must be even
            extra = (extra // 2) * 2
        flat = jnp.zeros((padded,), jnp.int32).at[:num_pixels].set(
            extra.reshape(-1)
        )
        # quantize to <=32 buckets (counting sort unrolls per bucket);
        # grouping lanes by budget keeps tiles retiring together — the
        # difficulty-sorted-tiling trick applied to sample counts
        n_buckets = 32
        q = (flat * n_buckets) // max(max_extra_cap, 1)
        order = _bucket_order(jnp.clip(q, 0, n_buckets - 1), n_buckets - 1)
        return err, extra, order, jnp.max(extra)

    # refine passes: static sample cap = max_spp - base_spp; the per-lane
    # budget row bounds the actual work, the cap only sizes the wave loop.
    # Each round r draws from its OWN disjoint sample-id window (offsets
    # below): the counter-based RNG needs distinct stream ids, not
    # contiguous ones, so per-round windows sidestep per-pixel offsets
    # (pixel p's next contiguous id would be base+extra_p — dynamic) while
    # keeping every sample an independent draw and the mean unbiased.
    if rounds == 1:
        refines = (make_phase(max(max_extra_cap, 1), base_spp),)
    else:
        w_cap = max(max_extra_cap, 2)
        refines = tuple(
            (
                make_phase(max(w_cap // 2, 1),
                           base_spp + (2 * r) * w_cap),
                make_phase(max(w_cap // 2, 1),
                           base_spp + (2 * r + 1) * w_cap),
            )
            for r in range(rounds)
        )

    @jax.jit
    def finish(a_acc, b_acc, counts):
        acc = a_acc + b_acc
        img = acc / counts[..., None].astype(acc.dtype)
        if gamma:
            img = _linear_to_gamma(img)
        return img, counts

    return probe_a, probe_b, plan, refines, finish


def render_adaptive(
    scene: Scene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    max_depth: int,
    *,
    base_spp: int = 16,
    max_spp: int = 256,
    tol: float = 0.05,
    seed: int = rtrng.DEFAULT_SEED,
    gamma: bool = True,
    ray_tile: int = 512,
    mesh=None,
    interpret: bool = False,
    rr_start: Optional[int] = None,
    legacy_sky: bool = False,
    rounds: int = 1,
    stream=None,
    stream_lane_group: int = 0,
) -> AdaptiveResult:
    """Adaptive render: probe at base_spp, refine noisy pixels to max_spp.

    ``rounds`` > 1 re-estimates the error after each refine pass and
    refines again (each round renders two half-budget launches from its
    own disjoint sample-id window so the split-buffer estimate stays
    balanced); a round with an all-zero budget stops early. The total
    per-pixel count is always capped at max_spp.

    NOT a single jit — phase programs with one host sync per round (the
    refine-skip decision) between; phases are cached across calls per
    config. base_spp must be even."""
    if base_spp % 2 != 0:
        raise ValueError("base_spp must be even (two half-buffers)")
    if max_spp < base_spp:
        # clip(x, 0, negative) returns the NEGATIVE bound: budgets would
        # silently go negative and corrupt the per-pixel counts
        raise ValueError(
            f"max_spp ({max_spp}) must be >= base_spp ({base_spp})"
        )
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if stream is not None:
        if legacy_sky:
            raise ValueError("streamed adaptive has no legacy_sky")
        scene = stream        # phases take the StreamScene
    probe_a, probe_b, plan, refines, finish = _make_phases(
        img_width, img_height, max_depth, base_spp, max_spp, tol, seed,
        gamma, ray_tile, mesh, interpret, rr_start, legacy_sky, rounds,
        stream_block=(stream.block if stream is not None else 0),
        stream_lane_group=stream_lane_group,
    )

    a_cum = probe_a(scene, cam_cfg)
    b_cum = probe_b(scene, cam_cfg)
    counts = jnp.full(a_cum.shape[:2], base_spp, jnp.int32)
    err = None
    for r in range(rounds):
        err, extra, order, max_extra = plan(a_cum, b_cum, counts)
        if int(max_extra) == 0:
            break
        if rounds == 1:
            c_acc = refines[0](
                scene, cam_cfg, sample_budgets=extra.reshape(-1),
                pixel_order=order,
            )
            a_cum = a_cum + c_acc
        else:
            ref_a, ref_b = refines[r]
            half_budget = (extra // 2).reshape(-1)
            a_cum = a_cum + ref_a(
                scene, cam_cfg, sample_budgets=half_budget,
                pixel_order=order,
            )
            b_cum = b_cum + ref_b(
                scene, cam_cfg, sample_budgets=half_budget,
                pixel_order=order,
            )
        counts = counts + extra
    img, counts = finish(a_cum, b_cum, counts)
    return AdaptiveResult(image=img, spp_map=counts, error_map=err)
