"""Differentiable rendering: gradients and the inverse-rendering train step.

A capability the CUDA reference does not have (BASELINE.json north star):
the rendered image is differentiable w.r.t. every continuous scene
parameter (sphere centers / radii / albedo / fuzz / IOR) and the camera
(vfov, lookfrom, lookat, vup, defocus, focus_dist).

Gradient convention: **detached sampler**.  All random draws and all
discrete decisions — the closest-hit argmin winner, the material branch,
the Schlick reflect/refract coin, metal absorption, lane liveness — are
treated as constants of the tangent trace.  Gradients flow through the
continuous quantities conditioned on those decisions: hit distance t via
the quadratic, hit point, normals, reflection/refraction directions,
attenuation products, and the sky blend.  Where the estimator is
non-differentiable (silhouette jumps) the gradient is simply the
conditional one — finite everywhere by construction (all kernel math is
NaN-safe on dead lanes).

"Training" for this framework is inverse rendering: fit scene/camera
parameters to a target image by gradient descent — the analog of a model
train step, with the scene replicated across the mesh and its gradients
all-reduced over ICI by XLA (overlapped with the backward trace).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.camera import CameraConfig
from ..models.scene import Scene, SceneParams
from . import tracer


def image_mse(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = img - target
    return jnp.mean(d * d)


def image_loss(img: jnp.ndarray, target: jnp.ndarray, loss: str = "mse",
               huber_delta: float = 1.0) -> jnp.ndarray:
    """The per-pixel loss family shared with the fused kernels
    (pallas_backward._fused_tile_kernel): 'mse' | 'l1' | 'huber' |
    'relmse' — same formulas, host-side, for the oracle/custom_vjp
    paths."""
    d = img - target
    if loss == "mse":
        return jnp.mean(d * d)
    if loss == "l1":
        return jnp.mean(jnp.abs(d))
    if loss == "huber":
        a = jnp.abs(d)
        return jnp.mean(jnp.where(a <= huber_delta, 0.5 * d * d,
                                  huber_delta * (a - 0.5 * huber_delta)))
    if loss == "relmse":
        return jnp.mean(d * d / (target * target + 1e-2))
    raise ValueError(f"unknown loss {loss!r}")


def make_loss_fn(
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    *,
    seed: int = 1227,
    dtype=jnp.float32,
    chunk_pixels: Optional[int] = None,
    pixel_sharding=None,
    remat: bool = True,
    gamma: bool = False,
    impl: str = "oracle",
    pixel_order=None,
    mesh=None,
    interpret: Optional[bool] = None,
    rr_start=None,
    ray_tile: Optional[int] = None,
    bwd_ray_tile: Optional[int] = None,
    sweep: Optional[str] = None,
    window: int = 0,
    pixels_per_lane: Optional[int] = None,
    loss: str = "mse",
    huber_delta: float = 1.0,
):
    """loss(params, cam_cfg, statics, target) -> scalar.

    Loss is computed in linear radiance space by default (gamma=False):
    sqrt-gamma has unbounded slope at zero and black pixels are common
    (absorbed rays return exact 0, camera.h:117).

    ``impl='pallas'`` uses the Pallas kernel for the forward pass with
    the winner-replay Pallas backward (ops/pallas_kernel.
    make_diff_render). ``rr_start`` selects the Russian-roulette
    estimator for BOTH impls; ``ray_tile`` / ``bwd_ray_tile`` /
    ``sweep`` / ``window`` / ``pixels_per_lane`` are the Pallas kernel
    knobs (forward tile; backward tile / sweep family / parked-wave
    window / K-pixel lanes) — rejected with an error under
    impl='oracle', which has no tiles to tune.
    """
    if impl != "pallas":
        _unsupported = {
            "ray_tile": ray_tile, "bwd_ray_tile": bwd_ray_tile,
            "sweep": sweep, "window": window or None,
            "pixels_per_lane": pixels_per_lane,
        }
        _set = [k for k, v in _unsupported.items() if v is not None]
        if _set:
            raise ValueError(
                f"impl={impl!r} does not support {_set} — these tune the "
                "Pallas kernels; use impl='pallas' or impl='fused'"
            )

    def loss_fn(params: SceneParams, cam_cfg: CameraConfig,
                mat_type, active, target):
        if impl == "pallas":
            from .pallas_kernel import DEFAULT_RAY_TILE, make_diff_render

            interp = (jax.default_backend() == "cpu"
                      if interpret is None else interpret)
            f = make_diff_render(
                mat_type, active, img_width, img_height,
                samples_per_pixel, max_depth,
                seed=seed, gamma=gamma, pixel_order=pixel_order,
                mesh=mesh, interpret=interp,
                oracle_chunk_pixels=chunk_pixels,
                oracle_pixel_sharding=pixel_sharding,
                rr_start=rr_start,
                ray_tile=ray_tile or DEFAULT_RAY_TILE,
                bwd_ray_tile=bwd_ray_tile,
                bwd_sweep=sweep, bwd_window=window,
                bwd_pixels_per_lane=pixels_per_lane,
            )
            img = f(params, cam_cfg)
        else:
            scene = Scene(params=params, mat_type=mat_type, active=active)
            img = tracer.render(
                scene, cam_cfg, img_width, img_height,
                samples_per_pixel, max_depth,
                seed=seed, dtype=dtype, chunk_pixels=chunk_pixels,
                pixel_sharding=pixel_sharding, gamma=gamma, remat=remat,
                rr_start=rr_start,
            )
        return image_loss(img, target, loss, huber_delta)

    return loss_fn


def render_grads(
    scene: Scene,
    cam_cfg: CameraConfig,
    target: jnp.ndarray,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    **kw,
):
    """(loss, (scene-param grads, camera grads)) for one target image."""
    loss_fn = make_loss_fn(
        img_width, img_height, samples_per_pixel, max_depth, **kw
    )
    return jax.value_and_grad(loss_fn, argnums=(0, 1))(
        scene.params, cam_cfg, scene.mat_type, scene.active, target
    )


def front_to_back_border(stream, cam_cfg: CameraConfig,
                         img_width: int, img_height: int) -> jnp.ndarray:
    """Front-to-back block visit order for ``build_stream_arrays``.

    Returns CANONICAL (Morton block order) indices sorted by camera
    distance — the order the stream walk visits blocks so near geometry
    tightens ``t_best`` early and far blocks cull (speed-only; results
    are order-invariant). The prepared ``stream.bounds`` rows may
    already be camera-permuted (prepare_stream_scene ``camdist_from``),
    so distances computed on them must be mapped back through bounds
    col 4 (each row's first matrix row / block = its canonical block
    index) before they can index the canonically rebuilt bounds —
    without that, a camdist-prepared stream got a scrambled visit order
    and silently lost its culling benefit (ADVICE r4)."""
    import numpy as np

    from ..models.camera import initialize as _init

    bn = np.asarray(stream.bounds)
    if bn.shape[0] <= 1:
        return jnp.arange(bn.shape[0], dtype=jnp.int32)
    cc = _init(cam_cfg, img_width, img_height).center
    p = np.array([float(cc.x), float(cc.y), float(cc.z)])
    d = np.sqrt(((bn[:, 0:3] - p) ** 2).sum(1)) - bn[:, 3]
    d = np.where(bn[:, 3] > 0.0, d, np.inf)
    order = np.argsort(d, kind="stable")
    canon = np.rint(bn[:, 4] / stream.block).astype(np.int64)
    return jnp.asarray(canon[order], jnp.int32)


class TrainState(NamedTuple):
    params: SceneParams
    opt_state: optax.OptState
    step: jnp.ndarray


def make_train_step(
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-2,
    trainable=None,
    **kw,
):
    """Build (init_fn, step_fn) for inverse rendering.

    step_fn(state, cam_cfg, mat_type, active, target) -> (state, loss).
    Jit it (optionally with shardings) — scene-parameter gradients are
    replicated-summed across the mesh by GSPMD automatically.

    ``trainable``: optional pytree of bools matching SceneParams selecting
    which parameter groups receive updates (e.g. albedo-only fits —
    geometry gradients at silhouettes are the noisiest estimator and often
    excluded early in an inverse-rendering schedule).
    """
    opt = optimizer or optax.adam(learning_rate)
    if trainable is not None:
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable
        )
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )

    def init_fn(params: SceneParams) -> TrainState:
        return TrainState(
            params=params,
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    if kw.get("impl") == "fused":
        # Fused MSE value-and-grad kernel (ops/pallas_backward): render,
        # loss, and cotangents from ONE Mosaic kernel, so the whole step
        # (including the optimizer update) is one jittable program — the
        # two-program custom_vjp path cannot be jitted end-to-end under
        # the compile service's one-kernel-per-program limit.
        from .pallas_backward import chain_to_params, mse_train_pallas

        gamma = kw.get("gamma", False)
        seed = kw.get("seed", 1227)
        mesh = kw.get("mesh")
        interpret = kw.get("interpret")
        if interpret is None:  # Mosaic needs a TPU; interpret elsewhere
            interpret = jax.default_backend() == "cpu"

        def fused_step(state: TrainState, cam_cfg: CameraConfig,
                       mat_type, active, target):
            scene = Scene(params=state.params, mat_type=mat_type,
                          active=active)
            loss, _img, d_sm, d_cr = mse_train_pallas(
                scene, cam_cfg, target, img_width, img_height,
                samples_per_pixel, max_depth, seed=seed, gamma=gamma,
                pixel_order=kw.get("pixel_order"), mesh=mesh,
                interpret=interpret,
                ray_tile=kw.get("ray_tile"),
                park_residuals=kw.get("park_residuals"),
                sweep=kw.get("sweep"), window=kw.get("window", 0),
                rr_start=kw.get("rr_start"),
                pixels_per_lane=kw.get("pixels_per_lane"),
                loss=kw.get("loss", "mse"),
                huber_delta=kw.get("huber_delta", 1.0),
            )
            d_params, _d_cam = chain_to_params(
                d_sm, d_cr, state.params, cam_cfg, mat_type, active,
                img_width, img_height,
            )
            updates, opt_state = opt.update(
                d_params, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        return init_fn, fused_step

    if kw.pop("park_residuals", None) is not None:
        raise ValueError(
            "park_residuals tunes the fused MSE kernel only — use "
            "impl='fused' (the custom_vjp paths have no residual parking)"
        )
    loss_fn = make_loss_fn(
        img_width, img_height, samples_per_pixel, max_depth, **kw
    )

    def step_fn(state: TrainState, cam_cfg: CameraConfig,
                mat_type, active, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, cam_cfg, mat_type, active, target
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, step_fn


def make_stream_train(
    stream,
    img_width: int,
    img_height: int,
    samples_per_pixel: int,
    max_depth: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-2,
    trainable=None,
    seed: int = 1227,
    lane_group: int = 0,
    fused: bool = True,
    mesh=None,
    interpret: Optional[bool] = None,
    loss: str = "mse",
    huber_delta: float = 1.0,
):
    """Inverse rendering for STREAMING-HBM scenes (beyond-VMEM scale).

    Returns (init_fn, step_fn); step_fn(state, cam_cfg, mat_type,
    active, target) -> (state, loss), like make_train_step.

    ``fused=True`` (default): the whole value_and_grad + optimizer
    update is ONE jitted program around mse_train_stream. It became
    the faster option once the fused render pass gained regeneration
    plus multi-pixel lanes (round 3): 1611 vs 1860 ms/step at 10k
    spheres 640x384x4spp/d6 (stream_wave.jsonl train10k rows; round 2
    had the opposite order — the old fused render walked the full
    spp x depth per lane while the two-program forward regenerated).
    ``fused=False``: forward render and gradient sweep as separate
    Mosaic kernels (one kernel per program under the compile service,
    UPSTREAM_ISSUES.md #3), composed eagerly; identical losses and
    gradients up to reduce association.

    The Morton permutation and block assignment are FROZEN from the
    ``stream`` argument (prepare_stream_scene); each step rebuilds the
    packed matrix and block bounds on device from the current params
    (build_stream_arrays) — no host re-sort, no tunnel re-upload. A
    drifted geometry only loosens block coherence (weaker culling);
    re-prepare occasionally if spheres migrate far. Loss is MSE in
    LINEAR radiance (gamma off), matching make_loss_fn(gamma=False).
    """
    from .pallas_backward import chain_to_params
    from .pallas_stream import (
        StreamScene, build_stream_arrays, render_pallas_stream,
    )
    from .pallas_stream_backward import (
        mse_train_stream, render_pallas_stream_grads,
        stream_grads_to_scene_mat,
    )

    opt = optimizer or optax.adam(learning_rate)
    if trainable is not None:
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable
        )
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    block = stream.block
    n_pad = stream.scene_mat.shape[0]
    perm = stream.perm

    def init_fn(params: SceneParams) -> TrainState:
        return TrainState(
            params=params,
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    border_cache: dict = {}

    def _frozen_border(cam_cfg):
        """Front-to-back block visit order, frozen from the first
        step's camera (host numpy on the PREPARED bounds; speed-only —
        camera/geometry drift just loosens the ordering, exactly like
        the frozen Morton perm). Passed into the jitted step as data,
        so one compiled program serves any border."""
        if "b" not in border_cache:
            border_cache["b"] = front_to_back_border(
                stream, cam_cfg, img_width, img_height)
        return border_cache["b"]

    def _stream_of(params, mat_type, active, border=None):
        sm, bounds = build_stream_arrays(
            Scene(params=params, mat_type=mat_type, active=active),
            perm, block, n_pad, border=border,
        )
        return StreamScene(sm, bounds, block, perm)

    def _apply(d_params, params, opt_state):
        updates, opt_state = opt.update(d_params, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    if fused:
        @jax.jit
        def fused_kernel_step(params, mat_type, active, cam_cfg, target,
                              opt_state, border):
            st = _stream_of(params, mat_type, active, border)
            loss_v, d_stream, d_cr = mse_train_stream(
                st, cam_cfg, target, img_width, img_height,
                samples_per_pixel, max_depth, seed=seed,
                lane_group=lane_group, mesh=mesh, interpret=interpret,
                loss=loss, huber_delta=huber_delta,
            )
            d_sm = stream_grads_to_scene_mat(
                d_stream, st, mat_type.shape[0]
            )
            d_params, _d_cam = chain_to_params(
                d_sm, d_cr, params, cam_cfg, mat_type, active,
                img_width, img_height,
            )
            new_params, opt_state = _apply(d_params, params, opt_state)
            return new_params, opt_state, loss_v

        def fused_step(state: TrainState, cam_cfg: CameraConfig,
                       mat_type, active, target):
            params, opt_state, loss = fused_kernel_step(
                state.params, mat_type, active, cam_cfg, target,
                state.opt_state, _frozen_border(cam_cfg),
            )
            return TrainState(params, opt_state, state.step + 1), loss

        return init_fn, fused_step

    @jax.jit
    def fwd(params, mat_type, active, cam_cfg, border):
        # return the rebuilt stream arrays too: the backward program
        # takes them as inputs instead of rebuilding the O(N) packed
        # matrix + block bounds a second time per step
        st = _stream_of(params, mat_type, active, border)
        img = render_pallas_stream(
            st, cam_cfg,
            img_width, img_height, samples_per_pixel, max_depth,
            seed=seed, gamma=False, lane_group=lane_group, mesh=mesh,
            interpret=interpret,
        )
        return img, st.scene_mat, st.bounds

    @jax.jit
    def bwd(params, sm, bounds, mat_type, active, cam_cfg, img, target,
            opt_state):
        st = StreamScene(sm, bounds, block, perm)
        # dL/d(acc) for the selected per-pixel loss, chained through
        # the 1/spp scale (round-5 review: the fused and two-program
        # paths must train the SAME objective for any `loss`) —
        # jax.grad of the shared image_loss keeps the formulas single-
        # sourced with the fused kernels' in-kernel derivations
        loss_v, g_img = jax.value_and_grad(
            lambda im: image_loss(im, target, loss, huber_delta))(img)
        g_acc = g_img / samples_per_pixel
        d_stream, d_cr = render_pallas_stream_grads(
            st, cam_cfg, g_acc, img_width, img_height,
            samples_per_pixel, max_depth, seed=seed,
            lane_group=lane_group, mesh=mesh, interpret=interpret,
        )
        d_sm = stream_grads_to_scene_mat(
            d_stream, st, mat_type.shape[0]
        )
        d_params, _d_cam = chain_to_params(
            d_sm, d_cr, params, cam_cfg, mat_type, active,
            img_width, img_height,
        )
        updates, opt_state = opt.update(d_params, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, opt_state, loss_v

    def step_fn(state: TrainState, cam_cfg: CameraConfig,
                mat_type, active, target):
        img, sm, bounds = fwd(state.params, mat_type, active, cam_cfg,
                              _frozen_border(cam_cfg))
        params, opt_state, loss = bwd(
            state.params, sm, bounds, mat_type, active, cam_cfg, img,
            target, state.opt_state,
        )
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, step_fn
