"""Camera-POSE recovery: an edge-aware smoothed-visibility surrogate.

Why this module exists. The production gradient estimator (ops/grad.py,
ops/pallas_backward.py) follows the detached-sampler convention: discrete
events — which sphere wins the closest-hit, hit vs miss — are constants
of the tangent trace. Those gradients are exact for *interior* shading
terms (scene albedo/fuzz/IOR recovery converges, tests/test_grad.py) but
carry NO boundary term: a pixel whose content changes because an edge
sweeps across it under camera motion contributes zero gradient. A pose
objective is *dominated* by such edge terms, so MSE descent on the
path-traced image random-walks (measured in round 1; docs/ROADMAP.md
"Camera-POSE recovery").

The differentiable-rendering literature fixes this by making visibility
itself smooth — soft rasterization (Liu et al. 2019), reparameterized /
edge-sampling integrators (Li et al. 2018, Loubet et al. 2019). The
TPU-native shape of that idea, for a sphere scene, is closed-form: a
sphere's silhouette is an exact circle, so the *signed distance of a ray
to the silhouette* is one subtraction — ``r - b`` where ``b`` is the
ray-center perpendicular distance — and a sigmoid of it is a smooth
visibility with exactly the boundary derivative the detached estimator
lacks. No edge sampling, no auxiliary rays: pure (N, R) vectorized math,
the same broadcast shape as the hit test (ops/intersect.py), MXU/VPU
friendly and trivially jit/vmap/shard-able.

``soft_render`` is a deterministic first-hit shader (one center ray per
pixel, no RNG): per-sphere soft visibility x soft depth-ordering
(softmin over closest-approach depth), Lambert-ish normal shading, sky
background. It is NOT the path-traced estimator — it is the smooth
surrogate OBJECTIVE for pose. The pipeline is two-stage:

1. ``recover_pose``: Adam on the surrogate under an image PYRAMID
   (pooling both sides — pooling is linear, so the true pose stays the
   minimum while the basin widens). Self-consistent (soft target,
   ``objective="mse"``): converges from >=0.7-world-unit pose errors to
   ~0.05 (analysis-by-synthesis). Against a real path-traced target
   (``objective="edges"``): a coarse-capture stage — lands within ~0.8
   units wherever silhouettes still overlap; use only for LARGE errors.
2. ``refine_pose_fd``: central finite differences on the REAL
   path-traced MSE — valid because renders are bit-deterministic
   (counter RNG), making the objective noise-free, and FD (unlike the
   detached analytic gradient) captures the boundary terms. 6 pose
   dims = 12 renders/step. Measured (96x58x16spp/d8, scene 2): 0.3
   world units off -> 0.0075 / 0.02 degrees in 60 steps; 0.76 off ->
   0.04. This is the real-target workhorse (examples/pose_recovery.py).

Scope notes, stated honestly: the surrogate ignores defocus blur and
secondary bounces (reflections/refraction move with pose too — their
edge terms are not modeled; at this scene scale the first-hit term
dominates). Dielectric spheres shade as glass-grey. These are surrogate
approximations, not claims about the estimator.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.camera import CameraConfig, initialize
from ..models.scene import DIELECTRIC, Scene
from ..ops import vec
from ..ops.tracer import SKY_BLUE, SKY_WHITE
from ..ops.vec import Vec3

# Background pseudo-depth for the soft depth ordering: beyond every
# sphere's closest approach in the book scenes (camera ~25 units out).
T_BG = 60.0


class SoftConfig(NamedTuple):
    """Smoothness knobs (world units are the scene's: spheres r=0.2-1000).

    tau: ANGULAR silhouette softness — the sigmoid transition band
         around the silhouette circle is ``tau * depth`` world units,
         i.e. roughly constant in PIXELS (1 px ~ 0.01 rad at the
         reference 20-degree/0.4k-px camera). Radius-proportional bands
         fail here: the r=1000 ground sphere would get a 50-unit band
         that is still half-visible at the horizon where rays cross
         behind the camera, making the loss discontinuous (measured).
         Behind-camera visibility itself is closed by a smooth depth
         gate (sigmoid over proj, ~0.1 units wide) — no hard switch
         anywhere in the weights.
    lam: depth-ordering temperature (world units) for the softmin over
         closest-approach depth; smaller = harder occlusion.
    """

    tau: float = 0.02
    lam: float = 0.15


def _primary_dirs(cam_cfg: CameraConfig, img_width: int, img_height: int):
    """Center-of-pixel primary rays (no jitter, no defocus): (R,) Vec3s."""
    if img_width * img_height >= 2 ** 24:
        # f32 pixel ids lose integers above 2^24 — consecutive pixels
        # would collapse silently (same guard as pallas_kernel's
        # _lane_setup)
        raise ValueError(
            f"soft_render supports < 2^24 pixels; got "
            f"{img_width}x{img_height}"
        )
    cam = initialize(cam_cfg, img_width, img_height)
    ids = jnp.arange(img_width * img_height, dtype=jnp.float32)
    fi = jnp.mod(ids, float(img_width))
    fj = jnp.floor(ids / float(img_width))
    pixel = (
        cam.pixel00_loc
        + cam.pixel_delta_u * fi
        + cam.pixel_delta_v * fj
    )
    origin = Vec3(
        jnp.broadcast_to(cam.center.x, fi.shape),
        jnp.broadcast_to(cam.center.y, fi.shape),
        jnp.broadcast_to(cam.center.z, fi.shape),
    )
    return origin, pixel - origin


def soft_render(
    scene: Scene,
    cam_cfg: CameraConfig,
    img_width: int,
    img_height: int,
    cfg: SoftConfig = SoftConfig(),
) -> jnp.ndarray:
    """Smoothed-visibility first-hit render: (H, W, 3) in [0, 1].

    Differentiable w.r.t. camera config AND scene params, with nonzero
    silhouette (boundary) gradients — the term the detached-sampler
    path-tracer estimator is missing by construction."""
    o, d = _primary_dirs(cam_cfg, img_width, img_height)
    dhat = vec.unit(d)

    p = scene.params
    # spheres on sublanes (N, 1), rays on lanes (1, R) — the hit-test
    # broadcast layout (ops/intersect.py)
    cx, cy, cz = (p.center.x[:, None], p.center.y[:, None],
                  p.center.z[:, None])
    r = vec.safe_radius(jnp.abs(p.radius))[:, None]
    active = (scene.active > 0.5)[:, None]

    ocx = cx - o.x[None, :]
    ocy = cy - o.y[None, :]
    ocz = cz - o.z[None, :]
    # depth of closest approach along the unit ray
    proj = ocx * dhat.x[None, :] + ocy * dhat.y[None, :] \
        + ocz * dhat.z[None, :]                                   # (N, R)
    oc2 = ocx * ocx + ocy * ocy + ocz * ocz
    b2 = jnp.maximum(oc2 - proj * proj, 0.0)
    b = jnp.sqrt(b2 + 1e-12)  # perpendicular ray-center distance

    # signed silhouette distance in units of the transition band:
    # >0 inside the silhouette circle, <0 outside. d(sdf)/d(pose)
    # through b IS the boundary derivative. Band = tau * depth
    # (angular; see SoftConfig.tau for why not tau * r).
    band = cfg.tau * jnp.maximum(proj, 1.0)
    sdf = (r - b) / band
    logit_vis = jax.nn.log_sigmoid(sdf)
    # spheres behind / right at the camera fade out SMOOTHLY (a hard
    # proj > eps switch would leave a loss cliff for 0 < proj < 1 where
    # the band floor keeps the sigmoid unsaturated — a camera passing
    # within ~1 unit of a sphere would see its weight snap): sigmoid
    # gate over depth, ~0.1 world units wide, fully closed by proj <= 0
    logit_vis = logit_vis + jax.nn.log_sigmoid((proj - 0.1) * 50.0)
    neg_inf = jnp.float32(-1e30)
    logits = jnp.where(active,
                       logit_vis - proj / cfg.lam, neg_inf)       # (N, R)
    bg_logit = jnp.full((1, logits.shape[1]), -T_BG / cfg.lam)
    all_logits = jnp.concatenate([logits, bg_logit], axis=0)
    w = jax.nn.softmax(all_logits, axis=0)                    # (N+1, R)

    # per-sphere shading: Lambert against a fixed key light + ambient,
    # on the surface normal at the (smoothed) first root
    thick = jnp.sqrt(jnp.maximum(r * r - b2, 0.0) + 1e-12)
    t_surf = proj - thick
    nx = (o.x[None, :] + t_surf * dhat.x[None, :] - cx) / r
    ny = (o.y[None, :] + t_surf * dhat.y[None, :] - cy) / r
    nz = (o.z[None, :] + t_surf * dhat.z[None, :] - cz) / r
    lx, ly, lz = 0.4082483, 0.8164966, 0.4082483  # unit key light
    lambert = jnp.clip(nx * lx + ny * ly + nz * lz, 0.0, 1.0)
    shade = 0.35 + 0.65 * lambert                                 # (N, R)
    glass = (scene.mat_type == DIELECTRIC)[:, None]
    ar = jnp.where(glass, 0.9, p.albedo.x[:, None]) * shade
    ag = jnp.where(glass, 0.9, p.albedo.y[:, None]) * shade
    ab = jnp.where(glass, 0.9, p.albedo.z[:, None]) * shade

    a = 0.5 * (dhat.y + 1.0)
    sky = [(1.0 - a) * wht + a * blu
           for wht, blu in zip(SKY_WHITE, SKY_BLUE)]

    w_s, w_bg = w[:-1], w[-1]
    img_r = jnp.sum(w_s * ar, axis=0) + w_bg * sky[0]
    img_g = jnp.sum(w_s * ag, axis=0) + w_bg * sky[1]
    img_b = jnp.sum(w_s * ab, axis=0) + w_bg * sky[2]
    return jnp.stack([img_r, img_g, img_b],
                     axis=-1).reshape(img_height, img_width, 3)


class PoseState(NamedTuple):
    lookfrom: jnp.ndarray  # (3,)
    lookat: jnp.ndarray    # (3,)


def _cam_with_pose(base: CameraConfig, pose: PoseState) -> CameraConfig:
    return base._replace(
        lookfrom=Vec3(pose.lookfrom[0], pose.lookfrom[1], pose.lookfrom[2]),
        lookat=Vec3(pose.lookat[0], pose.lookat[1], pose.lookat[2]),
    )


def pose_of(cam_cfg: CameraConfig) -> PoseState:
    lf, la = cam_cfg.lookfrom, cam_cfg.lookat
    return PoseState(jnp.stack([lf.x, lf.y, lf.z]).astype(jnp.float32),
                     jnp.stack([la.x, la.y, la.z]).astype(jnp.float32))


def _avg_pool(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k average pooling (crops the ragged edge)."""
    if k == 1:
        return img
    h, w, c = img.shape
    h2, w2 = (h // k) * k, (w // k) * k
    return img[:h2, :w2].reshape(h2 // k, k, w2 // k, k, c).mean((1, 3))


def recover_pose(
    scene: Scene,
    target: jnp.ndarray,
    init_cam: CameraConfig,
    img_width: int,
    img_height: int,
    *,
    steps: int = 300,
    lr: float = 3e-2,
    soft: SoftConfig = SoftConfig(),
    pyramid: tuple = (4, 2, 1),
    optimize_lookat: bool = True,
    objective: str = "mse",
):
    """Gradient-descent camera-pose recovery against a target image.

    ``target``: an (H, W, 3) image. With a ``soft_render`` target (the
    self-consistent analysis-by-synthesis setting) use
    ``objective="mse"``. With a REAL path-traced target use
    ``objective="edges"``: the surrogate's shading differs from the
    path tracer's (no reflections/shadows, linear vs gamma), so raw
    photometric MSE has its minimum off the true pose (measured:
    descent walks 0.3 -> 2.6 world units away); comparing image-GRADIENT
    maps of the gamma-mapped surrogate against the target keeps only
    the silhouette signal, which the two renderers share — measured to
    land within ~0.8 units, inside ``refine_pose_fd``'s basin.

    The candidate renders at ONE fixed tau — the SAME smoothing as the
    target. Coarse-to-fine must NOT anneal tau against a fixed target:
    a blurrier candidate scores better by shrinking objects, so the
    loss minimum moves off the true pose (measured: rendering
    candidates at tau=0.08 against a tau=0.02 target makes loss
    DECREASE as the camera retreats from truth). Instead the pyramid
    applies the same average-pooling to BOTH images — a linear
    operator, so the true pose stays the global minimum at every stage
    while pooling widens the capture basin.

    Returns (PoseState, loss_history list)."""
    import optax

    if objective not in ("mse", "edges"):
        raise ValueError(f"objective must be 'mse' or 'edges': {objective}")
    pose = pose_of(init_cam)
    target = jnp.asarray(target, jnp.float32)

    def _edge_maps(img):
        return img[:, 1:] - img[:, :-1], img[1:, :] - img[:-1, :]

    losses = []
    stage_lr = lr
    for k in pyramid:
        pooled_target = _avg_pool(target, k)

        def loss_fn(ps, k=k, tgt=pooled_target):
            cam = _cam_with_pose(init_cam, ps)
            img = soft_render(scene, cam, img_width, img_height, soft)
            if objective == "edges":
                # floor, not 0: sqrt'(0) = inf would leak inf/NaN into
                # the pose gradient on exactly-black pixels
                img = jnp.sqrt(jnp.maximum(img, 1e-8))  # target is gamma
                ix, iy = _edge_maps(_avg_pool(img, k))
                tx, ty = _edge_maps(tgt)
                return (jnp.mean((ix - tx) ** 2)
                        + jnp.mean((iy - ty) ** 2))
            return jnp.mean((_avg_pool(img, k) - tgt) ** 2)

        opt = optax.adam(stage_lr)

        @jax.jit
        def step(ps, opt_state, loss_fn=loss_fn, opt=opt):
            loss, g = jax.value_and_grad(loss_fn)(ps)
            if not optimize_lookat:
                g = g._replace(lookat=jnp.zeros_like(g.lookat))
            upd, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(ps, upd), opt_state, loss

        opt_state = opt.init(pose)
        for _ in range(steps // len(pyramid)):
            pose, opt_state, loss = step(pose, opt_state)
            losses.append(float(loss))
        stage_lr *= 0.5
    return pose, losses


def refine_pose_fd(
    scene: Scene,
    target: jnp.ndarray,
    init_cam: CameraConfig,
    img_width: int,
    img_height: int,
    *,
    samples_per_pixel: int = 16,
    max_depth: int = 8,
    steps: int = 60,
    lr: float = 2e-2,
    eps: float = 2e-2,
    optimize_lookat: bool = True,
    render_fn=None,
    log_every: int = 5,
):
    """Pose refinement on the REAL path-traced MSE via central finite
    differences.

    Why FD here is principled, not a fallback: the renderer is
    bit-deterministic given (config, seed) — counter-based RNG, no
    state — so the MSE against a fixed target is a NOISE-FREE function
    of the pose, and central differences capture the boundary
    (edge-sweep) terms the detached-sampler analytic gradient provably
    drops. Pose is 6-dimensional, so one FD step costs 12 renders —
    nothing at recovery resolutions. Measured (96x58x16spp/d8, scene 2):
    from 0.76 world units off, 60 steps converge to 0.04 lookfrom /
    0.08 degree view error at MSE 4.7e-5.

    Use after ``recover_pose`` (the soft surrogate supplies the wide
    capture basin; this stage closes the surrogate-vs-path-traced
    shading gap). ``render_fn(cam_cfg) -> (H, W, 3)``: override the
    forward model (defaults to the jnp oracle; pass a Pallas-kernel
    closure on TPU).

    ``log_every``: the loss history costs ONE extra render per recorded
    point (central FD never evaluates the center), so it is sampled
    every ``log_every`` steps plus the final step — 12/5 + 1 renders of
    logging across the default 60 steps instead of 60.

    Returns (PoseState, mse_history list — sampled, last entry = final
    MSE)."""
    import optax

    from . import tracer

    if render_fn is None:
        rf = jax.jit(lambda c: tracer.render(
            scene, c, img_width, img_height, samples_per_pixel, max_depth,
        ))
    else:
        rf = render_fn
    target = jnp.asarray(target, jnp.float32)

    def mse(x):
        ps = PoseState(x[:3], x[3:])
        return float(jnp.mean((rf(_cam_with_pose(init_cam, ps))
                               - target) ** 2))

    pose0 = pose_of(init_cam)
    x = jnp.concatenate([pose0.lookfrom, pose0.lookat])
    n_free = 6 if optimize_lookat else 3
    opt = optax.adam(lr)
    opt_state = opt.init(x)
    history = []
    import numpy as np

    for it in range(steps):
        g = np.zeros(6, np.float32)
        for k in range(n_free):
            e = jnp.zeros(6).at[k].set(eps)
            g[k] = (mse(x + e) - mse(x - e)) / (2.0 * eps)
        upd, opt_state = opt.update(jnp.asarray(g), opt_state)
        x = optax.apply_updates(x, upd)
        if it == steps - 1 or (log_every and it % log_every == 0):
            history.append(mse(x))
    return PoseState(x[:3], x[3:]), history
