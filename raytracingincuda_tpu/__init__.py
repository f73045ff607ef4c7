"""tpu-raytrace: a TPU-native differentiable Monte-Carlo path tracer.

Brand-new JAX/Pallas framework with the capabilities of the CUDA reference
``jilinzheng/RaytracingInCUDA`` (a *Ray Tracing in One Weekend* port): the
three hard-coded sphere scenes, lambertian/metal/dielectric materials,
defocus-blur camera, Monte-Carlo antialiasing, PPM output, benchmark and
image-diff tooling — re-designed as one dtype/layout-parametric wavefront
tracer that is differentiable and shards over TPU meshes.
"""

__version__ = "0.1.0"

from .models.camera import Camera, CameraConfig, initialize  # noqa: F401
from .models.scene import Scene, SceneParams, build_scene  # noqa: F401
from .ops.tracer import render  # noqa: F401
