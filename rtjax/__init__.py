"""rtjax — a TPU-native wavefront path tracer built on JAX/XLA/Pallas.

Brand-new framework with the capabilities of the CUDA reference
``lashhw/rtcuda`` (see SURVEY.md): a wavefront path tracer with NEE + MIS +
Russian roulette over a sweep-SAH BVH, matte/mirror/glass materials, point
and area lights, a pinhole camera, PLY loading and PPM output — redesigned
for TPUs (SoA arrays, masked wavefronts, deterministic scatter-add
accumulation, ``shard_map`` scaling across chips).
"""

from .config import RenderConfig
from .scene import (Camera, Mesh, Scene, SceneBuilder, Transform, load_ply,
                    rotate, scale, translate)
from .render import render, render_frame, write_ppm
from . import constants

__version__ = "0.1.0"

__all__ = [
    "RenderConfig", "Camera", "Mesh", "Scene", "SceneBuilder", "Transform",
    "load_ply", "rotate", "scale", "translate", "render", "render_frame",
    "write_ppm",
    "constants",
]
