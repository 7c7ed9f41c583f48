"""Render engine: wavefront integrator, film, checkpointing."""

from .wavefront import PathState, render_frame, wavefront_step  # noqa: F401
from .film import to_u8, write_ppm, read_ppm  # noqa: F401
from .checkpoint import render_checkpointed  # noqa: F401


def render(width, height, num_samples, max_bounces, camera, scene,
           seed: int = 1, **config_kwargs):
    """Reference-signature entry point (render.cuh:366-367).

    ``render(width, height, num_samples, max_bounces, camera, scene)`` ->
    framebuffer ``[height*width, 3]`` float32 (gamma-2 corrected), exactly
    the vector the reference fills.  Extra keyword args go to RenderConfig.
    """
    import jax
    from ..config import RenderConfig
    cfg = RenderConfig(width=width, height=height, num_samples=num_samples,
                       max_bounces=max_bounces, seed=seed, **config_kwargs)
    fb, _ = render_frame(scene, camera, cfg, jax.random.key(seed))
    return fb
