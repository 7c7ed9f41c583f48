"""Render engine: wavefront integrator, film, oracle."""

from .wavefront import PathState, render_frame, wavefront_step  # noqa: F401
from .film import to_u8, write_ppm, read_ppm  # noqa: F401
