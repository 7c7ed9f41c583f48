"""Multi-chip scaling: sample-space data parallelism over a device mesh."""

from .sharding import make_mesh, render_frame_sharded  # noqa: F401
from .multihost import init_multihost, process_info  # noqa: F401
