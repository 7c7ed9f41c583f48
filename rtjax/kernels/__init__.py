"""Device kernels: ray-BVH traversal (XLA + Pallas variants) and oracles."""

from .traversal import traverse_closest, traverse_anyhit  # noqa: F401
from .brute import closest_brute, anyhit_brute  # noqa: F401
