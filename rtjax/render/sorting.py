"""Ray sorting for packet coherence.

The reference relies on CUDA's SIMT model to tolerate divergent rays; the
TPU packet kernels instead want the rays of one tile to traverse similar BVH
subtrees.  Sorting the pool by (direction octant, origin Morton code) before
each traversal groups coherent rays into tiles and pushes inactive lanes to
the back — where whole tiles become empty and their kernel instances exit on
the first step, which is the packet-era equivalent of the reference's CUB
stream compaction (render.cuh:348-364).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _part1by2(x):
    """Spread 10 bits to every 3rd bit (standard Morton magic)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_keys(origin, direction, lo, hi, active):
    """int32 sort keys: 3-bit octant | 27-bit origin Morton (9 bits/axis).

    Inactive lanes get the maximum key so they sort to the back.
    """
    g = (origin - lo) / jnp.maximum(hi - lo, 1e-30)
    cell = jnp.clip((g * 511.0), 0.0, 511.0).astype(jnp.int32)
    m = (_part1by2(cell[:, 0]) | (_part1by2(cell[:, 1]) << 1)
         | (_part1by2(cell[:, 2]) << 2))
    octant = ((direction[:, 0] < 0).astype(jnp.int32)
              | ((direction[:, 1] < 0).astype(jnp.int32) << 1)
              | ((direction[:, 2] < 0).astype(jnp.int32) << 2))
    key = (octant << 27) | m
    return jnp.where(active, key, jnp.int32(0x7FFFFFFF))


def ray_sort_keys_prim(prim, direction, active):
    """Tree-locality sort keys: 3-bit octant | origin primitive index.

    For bounce rays the triangle they left (leaf order == tree order) is a
    sharper locality signal than a quantized Morton code; camera rays
    (prim = -1) keep their generation order via the stable sort.
    """
    octant = ((direction[:, 0] < 0).astype(jnp.int32)
              | ((direction[:, 1] < 0).astype(jnp.int32) << 1)
              | ((direction[:, 2] < 0).astype(jnp.int32) << 2))
    key = (octant << 24) | jnp.clip(prim, 0, (1 << 24) - 1)
    return jnp.where(active, key, jnp.int32(0x7FFFFFFF))


def sort_permutation(keys):
    """Stable argsort + inverse (for scattering results back)."""
    perm = jnp.argsort(keys, stable=True)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return perm, inv
