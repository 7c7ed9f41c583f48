"""Brute-force all-triangles intersection — test oracle for the BVH kernels.

No reference-counterpart: the reference has no tests (SURVEY.md §4); this is
the trivially-correct baseline the property tests compare traversal against.
Cost is O(rays x triangles), so use only on small scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.geometry import Triangles, intersect_triangle


@jax.jit
def closest_brute(tris: Triangles, origin, direction, tmax, active):
    """Closest hit over all triangles. Same returns as traverse_closest."""
    def one(o, d, tm):
        h, t, u, v = intersect_triangle(o[None, :], d[None, :], tm,
                                        tris.p0, tris.e1, tris.e2, tris.n)
        t_masked = jnp.where(h, t, jnp.inf)
        i = jnp.argmin(t_masked)
        hit = h[i]
        return hit, t[i], u[i], v[i], jnp.where(hit, i.astype(jnp.int32), -1)

    hit, t, u, v, prim = jax.vmap(one)(origin, direction, tmax)
    hit = hit & active
    normal = jnp.where(hit[:, None], tris.n[jnp.clip(prim, 0, tris.num - 1)],
                       0.0)
    return hit, t, u, v, prim, normal


@jax.jit
def anyhit_brute(tris: Triangles, origin, direction, tmax, exclude, active):
    """Occlusion test over all triangles minus the excluded one."""
    def one(o, d, tm, ex):
        h, _, _, _ = intersect_triangle(o[None, :], d[None, :], tm,
                                        tris.p0, tris.e1, tris.e2, tris.n)
        idx = jnp.arange(tris.num, dtype=jnp.int32)
        return jnp.any(h & (idx != ex))

    occ = jax.vmap(one)(origin, direction, tmax, exclude)
    return occ & active
