"""Unified scene tracing: backend dispatch + two-level (instanced) merge.

Gives the wavefront engine a single closest-hit/any-hit interface over
(a) the base one-level scene and (b) optional instanced meshes
(rtjax.accel.instancing).  Hits are identified by ``(src, prim)`` where
src 0 = base scene and src k = instance k-1 — the index-pair equivalent of
the reference's triangle-pointer identity (render.cuh:321, bvh.cuh:243).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel.instancing import apply_affine_point, apply_affine_vector
from ..core import vec
from ..core.geometry import intersect_aabb, ray_slab_precompute
from ..kernels.pallas_wide import (wide_traverse_anyhit,
                                   wide_traverse_closest)
from ..kernels.traversal import traverse_anyhit, traverse_closest


def resolve_mode(scene, cfg):
    mode = cfg.traversal
    if mode == "auto":
        mode = "pallas" if (jax.default_backend() == "tpu"
                            and scene.tables is not None) else "xla"
    interp = jax.default_backend() != "tpu"
    return mode, interp


def _backend(mode, interp, tables, bvh, tris, stack_size):
    if mode == "pallas":
        assert tables is not None, (
            "traversal='pallas' needs scenes built with max_leaf_size <= 8")
        return (partial(wide_traverse_closest, tables, interpret=interp),
                partial(wide_traverse_anyhit, tables, interpret=interp))
    return (partial(traverse_closest, bvh, tris, stack_size=stack_size),
            partial(traverse_anyhit, bvh, tris, stack_size=stack_size))


def _instance_mask(inst, k, o, d):
    """Vector slab test of all rays vs instance k's world AABB."""
    inv_d, sc_o, neg = ray_slab_precompute(d, o)
    ok, _ = intersect_aabb(inv_d, sc_o, neg,
                           inst.aabb_lo[k][None, :], inst.aabb_hi[k][None, :])
    return ok


def trace_closest(scene, cfg, mode, interp, o, d, tmax, active):
    """Closest hit over base scene + all instances.

    Returns ``(hit, t, u, v, prim, src, normal)``; ``normal [N, 3]`` is the
    world-space unnormalized geometric normal of the hit triangle (the
    reference's cross(e1, e2), triangle.cuh:19), straight from the traversal
    kernel — no post-hoc triangle gather.
    """
    closest, _ = _backend(mode, interp, scene.tables, scene.bvh, scene.tris,
                          cfg.stack_size)
    hit, t, u, v, prim, n_w = closest(o, d, tmax, active)
    t = jnp.where(hit, t, tmax)
    src = jnp.zeros_like(prim)

    inst = getattr(scene, "instances", None)
    if inst is not None:
        for k in range(inst.num):
            blas = scene.blas[inst.mesh_id[k]]
            c_k, _ = _backend(mode, interp, blas.tables, blas.bvh, blas.tris,
                              cfg.stack_size)
            m = active & _instance_mask(inst, k, o, d)
            o_l = apply_affine_point(inst.inv[k], o)
            d_l = apply_affine_vector(inst.inv[k], d)  # NOT normalized:
            # preserves the ray parameter, so t compares in world units
            h2, t2, u2, v2, p2, n2 = c_k(o_l, d_l, t, m)
            closer = h2 & (t2 < t)
            # cofactor transform = world cross of transformed edges
            n2_w = jnp.einsum("ij,nj->ni", inst.nrm[k], n2)
            t = jnp.where(closer, t2, t)
            u = jnp.where(closer, u2, u)
            v = jnp.where(closer, v2, v)
            prim = jnp.where(closer, p2, prim)
            src = jnp.where(closer, k + 1, src)
            n_w = jnp.where(closer[:, None], n2_w, n_w)
            hit = hit | closer
    return hit, t, u, v, prim, src, n_w


def trace_anyhit(scene, cfg, mode, interp, o, d, tmax, exclude, active):
    """Occlusion over base scene + all instances.

    ``exclude`` is a BASE-scene triangle index (shadow-ray light exclusion,
    bvh.cuh:239-248); instanced geometry is never excluded.
    """
    _, anyhit = _backend(mode, interp, scene.tables, scene.bvh, scene.tris,
                         cfg.stack_size)
    occ = anyhit(o, d, tmax, exclude, active)

    inst = getattr(scene, "instances", None)
    if inst is not None:
        no_excl = jnp.full(o.shape[0], -1, jnp.int32)
        for k in range(inst.num):
            blas = scene.blas[inst.mesh_id[k]]
            _, a_k = _backend(mode, interp, blas.tables, blas.bvh, blas.tris,
                              cfg.stack_size)
            m = active & ~occ & _instance_mask(inst, k, o, d)
            o_l = apply_affine_point(inst.inv[k], o)
            d_l = apply_affine_vector(inst.inv[k], d)
            occ = occ | a_k(o_l, d_l, tmax, no_excl, m)
    return occ


def gather_hit_materials(scene, src, prim):
    """Material params for hits: ``(mtype, albedo, ior)``.

    Hit *geometry* (position = o + t*d, normal) now comes straight from the
    traversal (trace_closest), so the only per-hit table lookup left is one
    [P] material-index gather plus the small-table material select.
    """
    prim_safe = jnp.clip(prim, 0, scene.tris.num - 1)
    mat_idx = scene.prim_material[prim_safe]

    inst = getattr(scene, "instances", None)
    if inst is not None:
        for k in range(inst.num):
            mat_idx = jnp.where(src == k + 1, inst.material[k], mat_idx)

    return scene.materials.gather(mat_idx)
