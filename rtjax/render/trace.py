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
                                   wide_traverse_anyhit_inst,
                                   wide_traverse_closest,
                                   wide_traverse_closest_inst)
from ..kernels.traversal import traverse_anyhit, traverse_closest


def resolve_mode(scene, cfg):
    mode = cfg.traversal
    if mode == "auto":
        mode = "pallas" if (jax.default_backend() == "tpu"
                            and scene.tables is not None) else "xla"
    interp = jax.default_backend() != "tpu"
    return mode, interp


def _backend(mode, interp, tables, bvh, tris, stack_size, with_stats=False,
             leaf_hbm=False, meta_vmem=False):
    if mode == "pallas":
        assert tables is not None, (
            "traversal='pallas' needs scenes built with max_leaf_size <= 8")
        return (partial(wide_traverse_closest, tables, interpret=interp,
                        with_stats=with_stats, leaf_hbm=leaf_hbm,
                        meta_vmem=meta_vmem),
                partial(wide_traverse_anyhit, tables, interpret=interp,
                        with_stats=with_stats, leaf_hbm=leaf_hbm,
                        meta_vmem=meta_vmem))
    return (partial(traverse_closest, bvh, tris, stack_size=stack_size,
                    with_stats=with_stats),
            partial(traverse_anyhit, bvh, tris, stack_size=stack_size,
                    with_stats=with_stats))


def _instance_mask(inst, k, o, d):
    """Vector slab test of all rays vs instance k's world AABB."""
    inv_d, sc_o, neg = ray_slab_precompute(d, o)
    ok, _ = intersect_aabb(inv_d, sc_o, neg,
                           inst.aabb_lo[k][None, :], inst.aabb_hi[k][None, :])
    return ok


def trace_closest(scene, cfg, mode, interp, o, d, tmax, active,
                  with_stats=False):
    """Closest hit over base scene + all instances.

    Returns ``(hit, t, u, v, prim, src, normal)``; ``normal [N, 3]`` is the
    world-space unnormalized geometric normal of the hit triangle (the
    reference's cross(e1, e2), triangle.cuh:19), straight from the traversal
    kernel — no post-hoc triangle gather.  With ``with_stats=True`` a
    trailing ``(node_steps, leaf_visits)`` pair is appended (summed over the
    base scene and every instance launch).
    """
    inst = getattr(scene, "instances", None)

    # single-launch two-level fast path: the kernel walks base + all
    # instances itself (one dispatch, shared tmax pruning) instead of the
    # per-instance full-pool-width launches below
    if inst is not None and mode == "pallas" and scene.inst_tables is not None:
        out = wide_traverse_closest_inst(scene.inst_tables, o, d, tmax,
                                         active, interpret=interp,
                                         with_stats=with_stats)
        hit, t, u, v, prim, src, n_l = out[:7]
        t = jnp.where(hit, t, tmax)
        # local->world normal: instance k's cofactor transform (base hits
        # are already world — identity); K masked matvecs fuse on the VPU
        n_w = n_l
        for k in range(inst.num):
            n_w = jnp.where((src == k + 1)[:, None],
                            jnp.einsum("ij,nj->ni", inst.nrm[k], n_l,
                                       precision="highest"), n_w)
        if with_stats:
            return (hit, t, u, v, prim, src, n_w, out[7])
        return hit, t, u, v, prim, src, n_w

    closest, _ = _backend(mode, interp, scene.tables, scene.bvh, scene.tris,
                          cfg.stack_size, with_stats,
                          getattr(scene, "leaf_hbm", False),
                          getattr(scene, "meta_vmem", False))
    hit, t, u, v, prim, n_w, *st = closest(o, d, tmax, active)
    t = jnp.where(hit, t, tmax)
    src = jnp.zeros_like(prim)
    steps, leafs = st[0] if with_stats else (0, 0)

    if inst is not None:
        for k in range(inst.num):
            blas = scene.blas[inst.mesh_id[k]]
            c_k, _ = _backend(mode, interp, blas.tables, blas.bvh, blas.tris,
                              cfg.stack_size, with_stats)
            m = active & _instance_mask(inst, k, o, d)
            o_l = apply_affine_point(inst.inv[k], o)
            d_l = apply_affine_vector(inst.inv[k], d)  # NOT normalized:
            # preserves the ray parameter, so t compares in world units
            h2, t2, u2, v2, p2, n2, *st2 = c_k(o_l, d_l, t, m)
            if with_stats:
                steps, leafs = steps + st2[0][0], leafs + st2[0][1]
            closer = h2 & (t2 < t)
            # cofactor transform = world cross of transformed edges
            n2_w = jnp.einsum("ij,nj->ni", inst.nrm[k], n2,
                              precision="highest")
            t = jnp.where(closer, t2, t)
            u = jnp.where(closer, u2, u)
            v = jnp.where(closer, v2, v)
            prim = jnp.where(closer, p2, prim)
            src = jnp.where(closer, k + 1, src)
            n_w = jnp.where(closer[:, None], n2_w, n_w)
            hit = hit | closer
    out = (hit, t, u, v, prim, src, n_w)
    if with_stats:
        out = out + ((steps, leafs),)
    return out


def trace_anyhit(scene, cfg, mode, interp, o, d, tmax, exclude, active,
                 with_stats=False):
    """Occlusion over base scene + all instances.

    ``exclude`` is a BASE-scene triangle index (shadow-ray light exclusion,
    bvh.cuh:239-248); instanced geometry is never excluded.  With
    ``with_stats=True`` returns ``(occluded, (node_steps, leaf_visits))``.
    """
    inst = getattr(scene, "instances", None)
    if inst is not None and mode == "pallas" and scene.inst_tables is not None:
        return wide_traverse_anyhit_inst(scene.inst_tables, o, d, tmax,
                                         exclude, active, interpret=interp,
                                         with_stats=with_stats)

    _, anyhit = _backend(mode, interp, scene.tables, scene.bvh, scene.tris,
                         cfg.stack_size, with_stats,
                         getattr(scene, "leaf_hbm", False),
                         getattr(scene, "meta_vmem", False))
    occ = anyhit(o, d, tmax, exclude, active)
    if with_stats:
        occ, (steps, leafs) = occ

    if inst is not None:
        no_excl = jnp.full(o.shape[0], -1, jnp.int32)
        for k in range(inst.num):
            blas = scene.blas[inst.mesh_id[k]]
            _, a_k = _backend(mode, interp, blas.tables, blas.bvh, blas.tris,
                              cfg.stack_size, with_stats)
            m = active & ~occ & _instance_mask(inst, k, o, d)
            o_l = apply_affine_point(inst.inv[k], o)
            d_l = apply_affine_vector(inst.inv[k], d)
            occ_k = a_k(o_l, d_l, tmax, no_excl, m)
            if with_stats:
                occ_k, (s2, l2) = occ_k
                steps, leafs = steps + s2, leafs + l2
            occ = occ | occ_k
    if with_stats:
        return occ, (steps, leafs)
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
