"""Unified scene tracing: backend dispatch + two-level (instanced) merge.

Gives the wavefront engine a single closest-hit/any-hit interface over
(a) the base one-level scene and (b) optional instanced meshes
(rtjax.accel.instancing).  Hits are identified by ``(src, prim)`` where
src 0 = base scene and src k = instance k-1 — the index-pair equivalent of
the reference's triangle-pointer identity (render.cuh:321, bvh.cuh:243).

Ray origins/directions flow through as component triples (core.v3, the
engine's hot-path layout); ``[N, 3]`` arrays are accepted too and the
normal output matches the input convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import v3
from ..kernels.pallas_lane import LSTACK, lane_traverse_closest
from ..kernels.pallas_lane_persist import (persist_traverse_anyhit,
                                           persist_traverse_closest)
from ..kernels.pallas_wide import (SMEM_META_CAP, wide_traverse_anyhit,
                                   wide_traverse_anyhit_inst,
                                   wide_traverse_closest,
                                   wide_traverse_closest_inst)
from ..kernels.traversal import traverse_anyhit, traverse_closest


def _inst_meta_vmem(tabs):
    """Static decision: does the combined two-level meta exceed SMEM?
    (Array sizes are static under jit; mirrors the scene-build tiering.)"""
    return (tabs.wide.child_meta.size
            + tabs.wide.node_info.size) * 4 >= SMEM_META_CAP


def _tables_meta_vmem(tables):
    """Same SMEM-cap decision for a single WideTables (per-BLAS launches in
    the per-instance fallback loop: a large instanced mesh's meta must go
    to the mirror lanes there too or the SMEM in_spec faults at compile)."""
    if tables is None:
        return False
    return (tables.child_meta.size + tables.node_info.size) * 4 \
        >= SMEM_META_CAP

_FLT_EPSILON = float(np.finfo(np.float32).eps)

_warned = set()


def _warn_once(key, msg):
    if key not in _warned:
        _warned.add(key)
        from ..utils.log import logger
        logger.warning(msg)


def _warn_blas_fallback(mesh_id):
    _warn_once(("blas_xla", mesh_id),
               f"BLAS mesh {mesh_id}: wide tables exceed the VMEM guard; "
               "its instances traverse on the (slow) XLA backend")


def resolve_mode(scene, cfg):
    mode = cfg.traversal
    if mode == "auto":
        mode = "pallas" if (jax.default_backend() == "tpu"
                            and scene.tables is not None) else "xla"
    interp = jax.default_backend() != "tpu"
    return mode, interp


def _lane_eligible(tables, bvh, leaf_hbm):
    """Static gate for the per-sublane walker: it needs unpacked node rows,
    a VMEM-resident leaf table, and the build's depth within its private
    stack slices (wide-tree depth <= binary build depth <= LSTACK)."""
    return (tables is not None and not tables.packed_nodes and not leaf_hbm
            and bvh.max_depth <= LSTACK)


def _st2(st):
    """Normalize a kernel stats tuple to the engine's (steps, leafs) pair
    (lane kernels append a third drain-round counter)."""
    return (st[0], st[1])


# scenes at or below this triangle count skip the BVH kernels entirely:
# an unrolled all-triangles MT loop is pure fused XLA vector code (zero
# pallas launches, zero node-walk rounds).  At 64 tris the loop costs
# ~1800 VPU ops/ray — still far below one packet launch's fixed I/O.
# cfg.direct_max_tris overrides (0 disables).
DIRECT_MAX_TRIS = 64


def _direct_closest(tris, o, d, tmax, active, with_stats):
    """Closest hit by an unrolled all-triangles MT loop (component
    triples, exact reference accept rule, triangle.cuh:39-58).  The
    trivially-small-scene fast path: every per-triangle constant is a
    static slice, so XLA fuses the whole loop into the surrounding
    iteration with no kernel launch and no [P]-table gather."""
    T = tris.num
    shape = tmax.shape
    best_t = jnp.full(shape, jnp.float32(BIG_T), jnp.float32)
    prim = jnp.full(shape, -1, jnp.int32)
    n_out = tuple(jnp.zeros(shape, jnp.float32) for _ in range(3))
    for k in range(T):
        p0 = tuple(tris.p0[k, c] for c in range(3))
        e1 = tuple(tris.e1[k, c] for c in range(3))
        e2 = tuple(tris.e2[k, c] for c in range(3))
        nv = tuple(tris.n[k, c] for c in range(3))
        cx = p0[0] - o[0]; cy = p0[1] - o[1]; cz = p0[2] - o[2]
        rx = d[1] * cz - d[2] * cy
        ry = d[2] * cx - d[0] * cz
        rz = d[0] * cy - d[1] * cx
        inv_det = 1.0 / (d[0] * nv[0] + d[1] * nv[1] + d[2] * nv[2])
        u = inv_det * (e2[0] * rx + e2[1] * ry + e2[2] * rz)
        v = inv_det * (e1[0] * rx + e1[1] * ry + e1[2] * rz)
        t = inv_det * (cx * nv[0] + cy * nv[1] + cz * nv[2])
        h = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & \
            (t <= tmax)
        closer = h & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        prim = jnp.where(closer, k, prim)
        n_out = tuple(jnp.where(closer, c, n) for c, n in zip(nv, n_out))
    hit = (prim >= 0) & active
    prim = jnp.where(hit, prim, -1)
    out = (hit, best_t, prim, n_out)
    if with_stats:
        visits = (jnp.sum(active, dtype=jnp.int32) * T).astype(jnp.int32)
        out = out + ((jnp.int32(0), visits),)
    return out


def _direct_anyhit(tris, o, d, tmax, exclude, active, with_stats):
    """Occlusion by the unrolled MT loop with per-lane prim exclusion
    (bvh.cuh:306-357 semantics, same accept rule as _direct_closest)."""
    T = tris.num
    occ = jnp.zeros(tmax.shape, bool)
    for k in range(T):
        p0 = tuple(tris.p0[k, c] for c in range(3))
        e1 = tuple(tris.e1[k, c] for c in range(3))
        e2 = tuple(tris.e2[k, c] for c in range(3))
        nv = tuple(tris.n[k, c] for c in range(3))
        cx = p0[0] - o[0]; cy = p0[1] - o[1]; cz = p0[2] - o[2]
        rx = d[1] * cz - d[2] * cy
        ry = d[2] * cx - d[0] * cz
        rz = d[0] * cy - d[1] * cx
        inv_det = 1.0 / (d[0] * nv[0] + d[1] * nv[1] + d[2] * nv[2])
        u = inv_det * (e2[0] * rx + e2[1] * ry + e2[2] * rz)
        v = inv_det * (e1[0] * rx + e1[1] * ry + e1[2] * rz)
        t = inv_det * (cx * nv[0] + cy * nv[1] + cz * nv[2])
        h = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & \
            (t <= tmax) & (exclude != k)
        occ = occ | h
    occ = occ & active
    if with_stats:
        visits = (jnp.sum(active, dtype=jnp.int32) * T).astype(jnp.int32)
        return occ, (jnp.int32(0), visits)
    return occ


BIG_T = 3.4e38


def _direct_max(cfg):
    return getattr(cfg, "direct_max_tris", DIRECT_MAX_TRIS)


def _backend(mode, interp, tables, bvh, tris, stack_size, with_stats=False,
             leaf_hbm=False, meta_vmem=False, walker="packet",
             anyhit_walker="auto", direct_max=DIRECT_MAX_TRIS):
    if mode == "pallas" and tris is not None and tris.num <= direct_max:
        # trivially-small scene: the fused XLA MT loop replaces both
        # kernels (round-5 engine floor diet #5; A/B in RESULTS.md)
        return (partial(_direct_closest, tris, with_stats=with_stats),
                partial(_direct_anyhit, tris, with_stats=with_stats))
    if mode == "pallas":
        assert tables is not None, (
            "traversal='pallas' needs scenes built with max_leaf_size <= 8")
        if walker == "auto":
            # persistent per-sublane walkers (no tile barrier) beat the
            # tile-mode lane walker on every measured single-level scene:
            # 18.7 vs 16.7 Mrays/s on the headline bench (PERF_NOTES r4)
            walker = "persist" if _lane_eligible(tables, bvh, leaf_hbm) \
                else "packet"
        if walker in ("lane", "persist") and \
                not _lane_eligible(tables, bvh, leaf_hbm):
            _warn_once(("lane", id(tables)),
                       f"walker='{walker}' requested but the scene is "
                       "ineligible (packed node rows / HBM leaf table / "
                       "deep build); falling back to the packet walker")
            walker = "packet"
        if walker == "persist":
            closest = partial(persist_traverse_closest, tables,
                              interpret=interp, with_stats=with_stats,
                              meta_vmem=meta_vmem)
        elif walker == "lane":
            closest = partial(lane_traverse_closest, tables, interpret=interp,
                              with_stats=with_stats, meta_vmem=meta_vmem)
        else:
            closest = partial(wide_traverse_closest, tables, interpret=interp,
                              with_stats=with_stats, leaf_hbm=leaf_hbm,
                              meta_vmem=meta_vmem)
        # any-hit walk schedule: the round-4 packet pin rested on a
        # tile-barrier-era A/B (benchmarks/lane_vs_packet.py); the
        # persistent schedule composes with the occlusion early-out (a dry
        # walker transitions immediately instead of idling at a barrier).
        # Round-5 on-hardware whole-frame A/B (benchmarks/anyhit_ab.py,
        # RESULTS.md 2026-08-20): persist 22.18 vs packet 22.14 Mrays/s —
        # a tie on throughput, and persist-everywhere removes the packet
        # kernel from lane-eligible frames entirely (one fewer compile
        # variant).  auto therefore follows the closest-hit walker.
        if anyhit_walker == "auto":
            anyhit_walker = "persist" \
                if _lane_eligible(tables, bvh, leaf_hbm) else "packet"
        if anyhit_walker == "persist" and _lane_eligible(tables, bvh,
                                                         leaf_hbm):
            def anyhit(o, d, tmax, exclude, active, **kw):
                out = persist_traverse_anyhit(
                    tables, o, d, tmax, exclude, active, interpret=interp,
                    with_stats=with_stats, meta_vmem=meta_vmem)
                if with_stats:
                    # normalize the lane-walker 3-tuple stats (rounds,
                    # visits, drains) to the engine's (rounds, visits)
                    return out[0], _st2(out[1])
                return out
        else:
            anyhit = partial(wide_traverse_anyhit, tables, interpret=interp,
                             with_stats=with_stats, leaf_hbm=leaf_hbm,
                             meta_vmem=meta_vmem)
        return closest, anyhit
    # the at-cap median split can exceed BVH_MAX_DEPTH on degenerate scenes;
    # size the XLA stack from the build's actual depth so pushes are never
    # silently dropped (ADVICE r2 #1)
    stack_size = max(stack_size, bvh.max_depth + 1)

    def closest(o, d, tmax, active, **kw):
        # XLA fallback computes (u, v) too; drop them to match the wide
        # kernel's (hit, t, prim, normal) contract
        out = traverse_closest(bvh, tris, v3.to_array(o), v3.to_array(d),
                               tmax, active, stack_size=stack_size,
                               with_stats=with_stats)
        return out[:2] + (out[4], v3.from_array(out[5])) + out[6:]

    def anyhit(o, d, tmax, exclude, active, **kw):
        return traverse_anyhit(bvh, tris, v3.to_array(o), v3.to_array(d),
                               tmax, exclude, active, stack_size=stack_size,
                               with_stats=with_stats)

    return closest, anyhit


def _affine_point_v3(A, p):
    """[3, 4] affine row-matrix applied to a component-triple point."""
    return tuple(A[r, 0] * p[0] + A[r, 1] * p[1] + A[r, 2] * p[2] + A[r, 3]
                 for r in range(3))


def _affine_vector_v3(A, d):
    return tuple(A[r, 0] * d[0] + A[r, 1] * d[1] + A[r, 2] * d[2]
                 for r in range(3))


def _matvec_v3(M, n):
    """[3, 3] matrix applied to a component triple (cofactor normals)."""
    return tuple(M[r, 0] * n[0] + M[r, 1] * n[1] + M[r, 2] * n[2]
                 for r in range(3))


def _instance_entry_exit(inst, k, o, d):
    """Slab entry/exit distances of all rays vs instance k's world AABB."""
    lo, hi = inst.aabb_lo[k], inst.aabb_hi[k]
    entry, exit_ = None, None
    for c in range(3):
        safe = jnp.where(jnp.abs(d[c]) < _FLT_EPSILON,
                         jnp.copysign(_FLT_EPSILON, d[c]), d[c])
        inv = 1.0 / safe
        e0 = (lo[c] - o[c]) * inv
        e1 = (hi[c] - o[c]) * inv
        near = jnp.minimum(e0, e1)
        far = jnp.maximum(e0, e1)
        entry = near if entry is None else jnp.maximum(entry, near)
        exit_ = far if exit_ is None else jnp.minimum(exit_, far)
    return entry, exit_


def _instance_mask(inst, k, o, d):
    """Vector slab test of all rays vs instance k's world AABB (triples)."""
    entry, exit_ = _instance_entry_exit(inst, k, o, d)
    return entry <= exit_


def _mesh_groups(inst):
    """Static grouping of instance ids by mesh: ``{mesh_id: [k, ...]}``."""
    groups: dict[int, list[int]] = {}
    for k in range(inst.num):
        groups.setdefault(int(inst.mesh_id[k]), []).append(k)
    return groups


def _resolve_two_level(scene, cfg) -> str:
    """Resolve the two-level strategy.  "auto" selects the multi-pass
    re-dispatch path: measured 3.96 (repass) vs 3.33 (kernel) Mrays/s on
    the 16-instance config-4 scene, same v5e session (RESULTS.md
    2026-08-20) — per-ray candidate pruning beats the in-kernel loop's
    per-tile instance union.  Falls back to the in-kernel loop where a
    BLAS lacks wide tables (_repass_ok)."""
    tl = getattr(cfg, "two_level", "auto")
    if tl == "auto":
        return "repass"
    return tl


def _repass_ok(scene):
    """Static gate for the multi-pass re-dispatch two-level path: base and
    every BLAS must have wide tables (Pallas-resident)."""
    inst = getattr(scene, "instances", None)
    if inst is None or scene.tables is None:
        return False
    return all(scene.blas[m].tables is not None for m in set(inst.mesh_id))


def _repass_setup(inst, ks, o, d):
    """Per-ray slab precompute for one mesh group: stacked entry distances
    ``ent [G, N]`` (clamped to 0 for inside-the-box origins) and the
    hit-the-box validity mask ``ok [G, N]``."""
    ents, oks = [], []
    for k in ks:
        entry, exit_ = _instance_entry_exit(inst, k, o, d)
        oks.append((entry <= exit_) & (exit_ >= 0.0))
        ents.append(jnp.maximum(entry, 0.0))
    return jnp.stack(ents), jnp.stack(oks)


def _repass_local_rays(inv_flat, pick, o, d):
    """Transform rays into their picked instance's local frame: ``inv_flat``
    is the group's ``[G, 12]`` affine table, ``pick`` the per-ray local
    group index.  take_rows keeps the lookup a <=16-row select chain."""
    from ..core.tables import take_rows
    # per-column selects keep everything [N]-shaped (a [N, 12] intermediate
    # lane-pads 12 -> 128 on TPU; 12 independent column chains fuse clean)
    col = lambda c: take_rows(inv_flat[:, c], pick)
    o_l = tuple(col(4 * r + 0) * o[0] + col(4 * r + 1) * o[1]
                + col(4 * r + 2) * o[2] + col(4 * r + 3) for r in range(3))
    d_l = tuple(col(4 * r + 0) * d[0] + col(4 * r + 1) * d[1]
                + col(4 * r + 2) * d[2] for r in range(3))
    return o_l, d_l


def _repass_closest(scene, cfg, interp, o, d, tmax, active, with_stats):
    """Two-level closest hit by MULTI-PASS RE-DISPATCH: every pass, each ray
    picks its nearest not-yet-walked candidate instance (world-AABB slab
    entry < current t) and ALL rays walk that mesh's single-level BLAS in
    ONE coherent launch (rays transform per-ray into their own instance's
    local frame first — instances of one mesh share the tree, so the launch
    stays dense).  Passes repeat until no ray has a live candidate; tmax
    shrinks globally between passes, so pass j+1 only runs the boundary
    rays whose next candidate is still closer than their best hit.

    This is the TPU-native fix for per-tile instance divergence: the
    in-kernel loop (wide_traverse_closest_inst) pays the TILE-UNION of
    overlapping instances (~70 walk rounds/tile on the 16-bunny config 4,
    docs/ROUND3.md), while each re-dispatch pass costs one single-BLAS walk
    at per-RAY candidate occupancy — the wavefront analog of the
    reference's per-thread two-level descent (it has none; instancing is an
    extension, BASELINE.md config 4).
    Returns ``(hit, t, prim, src, n_local, steps, leafs)``; normals are
    LOCAL frame (caller applies the cofactor transform by src).
    """
    from ..core.tables import take_rows
    inst = scene.instances
    BIG = jnp.float32(3.0e38)

    # base scene: one plain single-level launch (walker auto -> persist)
    closest, _ = _backend("pallas", interp, scene.tables, scene.bvh,
                          scene.tris, cfg.stack_size, with_stats,
                          getattr(scene, "leaf_hbm", False),
                          getattr(scene, "meta_vmem", False),
                          walker=getattr(cfg, "walker", "auto"),
                          direct_max=_direct_max(cfg))
    hit, t, prim, n_l, *st = closest(o, d, tmax, active)
    t = jnp.where(hit, t, tmax)
    src = jnp.zeros_like(prim)
    steps, leafs = (st[0][0], st[0][1]) if with_stats else (
        jnp.int32(0), jnp.int32(0))

    for mesh_id, ks in _mesh_groups(inst).items():
        blas = scene.blas[mesh_id]
        c_k, _ = _backend("pallas", interp, blas.tables, blas.bvh, blas.tris,
                          cfg.stack_size, with_stats,
                          meta_vmem=_tables_meta_vmem(blas.tables),
                          walker=getattr(cfg, "walker", "auto"),
                          direct_max=_direct_max(cfg))
        G = len(ks)
        ent, ok = _repass_setup(inst, ks, o, d)          # [G, N]
        inv_flat = jnp.stack([inst.inv[k].reshape(12) for k in ks])
        src_of = jnp.asarray([k + 1 for k in ks], jnp.int32)
        g_iota = jnp.arange(G, dtype=jnp.int32)[:, None]

        def cand_of(t, walked):
            return ok & ~walked & (ent < t[None]) & active[None]

        def cond(c):
            return jnp.any(cand_of(c[0], c[7]))

        def body(c):
            t, prim, src, hit, n0, n1, n2, walked, steps, leafs = c
            cand = cand_of(t, walked)
            pend = jnp.any(cand, axis=0)
            pick = jnp.argmin(jnp.where(cand, ent, BIG), axis=0
                              ).astype(jnp.int32)
            walked = walked | ((g_iota == pick[None]) & pend[None])
            o_l, d_l = _repass_local_rays(inv_flat, pick, o, d)
            h2, t2, p2, nl2, *st2 = c_k(o_l, d_l, t, pend)
            if with_stats:
                steps = steps + st2[0][0]
                leafs = leafs + st2[0][1]
            closer = h2 & (t2 < t)
            t = jnp.where(closer, t2, t)
            prim = jnp.where(closer, p2, prim)
            src = jnp.where(closer, take_rows(src_of, pick), src)
            n0 = jnp.where(closer, nl2[0], n0)
            n1 = jnp.where(closer, nl2[1], n1)
            n2 = jnp.where(closer, nl2[2], n2)
            hit = hit | closer
            return (t, prim, src, hit, n0, n1, n2, walked, steps, leafs)

        walked0 = jnp.zeros((G,) + t.shape, bool)
        carry = (t, prim, src, hit, n_l[0], n_l[1], n_l[2], walked0,
                 steps, leafs)
        carry = jax.lax.while_loop(cond, body, carry)
        (t, prim, src, hit, nx, ny, nz, _, steps, leafs) = carry
        n_l = (nx, ny, nz)

    return hit, t, prim, src, n_l, steps, leafs


def _repass_anyhit(scene, cfg, interp, o, d, tmax, exclude, active,
                   with_stats):
    """Two-level any-hit by multi-pass re-dispatch (see _repass_closest).
    Exclusion applies only within the base scene (lights are never
    instanced); occluded rays drop out of later passes."""
    inst = scene.instances
    BIG = jnp.float32(3.0e38)
    _, anyhit = _backend("pallas", interp, scene.tables, scene.bvh,
                         scene.tris, cfg.stack_size, with_stats,
                         getattr(scene, "leaf_hbm", False),
                         getattr(scene, "meta_vmem", False),
                         anyhit_walker=getattr(cfg, "anyhit_walker", "auto"),
                         direct_max=_direct_max(cfg))
    occ = anyhit(o, d, tmax, exclude, active)
    if with_stats:
        occ, (steps, leafs) = occ
    else:
        steps = leafs = jnp.int32(0)
    no_excl = jnp.full(tmax.shape, -1, jnp.int32)

    for mesh_id, ks in _mesh_groups(inst).items():
        blas = scene.blas[mesh_id]
        _, a_k = _backend("pallas", interp, blas.tables, blas.bvh, blas.tris,
                          cfg.stack_size, with_stats,
                          meta_vmem=_tables_meta_vmem(blas.tables),
                          anyhit_walker=getattr(cfg, "anyhit_walker", "auto"),
                          direct_max=_direct_max(cfg))
        G = len(ks)
        ent, ok = _repass_setup(inst, ks, o, d)
        inv_flat = jnp.stack([inst.inv[k].reshape(12) for k in ks])
        g_iota = jnp.arange(G, dtype=jnp.int32)[:, None]

        def cand_of(occ, walked):
            return ok & ~walked & (ent < tmax[None]) & active[None] \
                & ~occ[None]

        def cond(c):
            return jnp.any(cand_of(c[0], c[1]))

        def body(c):
            occ, walked, steps, leafs = c
            cand = cand_of(occ, walked)
            pend = jnp.any(cand, axis=0)
            pick = jnp.argmin(jnp.where(cand, ent, BIG), axis=0
                              ).astype(jnp.int32)
            walked = walked | ((g_iota == pick[None]) & pend[None])
            o_l, d_l = _repass_local_rays(inv_flat, pick, o, d)
            occ_k = a_k(o_l, d_l, tmax, no_excl, pend)
            if with_stats:
                occ_k, (s2, l2) = occ_k
                steps, leafs = steps + s2, leafs + l2
            return occ | occ_k, walked, steps, leafs

        walked0 = jnp.zeros((G,) + tmax.shape, bool)
        occ, _, steps, leafs = jax.lax.while_loop(
            cond, body, (occ, walked0, steps, leafs))

    if with_stats:
        return occ, (steps, leafs)
    return occ


def trace_closest(scene, cfg, mode, interp, o, d, tmax, active,
                  with_stats=False):
    """Closest hit over base scene + all instances.

    ``o``/``d`` may be ``[N, 3]`` arrays or component triples (core.v3);
    the returned ``normal`` matches the input convention.  Returns
    ``(hit, t, prim, src, normal)``; ``normal`` is the world-space
    unnormalized geometric normal of the hit triangle (the reference's
    cross(e1, e2), triangle.cuh:19), straight from the traversal kernel —
    no post-hoc triangle gather.  With ``with_stats=True`` a trailing
    ``(node_steps, leaf_visits)`` pair is appended (summed over the base
    scene and every instance launch).
    """
    as_v3 = isinstance(o, tuple)
    if not as_v3:
        o = v3.from_array(o)
        d = v3.from_array(d)
    inst = getattr(scene, "instances", None)

    def _ret(hit, t, prim, src, n_w, st=None):
        if not as_v3:
            n_w = v3.to_array(n_w)
        out = (hit, t, prim, src, n_w)
        return out + ((st,) if with_stats else ())

    # multi-pass re-dispatch two-level path (opt-in / auto): per-ray
    # nearest-candidate passes over coherent single-BLAS launches
    if inst is not None and mode == "pallas" and \
            _resolve_two_level(scene, cfg) == "repass" and _repass_ok(scene):
        hit, t, prim, src, n_l, steps, leafs = _repass_closest(
            scene, cfg, interp, o, d, tmax, active, with_stats)
        n_w = n_l
        for k in range(inst.num):
            n_w = v3.where(src == k + 1, _matvec_v3(inst.nrm[k], n_l), n_w)
        return _ret(hit, t, prim, src, n_w,
                    (steps, leafs) if with_stats else None)

    # single-launch two-level fast path: the kernel walks base + all
    # instances itself (one dispatch, shared tmax pruning) instead of the
    # per-instance full-pool-width launches below
    if inst is not None and mode == "pallas" and scene.inst_tables is None:
        _warn_once("inst_loop",
                   f"instanced scene traverses via the per-instance loop "
                   f"(O({inst.num}) launches/bounce): combined tables "
                   "exceeded the single-launch kernel's VMEM/SMEM caps")
    if inst is not None and mode == "pallas" and scene.inst_tables is not None:
        # two-level in-kernel fallback (repass is the auto path): the
        # PACKET kernel — a round-4 per-sublane-TLAS variant
        # (pallas_lane_inst) lost its only A/B (3.02 vs 3.35 Mrays/s on
        # config 4) and was deleted in round 5 (win-or-delete,
        # docs/PERF_NOTES.md).
        out = wide_traverse_closest_inst(
            scene.inst_tables, o, d, tmax, active, interpret=interp,
            with_stats=with_stats,
            meta_vmem=_inst_meta_vmem(scene.inst_tables))
        hit, t, prim, src, n_l = out[:5]
        t = jnp.where(hit, t, tmax)
        # local->world normal: instance k's cofactor transform (base hits
        # are already world — identity); K masked matvecs fuse on the VPU
        n_w = n_l
        for k in range(inst.num):
            n_w = v3.where(src == k + 1, _matvec_v3(inst.nrm[k], n_l), n_w)
        return _ret(hit, t, prim, src, n_w,
                    _st2(out[5]) if with_stats else None)

    closest, _ = _backend(mode, interp, scene.tables, scene.bvh, scene.tris,
                          cfg.stack_size, with_stats,
                          getattr(scene, "leaf_hbm", False),
                          getattr(scene, "meta_vmem", False),
                          walker=getattr(cfg, "walker", "packet"),
                          direct_max=_direct_max(cfg) if mode == "pallas"
                          else 0)
    hit, t, prim, n_w, *st = closest(o, d, tmax, active)
    t = jnp.where(hit, t, tmax)
    src = jnp.zeros_like(prim)
    # lane-walker stats carry a third (drain-round) counter; the engine
    # consumes the shared (walk rounds, leaf visits) prefix
    steps, leafs = (st[0][0], st[0][1]) if with_stats else (0, 0)

    if inst is not None:
        for k in range(inst.num):
            blas = scene.blas[inst.mesh_id[k]]
            # a BLAS whose wide tables were dropped by the VMEM guard
            # downgrades to the XLA backend instead of asserting (ADVICE r2
            # #2); warn once — the O(I) per-instance loop is the slow path
            mode_k = mode if blas.tables is not None else "xla"
            if mode_k != mode:
                _warn_blas_fallback(inst.mesh_id[k])
            c_k, _ = _backend(mode_k, interp, blas.tables, blas.bvh,
                              blas.tris, cfg.stack_size, with_stats,
                              meta_vmem=_tables_meta_vmem(blas.tables),
                              walker=getattr(cfg, "walker", "packet"),
                              direct_max=_direct_max(cfg)
                              if mode_k == "pallas" else 0)
            m = active & _instance_mask(inst, k, o, d)
            o_l = _affine_point_v3(inst.inv[k], o)
            d_l = _affine_vector_v3(inst.inv[k], d)  # NOT normalized:
            # preserves the ray parameter, so t compares in world units
            h2, t2, p2, n2, *st2 = c_k(o_l, d_l, t, m)
            if with_stats:
                steps, leafs = steps + st2[0][0], leafs + st2[0][1]
            closer = h2 & (t2 < t)
            # cofactor transform = world cross of transformed edges
            n2_w = _matvec_v3(inst.nrm[k], n2)
            t = jnp.where(closer, t2, t)
            prim = jnp.where(closer, p2, prim)
            src = jnp.where(closer, k + 1, src)
            n_w = v3.where(closer, n2_w, n_w)
            hit = hit | closer
    return _ret(hit, t, prim, src, n_w,
                (steps, leafs) if with_stats else None)


def trace_anyhit(scene, cfg, mode, interp, o, d, tmax, exclude, active,
                 with_stats=False):
    """Occlusion over base scene + all instances.

    ``o``/``d`` may be ``[N, 3]`` arrays or component triples.  ``exclude``
    is a BASE-scene triangle index (shadow-ray light exclusion,
    bvh.cuh:239-248); instanced geometry is never excluded.  With
    ``with_stats=True`` returns ``(occluded, (node_steps, leaf_visits))``.
    """
    if not isinstance(o, tuple):
        o = v3.from_array(o)
        d = v3.from_array(d)
    inst = getattr(scene, "instances", None)
    tl_ah = getattr(cfg, "two_level_anyhit", "auto")
    if tl_ah == "auto":
        # follow the closest-hit strategy by default; A/B in RESULTS.md
        tl_ah = _resolve_two_level(scene, cfg)
    if inst is not None and mode == "pallas" and \
            tl_ah == "repass" and _repass_ok(scene):
        return _repass_anyhit(scene, cfg, interp, o, d, tmax, exclude,
                              active, with_stats)
    if inst is not None and mode == "pallas" and scene.inst_tables is not None:
        # in-kernel two-level any-hit fallback (see trace_closest)
        out = wide_traverse_anyhit_inst(
            scene.inst_tables, o, d, tmax, exclude, active, interpret=interp,
            with_stats=with_stats,
            meta_vmem=_inst_meta_vmem(scene.inst_tables))
        if with_stats:
            return out[0], _st2(out[1])
        return out

    _, anyhit = _backend(mode, interp, scene.tables, scene.bvh, scene.tris,
                         cfg.stack_size, with_stats,
                         getattr(scene, "leaf_hbm", False),
                         getattr(scene, "meta_vmem", False),
                         anyhit_walker=getattr(cfg, "anyhit_walker", "auto"),
                         direct_max=_direct_max(cfg) if mode == "pallas"
                         else 0)
    occ = anyhit(o, d, tmax, exclude, active)
    if with_stats:
        occ, (steps, leafs) = occ

    if inst is not None:
        no_excl = jnp.full(o[0].shape[0], -1, jnp.int32)
        for k in range(inst.num):
            blas = scene.blas[inst.mesh_id[k]]
            mode_k = mode if blas.tables is not None else "xla"
            _, a_k = _backend(mode_k, interp, blas.tables, blas.bvh,
                              blas.tris, cfg.stack_size, with_stats,
                              meta_vmem=_tables_meta_vmem(blas.tables),
                              anyhit_walker=getattr(cfg, "anyhit_walker",
                                                    "auto"),
                              direct_max=_direct_max(cfg)
                              if mode_k == "pallas" else 0)
            m = active & ~occ & _instance_mask(inst, k, o, d)
            o_l = _affine_point_v3(inst.inv[k], o)
            d_l = _affine_vector_v3(inst.inv[k], d)
            occ_k = a_k(o_l, d_l, tmax, no_excl, m)
            if with_stats:
                occ_k, (s2, l2) = occ_k
                steps, leafs = steps + s2, leafs + l2
            occ = occ | occ_k
    if with_stats:
        return occ, (steps, leafs)
    return occ


def _hit_material_index(scene, src, prim):
    runs = getattr(scene, "mat_runs", None)
    if runs is not None:
        # prim->material as a run-compare chain (scene.mat_runs): the map is
        # piecewise-constant over leaf-order prim ids in any real scene, so
        # <= 32 vector compares replace the ~2.4 ms pool-width [P] gather.
        # prim < 0 (miss lanes) lands in run 0, matching the gather path's
        # clamp; instanced lanes are overridden below either way.
        mat_idx = jnp.full(prim.shape, runs[0][1], jnp.int32)
        for s, m in runs[1:]:
            mat_idx = jnp.where(prim >= s, m, mat_idx)
    else:
        prim_safe = jnp.clip(prim, 0, scene.tris.num - 1)
        mat_idx = scene.prim_material[prim_safe]
    inst = getattr(scene, "instances", None)
    if inst is not None:
        for k in range(inst.num):
            mat_idx = jnp.where(src == k + 1, inst.material[k], mat_idx)
    return mat_idx


def gather_hit_materials(scene, src, prim):
    """Material params for hits: ``(mtype, albedo, ior)``.

    Hit *geometry* (position = o + t*d, normal) now comes straight from the
    traversal (trace_closest), so the only per-hit table lookup left is one
    [P] material-index gather plus the small-table material select.
    """
    return scene.materials.gather(_hit_material_index(scene, src, prim))


def gather_hit_materials_v3(scene, src, prim):
    """Like :func:`gather_hit_materials`, albedo as a component triple."""
    return scene.materials.gather_v3(_hit_material_index(scene, src, prim))
