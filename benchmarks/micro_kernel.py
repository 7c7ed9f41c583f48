"""Microbenchmarks for traversal-kernel design decisions on real TPU.

Measures the primitive costs that bound the packet traversal kernel
(docs/PERF_NOTES.md): scalar step overhead, pair-row slab testing, lane
broadcasts, packed reductions, leaf-visit MT variants (unrolled VPU vs MXU
matmul), and layout conversion.

The remote axon tunnel adds ~25 ms fixed overhead per dispatch, so every
number is a two-point slope: run the same kernel with n and 4n in-kernel
iterations and report (t_4n - t_n) / 3n.

Usage: python benchmarks/micro_kernel.py [names...]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 16
BIG = 3.4e38

jax.config.update("jax_compilation_cache_dir", "/tmp/rtjax-jit-cache-tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time(fn, *args, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = min(dt, time.time() - t0)
    return dt


def bench_slope(make_fn, n1=20_000, factor=4, reps=3):
    """ns/iter via two-point slope (cancels dispatch + compile-cache noise)."""
    f1, a1 = make_fn(n1)
    f2, a2 = make_fn(n1 * factor)
    t1 = _time(f1, *a1, reps=reps)
    t2 = _time(f2, *a2, reps=reps)
    return (t2 - t1) / (n1 * (factor - 1)) * 1e9


def _smem_out_call(kernel, *operands, scratch=()):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=list(scratch),
    )(*operands)


def _slab(bb, inv, sc, tmax):
    e0 = bb[0] * inv[0] + sc[0]
    e1 = bb[1] * inv[1] + sc[1]
    e2 = bb[2] * inv[2] + sc[2]
    x0 = bb[3] * inv[0] + sc[0]
    x1 = bb[4] * inv[1] + sc[1]
    x2 = bb[5] * inv[2] + sc[2]
    ent = jnp.maximum(jnp.maximum(jnp.minimum(e0, x0), jnp.minimum(e1, x1)),
                      jnp.minimum(e2, x2))
    ext = jnp.minimum(jnp.minimum(jnp.maximum(e0, x0), jnp.maximum(e1, x1)),
                      jnp.maximum(e2, x2))
    return (ent <= ext) & (ext >= 0.0) & (ent <= tmax)


def _bcast(row_b, k):
    return jnp.take_along_axis(row_b, jnp.full(row_b.shape, k, jnp.int32), 1)


# ---------------------------------------------------------------- scalar walk
def make_scalar_walk(n_iters):
    def kernel(meta_ref, out_ref, stack_ref):
        def body(carry):
            cur, sp, acc, i = carry
            meta = meta_ref[cur]
            leaf = (meta & 15) > 0
            nxt = (meta >> 4) % 1024
            stack_ref[sp % 64] = cur
            sp = jnp.where(leaf, sp + 1, jnp.maximum(sp - 1, 0))
            popped = stack_ref[jnp.maximum(sp - 1, 0)]
            cur = jnp.where(leaf, nxt, popped % 1024)
            return cur, sp, acc + meta, i + 1

        out = jax.lax.while_loop(lambda c: c[3] < n_iters, body,
                                 (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                                  jnp.int32(0)))
        out_ref[0] = out[2]

    meta = jnp.arange(1024, dtype=jnp.int32)
    f = jax.jit(lambda m: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )(m))
    return f, (meta,)


# ------------------------------------------------------------- slab steps
def _make_slab_step(n_iters, n_children):
    def kernel(pb_ref, o_ref, out_ref):
        inv = tuple(o_ref[k] for k in range(3))
        sc = tuple(o_ref[k + 3] for k in range(3))
        tmax = o_ref[6]

        def body(carry):
            acc, i = carry
            row = pb_ref[pl.ds(i % 1024, 1), :]
            row_b = jnp.broadcast_to(row, (SUBLANES, 128))
            b = tuple(_bcast(row_b, k) for k in range(6 * n_children))
            hits = [_slab(b[6 * c:6 * c + 6], inv, sc, tmax)
                    for c in range(n_children)]
            if n_children <= 2:
                s = jnp.sum(hits[0].astype(jnp.int32) * 16384
                            + hits[-1].astype(jnp.int32))
            else:
                m0 = sum(hits[c].astype(jnp.int32) << (8 * c)
                         for c in range(4))
                m1 = sum(hits[c + 4].astype(jnp.int32) << (8 * c)
                         for c in range(n_children - 4))
                s = jnp.sum(m0) + jnp.sum(m1)
            return acc + s, i + 1

        out = jax.lax.while_loop(lambda c: c[1] < n_iters, body,
                                 (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = out[0]

    pb = jnp.asarray(np.random.rand(1024, 128), jnp.float32)
    o = jnp.asarray(np.random.rand(7, SUBLANES, 128), jnp.float32)
    f = jax.jit(lambda pb, o: _smem_out_call(kernel, pb, o))
    return f, (pb, o)


# ------------------------------------------------- slab step, [1,128] gathers
def _make_slab_step_row1(n_iters, n_children):
    """Like _make_slab_step but the lane-broadcast gathers run on the raw
    [1, 128] row (one vreg) and the slab arithmetic relies on implicit
    sublane broadcasting against the [SUBLANES, 128] ray registers — the
    hypothesis is that materializing 48 full [16, 128] gather results per
    step is paying 16x the vreg traffic the gather needs."""
    def kernel(pb_ref, o_ref, out_ref):
        inv = tuple(o_ref[k] for k in range(3))
        sc = tuple(o_ref[k + 3] for k in range(3))
        tmax = o_ref[6]

        def body(carry):
            acc, i = carry
            # gather on ONE vreg ([8,128]) then slice to [1,128]; the slab
            # arithmetic broadcasts sublanes implicitly ([1,128] operands)
            row8 = jnp.broadcast_to(pb_ref[pl.ds(i % 1024, 1), :], (8, 128))
            b = tuple(jnp.take_along_axis(
                row8, jnp.full((8, 128), k, jnp.int32), 1)[0:1]
                for k in range(6 * n_children))
            hits = [_slab(b[6 * c:6 * c + 6], inv, sc, tmax)
                    for c in range(n_children)]
            m0 = sum(hits[c].astype(jnp.int32) << (8 * c) for c in range(4))
            m1 = sum(hits[c + 4].astype(jnp.int32) << (8 * c)
                     for c in range(n_children - 4))
            s = jnp.sum(m0) + jnp.sum(m1)
            return acc + s, i + 1

        out = jax.lax.while_loop(lambda c: c[1] < n_iters, body,
                                 (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = out[0]

    pb = jnp.asarray(np.random.rand(1024, 128), jnp.float32)
    o = jnp.asarray(np.random.rand(7, SUBLANES, 128), jnp.float32)
    f = jax.jit(lambda pb, o: _smem_out_call(kernel, pb, o))
    return f, (pb, o)


# --------------------------------------------- slab step, fused accept test
def _make_slab_step_fused(n_iters, n_children):
    """_make_slab_step with the fused accept `max(entry,0) <= min(exit,tmax)`
    (one compare instead of three compares + two ands); semantics identical
    for every input including NaN boxes."""
    def kernel(pb_ref, o_ref, out_ref):
        inv = tuple(o_ref[k] for k in range(3))
        sc = tuple(o_ref[k + 3] for k in range(3))
        tmax = o_ref[6]

        def fslab(bb):
            e0 = bb[0] * inv[0] + sc[0]
            e1 = bb[1] * inv[1] + sc[1]
            e2 = bb[2] * inv[2] + sc[2]
            x0 = bb[3] * inv[0] + sc[0]
            x1 = bb[4] * inv[1] + sc[1]
            x2 = bb[5] * inv[2] + sc[2]
            ent = jnp.maximum(jnp.maximum(jnp.minimum(e0, x0),
                                          jnp.minimum(e1, x1)),
                              jnp.minimum(e2, x2))
            ext = jnp.minimum(jnp.minimum(jnp.maximum(e0, x0),
                                          jnp.maximum(e1, x1)),
                              jnp.maximum(e2, x2))
            return jnp.maximum(ent, 0.0) <= jnp.minimum(ext, tmax)

        def body(carry):
            acc, i = carry
            row = pb_ref[pl.ds(i % 1024, 1), :]
            row_b = jnp.broadcast_to(row, (SUBLANES, 128))
            b = tuple(_bcast(row_b, k) for k in range(6 * n_children))
            hits = [fslab(b[6 * c:6 * c + 6]) for c in range(n_children)]
            nq = (n_children + 7) // 8 * 4
            s = jnp.int32(0)
            for j in range(nq):
                pair = hits[2 * j].astype(jnp.int32) * 32768 \
                    + hits[2 * j + 1].astype(jnp.int32)
                s = s + jnp.sum(pair)
            return acc + s, i + 1

        out = jax.lax.while_loop(lambda c: c[1] < n_iters, body,
                                 (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = out[0]

    pb = jnp.asarray(np.random.rand(1024, 128), jnp.float32)
    o = jnp.asarray(np.random.rand(7, SUBLANES, 128), jnp.float32)
    f = jax.jit(lambda pb, o: _smem_out_call(kernel, pb, o))
    return f, (pb, o)


# ------------------------------------------------------------ leaf MT (VPU)
def make_leaf_mt_vpu(n_iters, serialize=True, row1=False):
    """Current leaf visit: broadcast row + 8 unrolled MT tests.

    serialize=True chains tmax through the 8 slots (current kernel);
    False tests all 8 against the step-entry tmax then min-reduces.
    row1=True gathers on the raw [1, 128] row and lets the MT arithmetic
    broadcast sublanes implicitly (one vreg per gather instead of 16).
    """
    PID_BASE = 96

    def kernel(lt_ref, o_ref, out_ref):
        o = tuple(o_ref[k] for k in range(3))
        d = tuple(o_ref[k + 3] for k in range(3))

        def body(carry):
            tmax, t, prim, i = carry
            row = lt_ref[pl.ds(i % 1024, 1), :]
            row_b = jnp.broadcast_to(row, (8, 128) if row1
                                     else (SUBLANES, 128))
            ref_tmax = tmax
            for slot in range(8):
                base = 12 * slot
                lanes = list(range(base, base + 12)) + [PID_BASE + slot]
                v = tuple(jnp.take_along_axis(
                    row_b, jnp.full(row_b.shape, k, jnp.int32), 1)
                    for k in lanes)
                if row1:
                    v = tuple(x[0:1] for x in v)
                (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z,
                 nx, ny, nz, pid) = v
                cx = p0x - o[0]; cy = p0y - o[1]; cz = p0z - o[2]
                rx = d[1] * cz - d[2] * cy
                ry = d[2] * cx - d[0] * cz
                rz = d[0] * cy - d[1] * cx
                inv_det = 1.0 / (d[0] * nx + d[1] * ny + d[2] * nz)
                u = inv_det * (e2x * rx + e2y * ry + e2z * rz)
                vv = inv_det * (e1x * rx + e1y * ry + e1z * rz)
                tt = inv_det * (cx * nx + cy * ny + cz * nz)
                cmp = tmax if serialize else ref_tmax
                h = (u >= 0.) & (vv >= 0.) & (u + vv <= 1.) & (tt > 0.) & \
                    (tt <= cmp)
                tmax = jnp.where(h & (tt < tmax), tt, tmax)
                t = jnp.where(h & (tt <= t), tt, t)
                prim = jnp.where(h & (tt <= t), pid.astype(jnp.int32), prim)
            return tmax, t, prim, i + 1

        init = (jnp.full((SUBLANES, 128), BIG, jnp.float32),
                jnp.full((SUBLANES, 128), BIG, jnp.float32),
                jnp.full((SUBLANES, 128), -1, jnp.int32), jnp.int32(0))
        out = jax.lax.while_loop(lambda c: c[3] < n_iters, body, init)
        out_ref[0] = jnp.sum(out[2])

    lt = jnp.asarray(np.random.rand(1024, 128), jnp.float32)
    o = jnp.asarray(np.random.rand(6, SUBLANES, 128), jnp.float32)
    f = jax.jit(lambda lt, o: _smem_out_call(kernel, lt, o))
    return f, (lt, o)


# ------------------------------------------- leaf MT (VPU), division-free
def make_leaf_mt_vpu_nodiv(n_iters):
    """Sign-flip MT accept (the MXU drain's rule, the round-3 MXU drain (deleted round 4; PERF_NOTES post-mortem))
    on the VPU: no per-slot division; cross-slot 'closer' via cross-
    multiplication (at/adet < bat/badet <=> at*badet < bat*adet, positive
    denominators); ONE division per visit for the winning t."""
    PID_BASE = 96

    def kernel(lt_ref, o_ref, out_ref):
        o = tuple(o_ref[k] for k in range(3))
        d = tuple(o_ref[k + 3] for k in range(3))

        def body(carry):
            tmax, t, prim, i = carry
            row_b = jnp.broadcast_to(lt_ref[pl.ds(i % 1024, 1), :], (8, 128))
            bat = jnp.full((SUBLANES, 128), BIG, jnp.float32)
            badet = jnp.ones((SUBLANES, 128), jnp.float32)
            bprim = jnp.full((SUBLANES, 128), -1, jnp.int32)
            for slot in range(8):
                base = 12 * slot
                lanes = list(range(base, base + 12)) + [PID_BASE + slot]
                v = tuple(jnp.take_along_axis(
                    row_b, jnp.full(row_b.shape, k, jnp.int32), 1)[0:1]
                    for k in lanes)
                (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z,
                 nx, ny, nz, pid) = v
                cx = p0x - o[0]; cy = p0y - o[1]; cz = p0z - o[2]
                rx = d[1] * cz - d[2] * cy
                ry = d[2] * cx - d[0] * cz
                rz = d[0] * cy - d[1] * cx
                det = d[0] * nx + d[1] * ny + d[2] * nz
                s = jnp.where(det < 0.0, -1.0, 1.0)
                adet = det * s
                au = (e2x * rx + e2y * ry + e2z * rz) * s
                av = (e1x * rx + e1y * ry + e1z * rz) * s
                at = (cx * nx + cy * ny + cz * nz) * s
                h = (au >= 0.) & (av >= 0.) & (au + av <= adet) & \
                    (at > 0.) & (at <= tmax * adet)
                closer = h & (at * badet < bat * adet)
                bat = jnp.where(closer, at, bat)
                badet = jnp.where(closer, adet, badet)
                bprim = jnp.where(closer, pid.astype(jnp.int32), bprim)
            ok = bprim >= 0
            bt = bat / badet  # ONE division per visit
            tmax = jnp.where(ok, bt, tmax)
            t = jnp.where(ok, bt, t)
            prim = jnp.where(ok, bprim, prim)
            return tmax, t, prim, i + 1

        init = (jnp.full((SUBLANES, 128), BIG, jnp.float32),
                jnp.full((SUBLANES, 128), BIG, jnp.float32),
                jnp.full((SUBLANES, 128), -1, jnp.int32), jnp.int32(0))
        out = jax.lax.while_loop(lambda c: c[3] < n_iters, body, init)
        out_ref[0] = jnp.sum(out[2])

    lt = jnp.asarray(np.random.rand(1024, 128), jnp.float32)
    o = jnp.asarray(np.random.rand(6, SUBLANES, 128), jnp.float32)
    f = jax.jit(lambda lt, o: _smem_out_call(kernel, lt, o))
    return f, (lt, o)


# ------------------------------------------------------------ leaf MT (MXU)
def make_leaf_mt_mxu(n_iters, n_out=32, dtype=jnp.float32):
    """MXU leaf visit: A [n_out, 16] x F [16, 2048] matmul + accept math."""
    def kernel(at_ref, f_ref, out_ref):
        F = f_ref[:]  # [16, 2048]

        def body(carry):
            best, i = carry
            A = at_ref[pl.ds((i % 512) * n_out, n_out), :]  # [n_out, 16]
            out = jnp.dot(A, F, preferred_element_type=jnp.float32)
            det = out[0:8]
            un = out[8:16]
            vn = out[16:24]
            tn = out[24:32]
            inv_det = 1.0 / det
            u = un * inv_det
            v = vn * inv_det
            t = tn * inv_det
            h = (u >= 0.) & (v >= 0.) & (u + v <= 1.) & (t > 0.) & (t < best)
            tt = jnp.where(h, t, BIG)
            best = jnp.minimum(best, jnp.min(tt, axis=0, keepdims=True))
            return best, i + 1

        init = (jnp.full((1, 2048), BIG, jnp.float32), jnp.int32(0))
        out = jax.lax.while_loop(lambda c: c[1] < n_iters, body, init)
        out_ref[:] = out[0]

    at = jnp.asarray(np.random.rand(512 * n_out, 16), dtype)
    fm = jnp.asarray(np.random.rand(16, 2048), dtype)
    f = jax.jit(lambda at, fm: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32),
    )(at, fm))
    return f, (at, fm)


# ---------------------------------------------------- leaf MT (MXU, full)
def make_leaf_mt_mxu_full(n_iters, precision=None):
    """Full-fidelity MXU leaf visit: A [64, 16] x F [16, 2048] matmul with
    det/t/u/v blocks (rows 0-31) AND pid/nx/ny/nz constant blocks (rows
    32-63; M <= 128 so the extra rows ride the same MXU passes), winner
    extraction per visit via sublane take_along_axis, and rolling best
    state in [1, 2048] layout (t, u, v, pid, nx, ny, nz) — everything the
    real closest-hit drain must produce.  Also rebuilds the walk's
    [16, 128]-layout tmax once per visit (the relayout the real kernel
    would do once per drain)."""
    def kernel(at_ref, f_ref, out_ref):
        F = f_ref[:]  # [16, 2048]
        shape = (1, 2048)

        def body(carry):
            best_t, best_u, best_v, best_p, bnx, bny, bnz, walk_tmax, i = \
                carry
            A = at_ref[pl.ds((i % 512) * 64, 64), :]  # [64, 16]
            out = jnp.dot(A, F, preferred_element_type=jnp.float32,
                          precision=precision)
            det = out[0:8]
            tn = out[8:16]
            un = out[16:24]
            vn = out[24:32]
            # sign-flip accept (no per-slot divide): q >= 0 <=> u >= 0 etc.
            s = jnp.where(det < 0.0, -1.0, 1.0)
            adet = det * s
            at_ = tn * s
            au = un * s
            av = vn * s
            h = (au >= 0.) & (av >= 0.) & (au + av <= adet) & (at_ > 0.) & \
                (at_ <= jnp.broadcast_to(best_t, det.shape) * adet)
            # per-visit winner slot: min scaled-t needs same scale; use
            # t = at/adet only for accepted lanes (one [8,2048] divide)
            t8 = jnp.where(h, at_ / adet, BIG)
            visit_t = jnp.min(t8, axis=0, keepdims=True)       # [1, 2048]
            slot = jnp.argmin(t8, axis=0)[None, :].astype(jnp.int32)
            # Mosaic gather wants indices shaped like the operand
            take = lambda blk: jnp.take_along_axis(
                blk, jnp.broadcast_to(slot, blk.shape), axis=0)[0:1]
            improved = visit_t < best_t
            best_t = jnp.where(improved, visit_t, best_t)
            best_u = jnp.where(improved, take(un) / take(det), best_u)
            best_v = jnp.where(improved, take(vn) / take(det), best_v)
            best_p = jnp.where(improved, take(out[32:40]), best_p)
            bnx = jnp.where(improved, take(out[40:48]), bnx)
            bny = jnp.where(improved, take(out[48:56]), bny)
            bnz = jnp.where(improved, take(out[56:64]), bnz)
            walk_tmax = best_t.reshape(SUBLANES, 128)  # relayout per visit
            return (best_t, best_u, best_v, best_p, bnx, bny, bnz,
                    walk_tmax, i + 1)

        init = (jnp.full(shape, BIG, jnp.float32),) * 3 + \
               (jnp.full(shape, -1.0, jnp.float32),) + \
               (jnp.zeros(shape, jnp.float32),) * 3 + \
               (jnp.full((SUBLANES, 128), BIG, jnp.float32), jnp.int32(0))
        out = jax.lax.while_loop(lambda c: c[-1] < n_iters, body, init)
        out_ref[:] = out[0]

    at = jnp.asarray(np.random.rand(512 * 64, 16), jnp.float32)
    fm = jnp.asarray(np.random.rand(16, 2048), jnp.float32)
    f = jax.jit(lambda at, fm: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32),
    )(at, fm))
    return f, (at, fm)


def make_leaf_mt_mxu_pair(n_iters, precision=None, packed=True):
    """TWO-leaf MXU drain visit, the real-kernel design candidate: a
    [112, 16] A-block (2 leaves x (det/t/u/v + nx/ny/nz rows for 8 slots))
    against F [16, 2048], one M-tile.  ``packed=True`` stores the A-table
    VMEM-efficiently as [L*14, 128] rows (16 a-rows of 16 lanes per row)
    and pays an in-kernel reshape (14,128)->(112,16) per visit — the
    layout question this bench answers (a [*, 16] VMEM array pads lanes
    8x).  Winner extraction across 16 slots; per-visit ns = slope / 1
    (each iter = one 2-leaf visit)."""
    def kernel(at_ref, f_ref, out_ref):
        F = f_ref[:]  # [16, 2048]
        shape = (1, 2048)

        def body(carry):
            best_t, best_u, best_v, best_p, bnx, bny, bnz, i = carry
            if packed:
                blk = at_ref[pl.ds((i % 512) * 14, 14), :]   # [14, 128]
                A = blk.reshape(112, 16)
            else:
                A = at_ref[pl.ds((i % 512) * 112, 112), :]   # [112, 16]
            out = jnp.dot(A, F, preferred_element_type=jnp.float32,
                          precision=precision)
            det = out[0:16]
            tn = out[16:32]
            un = out[32:48]
            vn = out[48:64]
            s = jnp.where(det < 0.0, -1.0, 1.0)
            adet = det * s
            at_ = tn * s
            au = un * s
            av = vn * s
            h = (au >= 0.) & (av >= 0.) & (au + av <= adet) & (at_ > 0.) & \
                (at_ <= jnp.broadcast_to(best_t, det.shape) * adet)
            t16 = jnp.where(h, at_ / adet, BIG)
            visit_t = jnp.min(t16, axis=0, keepdims=True)       # [1, 2048]
            slot = jnp.argmin(t16, axis=0)[None, :].astype(jnp.int32)
            take = lambda blk_: jnp.take_along_axis(
                blk_, jnp.broadcast_to(slot, blk_.shape), axis=0)[0:1]
            improved = visit_t < best_t
            wdet = take(det)
            best_t = jnp.where(improved, visit_t, best_t)
            best_u = jnp.where(improved, take(un) / wdet, best_u)
            best_v = jnp.where(improved, take(vn) / wdet, best_v)
            # pid = leaf_first (scalar) + slot: no pid rows needed
            best_p = jnp.where(improved,
                               (jnp.float32(i % 512) * 8.0
                                + slot.astype(jnp.float32)), best_p)
            bnx = jnp.where(improved, take(out[64:80]), bnx)
            bny = jnp.where(improved, take(out[80:96]), bny)
            bnz = jnp.where(improved, take(out[96:112]), bnz)
            return (best_t, best_u, best_v, best_p, bnx, bny, bnz, i + 1)

        init = (jnp.full(shape, BIG, jnp.float32),) * 3 + \
               (jnp.full(shape, -1.0, jnp.float32),) + \
               (jnp.zeros(shape, jnp.float32),) * 3 + (jnp.int32(0),)
        out = jax.lax.while_loop(lambda c: c[-1] < n_iters, body, init)
        out_ref[:] = out[0]

    if packed:
        at = jnp.asarray(np.random.rand(512 * 14, 128), jnp.float32)
    else:
        at = jnp.asarray(np.random.rand(512 * 112, 16), jnp.float32)
    fm = jnp.asarray(np.random.rand(16, 2048), jnp.float32)
    f = jax.jit(lambda at, fm: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32),
    )(at, fm))
    return f, (at, fm)


def make_leaf_mt_mxu_group(n_iters, group=8, splitk=True):
    """GROUP MXU drain: G leaves per matmul, the post-mortem design after
    Mosaic killed the pair variants (no (14,128)->(112,16) reshape, no
    dynamic_gather across >1 source vreg, no precision=HIGH, and
    precision=highest costs 4x default).

    Precision comes from a manual split-K instead of `precision=`: each f32
    operand is split into 3 bf16 terms (a = a1+a2+a3 exactly to 24 mantissa
    bits); the 6 significant term-pairs (a1b1, a1b2, a2b1, a2b2, a1b3,
    a3b1) are laid side by side along K, so A is [4*8*G, 96] bf16 and F is
    [96, 2048] bf16 — ONE default-precision MXU pass with exact bf16
    products accumulated in f32, i.e. f32-faithful results at bf16-dot
    cost.  Rows are field-major across the group (all dets, all ts, all
    us, all vs) so extraction is static row slicing.

    Extraction is (t, slot) ONLY — no gather: u/v/normals are recomputed
    once per ray AFTER traversal from the winning pid (engine-side).  slot
    is recovered by an equality match against the row-min, so no argmin
    over >8 sublanes either.  Each iter = G leaf visits -> report ns/G.
    """
    G8 = group * 8
    K = 96 if splitk else 16
    NG = 128  # groups resident; cycle through them

    def kernel(at_ref, f_ref, out_ref):
        F = f_ref[:]  # [K, 2048]
        shape = (1, 2048)

        def body(carry):
            best_t, best_p, i = carry
            A = at_ref[pl.ds((i % NG) * 4 * G8, 4 * G8), :]  # [4*G8, K]
            out = jnp.dot(A, F, preferred_element_type=jnp.float32)
            det = out[0 * G8:1 * G8]
            tn = out[1 * G8:2 * G8]
            un = out[2 * G8:3 * G8]
            vn = out[3 * G8:4 * G8]
            s = jnp.where(det < 0.0, -1.0, 1.0)
            adet = det * s
            at_ = tn * s
            au = un * s
            av = vn * s
            h = (au >= 0.) & (av >= 0.) & (au + av <= adet) & (at_ > 0.) & \
                (at_ <= jnp.broadcast_to(best_t, det.shape) * adet)
            t_rows = jnp.where(h, at_ / adet, BIG)            # [G8, 2048]
            visit_t = jnp.min(t_rows, axis=0, keepdims=True)  # [1, 2048]
            # slot via equality match (no argmin over 64 sublanes): the
            # first row equal to the min wins
            rows = jax.lax.broadcasted_iota(jnp.int32, t_rows.shape, 0)
            slot = jnp.min(jnp.where(t_rows <= visit_t, rows, G8),
                           axis=0, keepdims=True)             # [1, 2048]
            improved = visit_t < best_t
            best_t = jnp.where(improved, visit_t, best_t)
            best_p = jnp.where(improved,
                               (i % NG) * G8 + slot, best_p)
            return best_t, best_p, i + 1

        init = (jnp.full(shape, BIG, jnp.float32),
                jnp.full(shape, -1, jnp.int32), jnp.int32(0))
        out = jax.lax.while_loop(lambda c: c[-1] < n_iters, body, init)
        out_ref[:] = out[0] + out[1].astype(jnp.float32) * 1e-9

    dt = jnp.bfloat16 if splitk else jnp.float32
    at = jnp.asarray(np.random.rand(NG * 4 * G8, K), dt)
    fm = jnp.asarray(np.random.rand(K, 2048), dt)
    f = jax.jit(lambda at, fm: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32),
    )(at, fm))
    return f, (at, fm)


def make_mxu_group_hbm(n_iters, group=8, dma=True, matmul=True,
                       extract=True, buf_depth=4):
    """Production-shaped MXU group drain bisect: A blocks streamed from HBM
    through a DMA ring (like the round-3 MXU drain (deleted round 4; PERF_NOTES post-mortem)), one
    [group*32, 128] @ [128, 2048] matmul per group, whole-group winner
    extraction.  Toggles isolate DMA / matmul / extraction costs.
    Each iter = ONE GROUP (= `group` leaf visits)."""
    G8 = group * 8
    ROWS = 4 * G8
    K = 128
    NB = buf_depth

    def kernel(am_hbm, q_ref, f_ref, out_ref, gbuf, sems):
        F = f_ref[:]

        def dma_start(gi, j):
            buf = gi % NB
            row = q_ref[(gi * group + j) % 512]
            return pltpu.make_async_copy(
                am_hbm.at[pl.ds(row * 32, 32), :],
                gbuf.at[buf, pl.ds(j * 32, 32), :],
                sems.at[buf, j])

        if dma:
            for b in range(NB):
                for j in range(group):
                    dma_start(b, j).start()

        def body(carry):
            best_t, best_p, gi = carry
            buf = gi % NB
            if dma:
                for j in range(group):
                    dma_start(gi, j).wait()
            A = gbuf[buf]
            if matmul:
                out = jnp.dot(A, F, preferred_element_type=jnp.float32)
            else:
                out = jnp.broadcast_to(A[:1].astype(jnp.float32),
                                       (ROWS, 2048))
            if extract:
                o4 = out.reshape(group, 4, 8, 2048)
                det, tn, un, vn = o4[:, 0], o4[:, 1], o4[:, 2], o4[:, 3]
                s = jnp.where(det < 0.0, -1.0, 1.0)
                adet = det * s
                at_ = tn * s
                au = un * s
                av = vn * s
                bt = jnp.broadcast_to(best_t.reshape(1, 1, 2048), det.shape)
                h = (au >= 0.) & (av >= 0.) & (au + av <= adet) & \
                    (at_ > 0.) & (at_ <= bt * adet)
                tg = jnp.where(h, at_ / adet, BIG).reshape(G8, 2048)
                visit_t = jnp.min(tg, axis=0, keepdims=True)
                rows = jax.lax.broadcasted_iota(jnp.int32, tg.shape, 0)
                sgl = jnp.min(jnp.where(tg <= visit_t, rows, G8),
                              axis=0, keepdims=True)
                hid = jnp.zeros_like(sgl)
                for j in range(group):
                    row = q_ref[(gi * group + j) % 512]
                    hid = jnp.where(sgl >> 3 == j, row * 8 + (sgl - j * 8),
                                    hid)
                improved = visit_t < best_t
                best_t = jnp.where(improved, visit_t, best_t)
                best_p = jnp.where(improved, hid, best_p)
            else:
                best_t = best_t + jnp.sum(out) * 1e-30

            if dma:
                @pl.when(gi + NB < n_iters)
                def _():
                    for j in range(group):
                        dma_start(gi + NB, j).start()
            return best_t, best_p, gi + 1

        init = (jnp.full((1, 2048), BIG, jnp.float32),
                jnp.full((1, 2048), -1, jnp.int32), jnp.int32(0))
        out = jax.lax.while_loop(lambda c: c[-1] < n_iters, body, init)
        out_ref[:] = out[0] + out[1].astype(jnp.float32) * 1e-9

    L = 4096
    at = jnp.asarray(np.random.rand(L * 32, K), jnp.bfloat16)
    q = jnp.asarray(np.random.randint(0, L, 512), jnp.int32)
    fm = jnp.asarray(np.random.rand(K, 2048), jnp.bfloat16)
    f = jax.jit(lambda at, q, fm: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, ROWS, K), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((NB, group))],
    )(at, q, fm))
    return f, (at, q, fm)


def make_feature_build(n_iters):
    """Per-tile feature-matrix build in-kernel: 10 relayouts of [16,128]
    components to [1, 2048] rows + sublane concat to [16, 2048] (the once-
    per-tile cost of the in-kernel F construction)."""
    def kernel(o_ref, out_ref):
        def body(carry):
            acc, i = carry
            comps = [o_ref[k] * (1.0 + acc) for k in range(6)]
            dxo = [comps[1] * comps[5] - comps[2] * comps[4],
                   comps[2] * comps[3] - comps[0] * comps[5],
                   comps[0] * comps[4] - comps[1] * comps[3]]
            ones = jnp.ones_like(comps[0])
            rows = [c.reshape(1, 2048)
                    for c in comps + dxo + [ones]] + \
                   [jnp.zeros((1, 2048), jnp.float32)] * 6
            F = jnp.concatenate(rows, axis=0)  # [16, 2048]
            return jnp.sum(F) * 1e-9, i + 1

        out = jax.lax.while_loop(lambda c: c[1] < n_iters, body,
                                 (jnp.float32(0), jnp.int32(0)))
        out_ref[0] = out[0]

    o = jnp.asarray(np.random.rand(6, SUBLANES, 128), jnp.float32)
    f = jax.jit(lambda o: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
    )(o))
    return f, (o,)


# --------------------------------------------------------------- relayout
def make_relayout(n_iters):
    def kernel(x_ref, out_ref):
        def body(carry):
            acc, i = carry
            y = (x_ref[:] + acc).reshape(1, 2048)
            z = (y * 2.0).reshape(16, 128)
            return jnp.sum(z) * 1e-9, i + 1

        out = jax.lax.while_loop(lambda c: c[1] < n_iters, body,
                                 (jnp.float32(0), jnp.int32(0)))
        out_ref[0] = out[0]

    x = jnp.asarray(np.random.rand(16, 128), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
    )(x))
    return f, (x,)


# ------------------------------------------------------------------- clz
def make_clz(n_iters):
    def kernel(out_ref):
        def body(carry):
            acc, i = carry
            x = (i * 40503) & 255
            x = jnp.maximum(x, 1)
            ctz = 31 - jax.lax.clz(x & -x)
            hi = 31 - jax.lax.clz(x)
            return acc + ctz + hi, i + 1

        out = jax.lax.while_loop(lambda c: c[1] < n_iters, body,
                                 (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = out[0]

    f = jax.jit(lambda: pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
    )())
    return f, ()


# -------------------------------------------------- standalone traversal
def traversal_baseline(coherent=True, n=1 << 20):
    from rtjax.scenes import cornell_bunny
    from rtjax.kernels.pallas_wide import wide_traverse_closest as pallas_traverse_closest
    scene, camera = cornell_bunny()
    rng = np.random.default_rng(0)
    if coherent:
        res = 1024
        xs = ((np.arange(n) % res) + 0.5) / res
        ys = ((np.arange(n) // res % res) + 0.5) / res
        o, d = camera.get_rays(jnp.asarray(xs, jnp.float32),
                               jnp.asarray(ys, jnp.float32))
    else:
        # random origins inside the Cornell box, random directions: every
        # ray hits something (walls enclose the volume)
        o = jnp.asarray(rng.uniform(-2.5, 2.5, (n, 3)) *
                        np.array([1, 1, 1]) + np.array([0, 2.5, 0]),
                        jnp.float32)
        d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmax = jnp.full(n, np.inf, jnp.float32)
    act = jnp.ones(n, bool)

    f = jax.jit(lambda o, d: pallas_traverse_closest(
        scene.tables, o, d, tmax, act))
    half = n // 2
    f2 = jax.jit(lambda o, d: pallas_traverse_closest(
        scene.tables, o[:half], d[:half], tmax[:half], act[:half]))
    t_full = _time(f, o, d)
    t_half = _time(f2, o, d)
    ns_per = (t_full - t_half) / (n - half) * 1e9
    return 1000.0 / ns_per  # Mrays/s


ALL = {
    "scalar_walk": (make_scalar_walk, 200_000),
    "slab_pair": (partial(_make_slab_step, n_children=2), 30_000),
    "slab_wide4": (partial(_make_slab_step, n_children=4), 30_000),
    "slab_wide8": (partial(_make_slab_step, n_children=8), 30_000),
    "slab_wide8_row1": (partial(_make_slab_step_row1, n_children=8), 30_000),
    "slab_wide8_fused": (partial(_make_slab_step_fused, n_children=8),
                         30_000),
    "slab_wide16_fused": (partial(_make_slab_step_fused, n_children=16),
                          30_000),
    "leaf_mt_vpu": (make_leaf_mt_vpu, 20_000),
    "leaf_mt_vpu_nodiv": (make_leaf_mt_vpu_nodiv, 20_000),
    "leaf_mt_vpu_row1": (partial(make_leaf_mt_vpu, row1=True), 20_000),
    "leaf_mt_vpu_par": (partial(make_leaf_mt_vpu, serialize=False), 20_000),
    "leaf_mt_mxu_f32": (partial(make_leaf_mt_mxu, dtype=jnp.float32), 20_000),
    "leaf_mt_mxu_bf16": (partial(make_leaf_mt_mxu, dtype=jnp.bfloat16),
                         20_000),
    "leaf_mt_mxu_full": (make_leaf_mt_mxu_full, 20_000),
    "leaf_mt_mxu_full_hi": (partial(make_leaf_mt_mxu_full,
                                    precision="highest"), 20_000),
    # NOTE: precision="high" is not supported by Mosaic dot lowering
    "leaf_mt_mxu_pair": (make_leaf_mt_mxu_pair, 20_000),
    "leaf_mt_mxu_pair_hi": (partial(make_leaf_mt_mxu_pair,
                                    precision="highest"), 20_000),
    "leaf_mt_mxu_pair_unpacked": (partial(make_leaf_mt_mxu_pair,
                                          packed=False), 20_000),
    "leaf_mt_mxu_g8_splitk": (make_leaf_mt_mxu_group, 10_000),
    "leaf_mt_mxu_g4_splitk": (partial(make_leaf_mt_mxu_group, group=4),
                              10_000),
    "leaf_mt_mxu_g2_splitk": (partial(make_leaf_mt_mxu_group, group=2),
                              20_000),
    "leaf_mt_mxu_g8_f32": (partial(make_leaf_mt_mxu_group, splitk=False),
                           10_000),
    "mxu_hbm_full": (make_mxu_group_hbm, 5_000),
    "mxu_hbm_nodma": (partial(make_mxu_group_hbm, dma=False), 5_000),
    "mxu_hbm_noext": (partial(make_mxu_group_hbm, extract=False), 5_000),
    "mxu_hbm_nomm": (partial(make_mxu_group_hbm, matmul=False), 5_000),
    "mxu_hbm_dmaonly": (partial(make_mxu_group_hbm, matmul=False,
                                extract=False), 5_000),
    "feature_build": (make_feature_build, 20_000),
    "relayout": (make_relayout, 20_000),
    "clz": (make_clz, 200_000),
}


def main():
    names = sys.argv[1:] or list(ALL)
    for name in names:
        if name == "traverse_coherent":
            print(f"traverse_coherent: {traversal_baseline(True):8.2f} "
                  f"Mrays/s")
            continue
        if name == "traverse_incoherent":
            print(f"traverse_incoherent: {traversal_baseline(False):8.2f} "
                  f"Mrays/s")
            continue
        make_fn, n1 = ALL[name]
        try:
            ns = bench_slope(make_fn, n1)
            print(f"{name}: {ns:8.1f} ns/iter")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
