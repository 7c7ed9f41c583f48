"""Ray-BVH traversal — PERSISTENT per-sublane walkers (lane walker v2).

The tile-mode lane walker (kernels/pallas_lane.py) gives every sublane an
independent traversal cursor but still runs a TILE BARRIER: all 16 walks
of a 2048-ray tile must go idle (and their rings flush) before the next
tile starts, so every tile costs max_s(rounds_s) lockstep rounds while
the early finishers idle.  Measured on the production bench the bounce
tiles still pay 8.2x the walk rounds of camera tiles per ray
(benchmarks/bounce_visits.py, round 4).

Here the walkers are PERSISTENT — the TPU mapping of the CUDA
persistent-threads pattern, and the schedule analog of the reference's
free-running per-thread walk (/root/reference/bvh.cuh:251-303): walker s
owns sublane row s of EVERY tile and advances to its row of the next
tile the moment its current walk is dry.  There is no tile barrier at
all; total lockstep rounds approach max_s(sum_t rounds(t, s)) — the
balanced sum — instead of sum_t(max_s rounds(t, s)).  One lockstep round
still advances all 16 walks with one vector pass (same node-row
assembly, slab test, packed mask exchange, and 16 scalar descents as the
tile-mode kernel); what changes is where each sublane's rays come from:

- ray rows live as flat ``[rows, 128]`` VMEM tables (row = tile *
  SUBLANES + sublane; o/d are component-major ``[3 * rows, 128]``);
- a TRANSITION (walker finishes its row) flushes the six result rows
  with guarded dynamic row stores and stages the next ray row through a
  VMEM scratch tile, merged into the carried ``[16, 128]`` o/d/tmax
  register tiles with one iota-mask select per field;
- ``inv``/``sc``/octants are recomputed per outer round from the carried
  o/d (bit-identical for unchanged rows, cheaper than merging four more
  carried tiles);
- leaf queues are the same per-sublane FIFO rings; walkers never wait at
  a barrier so the rings stay populated and drain passes run dense.  A
  finishing walker flushes its ring fully (its hits must be final before
  the row store), busy walkers take partial drains down to ``width``
  headroom exactly as in tile mode — so the early-drain tmax feedback
  that prunes the walk is preserved.

Semantics are identical to the packet and tile-lane kernels (exact
reference accept rule, triangle.cuh:39-58; same tie-break class as any
visit order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lane import (LQUEUE, LSTACK, _descend_one, _exchange,
                          _mt8_sublane, _mt8_sublane_any, _row_tile,
                          _sublane_any_masks)
from .pallas_wide import (BIG, IDLE, SUBLANES, TILE, WIDTH, WideTables,
                          _bcast_lanes, _pad, _slab, _smem_meta, _vmem_limit,
                          _vmem_meta)

_EPS = float(np.finfo(np.float32).eps)


def _sub_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, 128), 0)


def _make_persist_closest_kernel(meta_vmem: bool = False, width: int = WIDTH):
  """Persistent-walker closest-hit kernel.  Ray/out refs are flat row
  tables (see module docstring); st_ref is a 4-int32 SMEM row of global
  (walk rounds, popped leaf visits, drain rounds) counters."""

  def kernel(*args):
    if meta_vmem:
        o_ref, d_ref, t_ref, act_ref, nxt_ref, nb_ref, lt_ref, *rest = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, nxt_ref, ni_ref, cm_ref, nb_ref,
         lt_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    (hit_ref, tout_ref, prim_ref, nx_ref, ny_ref, nz_ref,
     st_ref, stack_ref, q_ref, xch_ref, stage_ref) = rest
    n_rows = hit_ref.shape[0]
    n_tiles = n_rows // SUBLANES
    dummy = lt_ref.shape[0] - 1  # pack_leaf_rows' all-zero trailing row

    for s in range(SUBLANES):
        stack_ref[s * LSTACK] = 0  # speculative pops read slot 0

    zero = jnp.int32(0)
    z16 = lambda v: (jnp.int32(v),) * SUBLANES
    vf = lambda v: jnp.full((SUBLANES, 128), v, jnp.float32)
    carry0 = (
        z16(-1),                 # ti: tile currently loaded (-1 = none)
        z16(IDLE),               # cur
        z16(0), z16(0), z16(0),  # sp, qn, qh
        vf(0.0), vf(0.0), vf(0.0),           # o
        vf(0.0), vf(0.0), vf(1.0),           # d
        vf(-BIG),                            # tmax (-BIG = no live lanes)
        vf(BIG),                             # best t
        jnp.full((SUBLANES, 128), -1, jnp.int32),  # best prim
        vf(0.0), vf(0.0), vf(0.0),           # best normal
        zero, zero, zero,        # walk rounds, popped visits, drain rounds
    )

    def cond(c):
        ti, cur, sp, qn = c[0], c[1], c[2], c[3]
        more = None
        for s in range(SUBLANES):
            m = (ti[s] < n_tiles) | (cur[s] != IDLE) | (sp[s] > 0) | \
                (qn[s] > 0)
            more = m if more is None else (more | m)
        return more

    def body(c):
        ti, cur, sp, qn, qh = c[0], c[1], c[2], c[3], c[4]
        o, d = c[5:8], c[8:11]
        tmax, t, prim = c[11], c[12], c[13]
        n3 = c[14:17]
        rounds, visits, drounds = c[17], c[18], c[19]

        # fresh per-round ray precompute (bit-identical for unchanged rows)
        safe = tuple(jnp.where(jnp.abs(dk) < _EPS,
                               jnp.copysign(jnp.float32(_EPS), dk), dk)
                     for dk in d)
        inv = tuple(1.0 / dk for dk in safe)
        sc = tuple(-ok * ik for ok, ik in zip(o, inv))

        # per-sublane direction octants, one exchange round-trip
        md = [jnp.sum(dk, axis=1, keepdims=True) for dk in d]
        octv = ((md[0] < 0).astype(jnp.int32)
                | ((md[1] < 0).astype(jnp.int32) << 1)
                | ((md[2] < 0).astype(jnp.int32) << 2))
        octs = _exchange(xch_ref, octv)

        # ---- walk chunk: lockstep rounds until (a) nobody can advance,
        # (b) a ring lacks headroom for one node's leaves (the tile-mode
        # rule — a drain then restores it), or (c) a walker finishes and
        # awaits drain+transition (so it never idles behind the others'
        # walks).  Walkers PARKED past the last tile are not "pending". --
        def walk_cond(c2):
            curs, sps, qns, _ = c2
            alive, room, pending = None, None, None
            for s, (cs, ps, qs) in enumerate(zip(curs, sps, qns)):
                a = (cs != IDLE) | (ps > 0)
                r = qs <= LQUEUE - width
                p = ~a & (ti[s] < n_tiles)
                alive = a if alive is None else (alive | a)
                room = r if room is None else (room & r)
                pending = p if pending is None else (pending | p)
            return alive & room & ~pending

        def walk_body(c2):
            curs, sps, qns, r = c2
            nodes = [jnp.maximum(cc, 0) for cc in curs]
            row_b = _row_tile(nb_ref, nodes)
            b = _bcast_lanes(row_b, range(6 * width))
            hits = [_slab(b[6 * k:6 * k + 6], inv, sc, tmax)
                    for k in range(width)]
            masks = _exchange(xch_ref, _sublane_any_masks(hits, width))
            nc, ns, nq = [], [], []
            for s in range(SUBLANES):
                a, b2, c3 = _descend_one(s, masks[s], curs[s], sps[s],
                                         qns[s], octs, cm_at, info_read,
                                         stack_ref, q_ref, width, qh[s])
                nc.append(a)
                ns.append(b2)
                nq.append(c3)
            return tuple(nc), tuple(ns), tuple(nq), r + 1

        cur, sp, qn, rounds = jax.lax.while_loop(
            walk_cond, walk_body, (cur, sp, qn, rounds))

        # ---- drain: a finished walker flushes its whole ring (its rows
        # are about to be stored), busy ones restore `width` headroom ------
        dr = None
        for s in range(SUBLANES):
            fin = (cur[s] == IDLE) & (sp[s] == 0)
            need = jnp.where(fin, qn[s],
                             jnp.maximum(qn[s] - (LQUEUE - width), 0))
            dr = need if dr is None else jnp.maximum(dr, need)
        nv = zero
        for s in range(SUBLANES):
            nv = nv + jnp.minimum(qn[s], dr)

        def drain_body(c2):
            r, tmax, t, prim, nx, ny, nz = c2
            idxs = [jnp.where(
                r < qn[s],
                q_ref[s * LQUEUE + ((qh[s] + r) & (LQUEUE - 1))] >> 4,
                dummy) for s in range(SUBLANES)]
            row_b = _row_tile(lt_ref, idxs)
            bt, bp, bnx, bny, bnz = _mt8_sublane(row_b, o, d, tmax)
            ok = bp >= 0
            tmax = jnp.where(ok, bt, tmax)
            t = jnp.where(ok, bt, t)
            prim = jnp.where(ok, bp.astype(jnp.int32), prim)
            nx = jnp.where(ok, bnx, nx)
            ny = jnp.where(ok, bny, ny)
            nz = jnp.where(ok, bnz, nz)
            return r + 1, tmax, t, prim, nx, ny, nz

        _, tmax, t, prim, nx, ny, nz = jax.lax.while_loop(
            lambda c2: c2[0] < dr, drain_body,
            (zero, tmax, t, prim) + n3)
        popped = [jnp.minimum(q, dr) for q in qn]
        qh = tuple((h + p) & (LQUEUE - 1) for h, p in zip(qh, popped))
        qn = tuple(q - p for q, p in zip(qn, popped))

        # ---- transitions: flush finished rows, stage the next ray row ----
        new_ti, new_cur, loads = [], [], []
        movebits = zero
        for s in range(SUBLANES):
            move = (cur[s] == IDLE) & (sp[s] == 0) & (qn[s] == 0) & \
                (ti[s] < n_tiles)

            @pl.when(move & (ti[s] >= 0))
            def _(s=s):
                r = ti[s] * SUBLANES + s
                act_row = act_ref[pl.ds(r, 1), :]
                hit_row = (prim[s:s + 1, :] >= 0) & (act_row != 0)
                hit_ref[pl.ds(r, 1), :] = hit_row.astype(jnp.int32)
                tout_ref[pl.ds(r, 1), :] = t[s:s + 1, :]
                prim_ref[pl.ds(r, 1), :] = jnp.where(hit_row,
                                                     prim[s:s + 1, :], -1)
                nx_ref[pl.ds(r, 1), :] = nx[s:s + 1, :]
                ny_ref[pl.ds(r, 1), :] = ny[s:s + 1, :]
                nz_ref[pl.ds(r, 1), :] = nz[s:s + 1, :]

            # dead-row skip: nxt_ref[s * n_tiles + t] holds the first tile
            # >= t whose row t*SUBLANES+s has any ACTIVE lane (n_tiles if
            # none) — walkers jump straight over dead-row runs at one
            # scalar SMEM read, instead of paying the staging loads +
            # result stores + a shared walk round per dead row.  Skipped
            # rows are never stored; the host wrapper masks every output
            # by ``active``.
            base = ti[s] + 1
            nxt_v = nxt_ref[s * n_tiles + jnp.minimum(base, n_tiles - 1)]
            tin = jnp.where(move,
                            jnp.where(base < n_tiles, nxt_v,
                                      jnp.int32(n_tiles)), ti[s])
            load = move & (tin < n_tiles)
            new_ti.append(tin)
            loads.append(load)
            movebits = movebits | (load.astype(jnp.int32) << s)
            # a fresh row enters at the root; if all its lanes are dead
            # (tmax stays -BIG) the first shared round pops it back to
            # IDLE for free.  A finished walker with no next tile parks.
            new_cur.append(jnp.where(load, 0, cur[s]))

        lm = ((movebits >> _sub_iota()) & 1) == 1  # [16,128] loaded-rows

        def staged(field_fn, old):
            """Guarded per-sublane row loads into the staging tile, then
            one iota-mask merge into the carried value."""
            for s in range(SUBLANES):
                @pl.when(loads[s])
                def _(s=s):
                    r = jnp.minimum(new_ti[s], n_tiles - 1) * SUBLANES + s
                    stage_ref[pl.ds(s, 1), :] = field_fn(r)
            return jnp.where(lm, stage_ref[:, :], old)

        o = tuple(staged(lambda r, k=k: o_ref[pl.ds(k * n_rows + r, 1), :],
                         o[k]) for k in range(3))
        d = tuple(staged(lambda r, k=k: d_ref[pl.ds(k * n_rows + r, 1), :],
                         d[k]) for k in range(3))
        tmax = staged(
            lambda r: jnp.where(act_ref[pl.ds(r, 1), :] != 0,
                                t_ref[pl.ds(r, 1), :], -BIG), tmax)
        t = jnp.where(lm, BIG, t)
        prim = jnp.where(lm, -1, prim)
        nx = jnp.where(lm, 0.0, nx)
        ny = jnp.where(lm, 0.0, ny)
        nz = jnp.where(lm, 0.0, nz)

        return (tuple(new_ti), tuple(new_cur), sp, qn, qh) + o + d + \
            (tmax, t, prim, nx, ny, nz, rounds, visits + nv, drounds + dr)

    out = jax.lax.while_loop(cond, body, carry0)
    st_ref[0] = out[17]
    st_ref[1] = out[18]
    st_ref[2] = out[19]
    st_ref[3] = 0

  return kernel


def _make_persist_anyhit_kernel(meta_vmem: bool = False, width: int = WIDTH):
  """Persistent-walker ANY-HIT kernel (occlusion with per-lane excluded
  prim id, bvh.cuh:306-357 semantics).  Same persistent schedule as the
  closest-hit kernel, plus the occlusion early-out: a lane that occludes
  drops its tmax to -BIG (no later slab test can hit), and a walker whose
  lanes are ALL occluded/dead abandons its remaining walk and ring on the
  spot — it transitions to its next row this very round instead of
  popping its stack dry.  That is where the persistent schedule composes
  naturally with any-hit: early outs make walks short and UNEVEN, which
  the barrier-free schedule absorbs while the tile-mode kernels idle."""

  def kernel(*args):
    if meta_vmem:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, nxt_ref, nb_ref, lt_ref,
         *rest) = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, nxt_ref, ni_ref, cm_ref,
         nb_ref, lt_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    (occ_ref, st_ref, stack_ref, q_ref, xch_ref, stage_ref) = rest
    n_rows = occ_ref.shape[0]
    n_tiles = n_rows // SUBLANES
    dummy = lt_ref.shape[0] - 1

    for s in range(SUBLANES):
        stack_ref[s * LSTACK] = 0

    zero = jnp.int32(0)
    z16 = lambda v: (jnp.int32(v),) * SUBLANES
    vf = lambda v: jnp.full((SUBLANES, 128), v, jnp.float32)
    vi = lambda v: jnp.full((SUBLANES, 128), v, jnp.int32)
    carry0 = (
        z16(-1),                 # ti
        z16(IDLE),               # cur
        z16(0), z16(0), z16(0),  # sp, qn, qh
        vf(0.0), vf(0.0), vf(0.0),           # o
        vf(0.0), vf(0.0), vf(1.0),           # d
        vf(-BIG),                            # tmax
        vi(0),                               # occ
        vi(-1),                              # exclude
        zero, zero, zero,        # walk rounds, popped visits, drain rounds
    )

    def cond(c):
        ti, cur, sp, qn = c[0], c[1], c[2], c[3]
        more = None
        for s in range(SUBLANES):
            m = (ti[s] < n_tiles) | (cur[s] != IDLE) | (sp[s] > 0) | \
                (qn[s] > 0)
            more = m if more is None else (more | m)
        return more

    def body(c):
        ti, cur, sp, qn, qh = c[0], c[1], c[2], c[3], c[4]
        o, d = c[5:8], c[8:11]
        tmax, occ, excl = c[11], c[12], c[13]
        rounds, visits, drounds = c[14], c[15], c[16]

        safe = tuple(jnp.where(jnp.abs(dk) < _EPS,
                               jnp.copysign(jnp.float32(_EPS), dk), dk)
                     for dk in d)
        inv = tuple(1.0 / dk for dk in safe)
        sc = tuple(-ok * ik for ok, ik in zip(o, inv))

        md = [jnp.sum(dk, axis=1, keepdims=True) for dk in d]
        octv = ((md[0] < 0).astype(jnp.int32)
                | ((md[1] < 0).astype(jnp.int32) << 1)
                | ((md[2] < 0).astype(jnp.int32) << 2))
        octs = _exchange(xch_ref, octv)

        def walk_cond(c2):
            curs, sps, qns, _ = c2
            alive, room, pending = None, None, None
            for s, (cs, ps, qs) in enumerate(zip(curs, sps, qns)):
                a = (cs != IDLE) | (ps > 0)
                r = qs <= LQUEUE - width
                p = ~a & (ti[s] < n_tiles)
                alive = a if alive is None else (alive | a)
                room = r if room is None else (room & r)
                pending = p if pending is None else (pending | p)
            return alive & room & ~pending

        def walk_body(c2):
            curs, sps, qns, r = c2
            nodes = [jnp.maximum(cc, 0) for cc in curs]
            row_b = _row_tile(nb_ref, nodes)
            b = _bcast_lanes(row_b, range(6 * width))
            hits = [_slab(b[6 * k:6 * k + 6], inv, sc, tmax)
                    for k in range(width)]
            masks = _exchange(xch_ref, _sublane_any_masks(hits, width))
            nc, ns, nq = [], [], []
            for s in range(SUBLANES):
                a, b2, c3 = _descend_one(s, masks[s], curs[s], sps[s],
                                         qns[s], octs, cm_at, info_read,
                                         stack_ref, q_ref, width, qh[s])
                nc.append(a)
                ns.append(b2)
                nq.append(c3)
            return tuple(nc), tuple(ns), tuple(nq), r + 1

        cur, sp, qn, rounds = jax.lax.while_loop(
            walk_cond, walk_body, (cur, sp, qn, rounds))

        dr = None
        for s in range(SUBLANES):
            fin = (cur[s] == IDLE) & (sp[s] == 0)
            need = jnp.where(fin, qn[s],
                             jnp.maximum(qn[s] - (LQUEUE - width), 0))
            dr = need if dr is None else jnp.maximum(dr, need)
        nv = zero
        for s in range(SUBLANES):
            nv = nv + jnp.minimum(qn[s], dr)

        def drain_body(c2):
            r, tmax, occ = c2
            idxs = [jnp.where(
                r < qn[s],
                q_ref[s * LQUEUE + ((qh[s] + r) & (LQUEUE - 1))] >> 4,
                dummy) for s in range(SUBLANES)]
            row_b = _row_tile(lt_ref, idxs)
            h = _mt8_sublane_any(row_b, o, d, tmax, excl)
            occ = occ | h.astype(jnp.int32)
            # occluded lanes stop pruning the walk AND stop matching
            tmax = jnp.where(occ != 0, -BIG, tmax)
            return r + 1, tmax, occ

        _, tmax, occ = jax.lax.while_loop(
            lambda c2: c2[0] < dr, drain_body, (zero, tmax, occ))
        popped = [jnp.minimum(q, dr) for q in qn]
        qh = tuple((h + p) & (LQUEUE - 1) for h, p in zip(qh, popped))
        qn = tuple(q - p for q, p in zip(qn, popped))

        # occlusion early-out: a walker with no live lane left (every lane
        # occluded, dead, or missed) abandons its walk and ring — nothing
        # it could still visit can change occ, so it transitions now
        alive_v = jnp.sum((tmax > -BIG).astype(jnp.int32), axis=1,
                          keepdims=True)
        alives = _exchange(xch_ref, alive_v)
        loaded = tuple(ti[s] >= 0 for s in range(SUBLANES))
        cur = tuple(jnp.where(loaded[s] & (alives[s] == 0), IDLE, cur[s])
                    for s in range(SUBLANES))
        sp = tuple(jnp.where(loaded[s] & (alives[s] == 0), 0, sp[s])
                   for s in range(SUBLANES))
        qn = tuple(jnp.where(loaded[s] & (alives[s] == 0), 0, qn[s])
                   for s in range(SUBLANES))

        # ---- transitions ----
        new_ti, new_cur, loads = [], [], []
        movebits = zero
        for s in range(SUBLANES):
            move = (cur[s] == IDLE) & (sp[s] == 0) & (qn[s] == 0) & \
                (ti[s] < n_tiles)

            @pl.when(move & (ti[s] >= 0))
            def _(s=s):
                r = ti[s] * SUBLANES + s
                act_row = act_ref[pl.ds(r, 1), :]
                occ_row = (occ[s:s + 1, :] != 0) & (act_row != 0)
                occ_ref[pl.ds(r, 1), :] = occ_row.astype(jnp.int32)

            # dead-row skip (see the closest-hit kernel): jump over rows
            # with no active lane via the precomputed next-live-tile table
            base = ti[s] + 1
            nxt_v = nxt_ref[s * n_tiles + jnp.minimum(base, n_tiles - 1)]
            tin = jnp.where(move,
                            jnp.where(base < n_tiles, nxt_v,
                                      jnp.int32(n_tiles)), ti[s])
            load = move & (tin < n_tiles)
            new_ti.append(tin)
            loads.append(load)
            movebits = movebits | (load.astype(jnp.int32) << s)
            new_cur.append(jnp.where(load, 0, cur[s]))

        lm = ((movebits >> _sub_iota()) & 1) == 1

        def staged(field_fn, old):
            for s in range(SUBLANES):
                @pl.when(loads[s])
                def _(s=s):
                    r = jnp.minimum(new_ti[s], n_tiles - 1) * SUBLANES + s
                    stage_ref[pl.ds(s, 1), :] = field_fn(r)
            return jnp.where(lm, stage_ref[:, :], old)

        o = tuple(staged(lambda r, k=k: o_ref[pl.ds(k * n_rows + r, 1), :],
                         o[k]) for k in range(3))
        d = tuple(staged(lambda r, k=k: d_ref[pl.ds(k * n_rows + r, 1), :],
                         d[k]) for k in range(3))
        tmax = staged(
            lambda r: jnp.where(act_ref[pl.ds(r, 1), :] != 0,
                                t_ref[pl.ds(r, 1), :], -BIG), tmax)
        # int staging rides the float staging tile bit-exactly via bitcasts
        bc = jax.lax.bitcast_convert_type
        excl = bc(staged(
            lambda r: bc(ex_ref[pl.ds(r, 1), :], jnp.float32),
            bc(excl, jnp.float32)), jnp.int32)
        occ = jnp.where(lm, 0, occ)

        return (tuple(new_ti), tuple(new_cur), sp, qn, qh) + o + d + \
            (tmax, occ, excl, rounds, visits + nv, drounds + dr)

    out = jax.lax.while_loop(cond, body, carry0)
    st_ref[0] = out[14]
    st_ref[1] = out[15]
    st_ref[2] = out[16]
    st_ref[3] = 0

  return kernel


_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)
_SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)


def _persist_scratch():
    return [pltpu.SMEM((SUBLANES * LSTACK,), jnp.int32),
            pltpu.SMEM((SUBLANES * LQUEUE,), jnp.int32),
            pltpu.VMEM((SUBLANES, 128), jnp.int32),
            pltpu.VMEM((SUBLANES, 128), jnp.float32)]


def _next_live_tiles(act):
    """``[SUBLANES * n_tiles]`` int32: for walker ``s`` and tile ``t``, the
    first tile ``u >= t`` whose row ``u * SUBLANES + s`` has any active
    lane (``n_tiles`` if none).  One suffix cummin on [16, n_tiles] —
    fuses into the act-row packing.  Lets the kernels jump over dead-row
    runs at one scalar SMEM read per transition instead of paying the
    staging loads + result stores + a shared walk round per dead row
    (measured ~2-3 us/row: an all-dead 1024-row launch cost ~4.8 ms,
    benchmarks/repass_split.py)."""
    n_rows = act.shape[0]
    n_tiles = n_rows // SUBLANES
    live = (jnp.sum(act, axis=1) > 0).reshape(n_tiles, SUBLANES).T
    tidx = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, n_tiles), 1)
    cand = jnp.where(live, tidx, jnp.int32(n_tiles))
    return jax.lax.cummin(cand[:, ::-1], axis=1)[:, ::-1].reshape(-1)


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def persist_traverse_closest(tables: WideTables, origin, direction, tmax,
                             active, interpret: bool = False,
                             with_stats: bool = False,
                             meta_vmem: bool = False):
    """Persistent-walker closest-hit traversal.  Same contract as
    pallas_lane.lane_traverse_closest: (hit, t, prim, normal) plus, with
    ``with_stats``, a (walk rounds, popped leaf visits, drain rounds)
    triple; requires unpacked node rows and a VMEM-resident leaf table."""
    assert not tables.packed_nodes, "lane walkers need unpacked node rows"
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_rows = n_pad // 128

    def rows3(x, fill):
        x = _pad(x, n_pad, fill)
        if not isinstance(x, tuple):
            x = tuple(x[:, k] for k in range(3))
        return jnp.concatenate([c.reshape(n_rows, 128) for c in x], axis=0)

    o = rows3(origin, 0.0)
    d = rows3(direction, 1.0)
    tm = _pad(tmax, n_pad, 0.0).reshape(n_rows, 128)
    act = _pad(active.astype(jnp.int32), n_pad, 0).reshape(n_rows, 128)

    nxt = _next_live_tiles(act)

    shp = (n_rows, 128)
    if meta_vmem:
        in_specs = [_VMEM] * 4 + [_SMEM] + [_VMEM] * 2
        ins = (o, d, tm, act, nxt, tables.node_bounds, tables.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _SMEM,
                    _VMEM, _VMEM]
        ins = (o, d, tm, act, nxt, tables.node_info, tables.child_meta,
               tables.node_bounds, tables.leaf_tris)
    out_shape = [jax.ShapeDtypeStruct(shp, jnp.int32),
                 jax.ShapeDtypeStruct(shp, jnp.float32),
                 jax.ShapeDtypeStruct(shp, jnp.int32)]
    out_shape += [jax.ShapeDtypeStruct(shp, jnp.float32)] * 3
    out_shape += [jax.ShapeDtypeStruct((4,), jnp.int32)]
    outs = pl.pallas_call(
        _make_persist_closest_kernel(meta_vmem, tables.width),
        in_specs=in_specs,
        out_specs=[_VMEM] * 6 + [_SMEM],
        out_shape=out_shape,
        scratch_shapes=_persist_scratch(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad)),
        interpret=interpret,
    )(*ins)

    flat = lambda a: a.reshape(n_pad)[:n]
    hit, t, prim, nx, ny, nz, st = outs
    # rows with no active lane are skipped by the walkers (never stored),
    # so every output is masked to the stored-dead-lane values here
    # (hit=0, t=BIG, prim=-1, normal=0) — bit-identical to the pre-skip
    # kernel for active lanes AND for dead lanes in visited rows.
    hit = (flat(hit) != 0) & active
    t = jnp.where(active, flat(t), jnp.float32(BIG))
    prim = jnp.where(hit, flat(prim), -1)
    zf = jnp.float32(0.0)
    normal = (jnp.where(active, flat(nx), zf),
              jnp.where(active, flat(ny), zf),
              jnp.where(active, flat(nz), zf))
    if not as_v3:
        normal = jnp.stack(normal, axis=-1)
    out = (hit, t, prim, normal)
    if with_stats:
        out = out + ((st[0], st[1], st[2]),)
    return out


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def persist_traverse_anyhit(tables: WideTables, origin, direction, tmax,
                            exclude, active, interpret: bool = False,
                            with_stats: bool = False,
                            meta_vmem: bool = False):
    """Persistent-walker any-hit traversal (occlusion with per-lane prim
    exclusion, bvh.cuh:306-357 semantics).  Same contract as
    pallas_lane.lane_traverse_anyhit; requires unpacked node rows and a
    VMEM-resident leaf table.  Occluded/dead walkers transition early
    (see _make_persist_anyhit_kernel)."""
    assert not tables.packed_nodes, "lane walkers need unpacked node rows"
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_rows = n_pad // 128

    def rows3(x, fill):
        x = _pad(x, n_pad, fill)
        if not isinstance(x, tuple):
            x = tuple(x[:, k] for k in range(3))
        return jnp.concatenate([c.reshape(n_rows, 128) for c in x], axis=0)

    o = rows3(origin, 0.0)
    d = rows3(direction, 1.0)
    tm = _pad(tmax, n_pad, 0.0).reshape(n_rows, 128)
    act = _pad(active.astype(jnp.int32), n_pad, 0).reshape(n_rows, 128)
    ex = _pad(exclude, n_pad, -1).reshape(n_rows, 128)

    nxt = _next_live_tiles(act)

    shp = (n_rows, 128)
    if meta_vmem:
        in_specs = [_VMEM] * 5 + [_SMEM] + [_VMEM] * 2
        ins = (o, d, tm, act, ex, nxt, tables.node_bounds, tables.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _SMEM,
                    _VMEM, _VMEM]
        ins = (o, d, tm, act, ex, nxt, tables.node_info, tables.child_meta,
               tables.node_bounds, tables.leaf_tris)
    occ, st = pl.pallas_call(
        _make_persist_anyhit_kernel(meta_vmem, tables.width),
        in_specs=in_specs,
        out_specs=[_VMEM, _SMEM],
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct((4,), jnp.int32)],
        scratch_shapes=_persist_scratch(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad)),
        interpret=interpret,
    )(*ins)
    # skipped (all-dead) rows are never stored; mask to the stored dead-
    # lane value (occ=0)
    occluded = (occ.reshape(n_pad)[:n] != 0) & active
    if with_stats:
        return occluded, (st[0], st[1], st[2])
    return occluded
