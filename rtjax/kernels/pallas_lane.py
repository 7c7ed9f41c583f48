"""Ray-BVH traversal — per-SUBLANE independent walks (the "lane walker").

Third-generation traversal engine, built to break the bounce-ray
divergence wall of the packet kernel (kernels/pallas_wide.py).  A packet
tile of SUBLANES x 128 rays shares ONE traversal cursor, so it pays the
UNION of all 2048 rays' node sets: measured on the production bench,
bounce(+shadow) tiles cost 14.2x the walk rounds and 8.2x the leaf
visits of camera tiles per ray (benchmarks/bounce_visits.py, round 3) —
the single largest gap vs the reference's per-thread SIMT walk
(/root/reference/bvh.cuh:251-303, one CUDA thread = one ray with a
private 29-entry stack, device_stack.cuh:4-11).

Here every SUBLANE (128 rays) is an independent walker: 16 cursors, 16
mask-stack slices, 16 leaf queues per tile.  One walk round advances all
16 walks with ONE pass of vector work:

1. **Per-sublane node rows.**  16 dynamic row loads assemble a [16, 128]
   tile where sublane s holds *its* cursor's bounds row; the packet
   kernel's static-lane `take_along_axis` broadcasts then give each
   sublane its own node's child bounds, and one slab pass tests 16
   DIFFERENT nodes against their own 128 rays.
2. **Packed per-sublane hit masks.**  Child hits pack into 8-bit count
   fields (counts <= 128) and reduce along lanes to [16, 1]; the masks
   round-trip through a tiny VMEM exchange buffer to the scalar core
   (one vector store + 16 static scalar loads) — the per-sublane
   replacement for the packet kernel's single packed full-tile reduction.
3. **16 independent scalar descents.**  The descend/push/pop logic of
   pallas_wide._walk_step runs unrolled per sublane on disjoint SMEM
   stack/queue slices; with 16 independent chains the scalar unit is
   issue-bound, not latency-bound (the packet walk needed interleaved
   cursors to hide its one reduction->descent->row-load chain).
4. **Lockstep leaf drains.**  Each drain round pops ONE queued leaf per
   sublane and MT-tests the assembled [16, 128] row tile against the
   tile's own rays: up to 16 leaf visits per packet-visit-sized vector
   pass.  Sublanes with empty queues pop the all-zero dummy row
   (pack_leaf_rows appends it), which rejects every MT test.

Semantics are identical to the packet kernel (exact reference accept
rule, triangle.cuh:39-58; any-hit exclusion by prim index with early
exit, bvh.cuh:306-357) — only the schedule differs, so closest-hit
results are bitwise-equal hits (tie-breaks between equal-t hits may
differ, as between any two visit orders).

Tables are shared with the packet kernel (WideTables, width 8 or 16,
UNPACKED node rows, VMEM-resident leaf table): the engine picks the
walker per launch (render/trace.py); big scenes (packed rows / leaf_hbm)
stay on the packet kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_wide import (BIG, IDLE, MAX_LEAF, PID_BASE, SUBLANES, TILE,
                          WIDTH, WideTables, _bcast_lanes, _ctz, _pad,
                          _pick, _scalar_tiles, _slab, _smem_meta,
                          _to_tiles, _vmem_meta, _vmem_limit)

import os as _os

LSTACK = 40     # per-sublane mask-stack depth: pushes consume one tree
                # level each, wide depth <= binary depth <= ~30 + margin
                # (render/trace.py refuses the lane walker when the build's
                # actual depth exceeds this)
# per-sublane leaf-queue capacity (power of two: queues are FIFO rings).
# When any sublane's headroom drops below `width` the tile takes a PARTIAL
# drain — only the dense head rounds, down to full headroom — and resumes
# walking; the full flush happens once every walk is dry.  Entries from
# many chunks accumulate, so drain rounds run with most queues nonempty
# (measured: full drains at chunk end averaged ~5 of 16 possible visits
# per vector pass, the lane walker's largest overhead).
LQUEUE = int(_os.environ.get("RTJAX_LQUEUE", "0")) or 32
assert LQUEUE & (LQUEUE - 1) == 0, "ring indexing needs a power of two"
# per-sublane stall (A/B flag, default OFF — measured loss): 1 = a
# queue-full sublane idles in place while the rest keep filling; deferring
# drains this way widened the stale-tmax window and ADDED walk rounds
# (582 vs 379 on coherent bunny tiles) — early drains' tmax feedback
# beats drain balance.  Partial drains (above) get both.
LSTALL = _os.environ.get("RTJAX_LSTALL", "0") != "0"


def _row_tile(table_ref, idxs):
    """Assemble a [SUBLANES, 128] tile whose sublane s is table row
    ``idxs[s]`` (16 dynamic row loads + concat: the per-sublane analog of
    pallas_wide._node_row's single broadcast row)."""
    return jnp.concatenate(
        [table_ref[pl.ds(i, 1), :] for i in idxs], axis=0)


def _sublane_any_masks(hits, width):
    """Per-sublane child-hit masks: [16, 1] int32 where bit c of sublane s
    is set iff any of s's 128 lanes hit child c.

    Hits pack 4 children per int32 as 8-bit count fields (lane counts
    <= 128 < 256), reduce along lanes, then the count fields collapse to
    bits — width/4 packed lane-reductions instead of width full ones."""
    mask = None
    for g in range(width // 4):
        pk = None
        for j in range(4):
            b = hits[4 * g + j].astype(jnp.int32) << (8 * j)
            pk = b if pk is None else pk + b
        s = jnp.sum(pk, axis=1, keepdims=True)  # [16, 1]
        for j in range(4):
            bit = (((s >> (8 * j)) & 255) > 0).astype(jnp.int32) \
                << (4 * g + j)
            mask = bit if mask is None else mask | bit
    return mask


def _exchange(xch_ref, vec):
    """Vector -> 16 scalars: store a [16, 1] int32 broadcast into the
    exchange scratch, read back one static scalar per sublane.  (Mosaic
    has no direct vector-lane -> scalar extraction; memory ordering on
    the scratch ref serializes the store before the loads.)"""
    xch_ref[:, :] = jnp.broadcast_to(vec, (SUBLANES, 128))
    return tuple(xch_ref[s, 0] for s in range(SUBLANES))


def _mt8_sublane(row_b, o, d, tmax):
    """Per-sublane closest-hit MT over a [16, 128] row tile: sublane s
    tests ITS row's 8 slots against its own rays.  Same accept rule and
    return contract as pallas_wide._mt8."""
    shape = tmax.shape
    best_t = jnp.full(shape, BIG, jnp.float32)
    best_p = jnp.full(shape, -1.0, jnp.float32)
    best_nx = jnp.zeros(shape, jnp.float32)
    best_ny = jnp.zeros(shape, jnp.float32)
    best_nz = jnp.zeros(shape, jnp.float32)
    for slot in range(MAX_LEAF):
        base = 12 * slot
        (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz, pid) = \
            _bcast_lanes(row_b, list(range(base, base + 12))
                         + [PID_BASE + slot])
        cx = p0x - o[0]; cy = p0y - o[1]; cz = p0z - o[2]
        rx = d[1] * cz - d[2] * cy
        ry = d[2] * cx - d[0] * cz
        rz = d[0] * cy - d[1] * cx
        inv_det = 1.0 / (d[0] * nx + d[1] * ny + d[2] * nz)
        u = inv_det * (e2x * rx + e2y * ry + e2z * rz)
        v = inv_det * (e1x * rx + e1y * ry + e1z * rz)
        t = inv_det * (cx * nx + cy * ny + cz * nz)
        h = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (t <= tmax)
        closer = h & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_p = jnp.where(closer, pid, best_p)
        best_nx = jnp.where(closer, nx, best_nx)
        best_ny = jnp.where(closer, ny, best_ny)
        best_nz = jnp.where(closer, nz, best_nz)
    return best_t, best_p, best_nx, best_ny, best_nz


def _mt8_sublane_any(row_b, o, d, tmax, exclude):
    """Per-sublane any-hit MT over a [16, 128] row tile with per-lane
    excluded prim id (pallas_wide._mt8_any, per-sublane rows)."""
    hit_any = None
    for slot in range(MAX_LEAF):
        base = 12 * slot
        (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz, pid) = \
            _bcast_lanes(row_b, list(range(base, base + 12))
                         + [PID_BASE + slot])
        cx = p0x - o[0]; cy = p0y - o[1]; cz = p0z - o[2]
        rx = d[1] * cz - d[2] * cy
        ry = d[2] * cx - d[0] * cz
        rz = d[0] * cy - d[1] * cx
        inv_det = 1.0 / (d[0] * nx + d[1] * ny + d[2] * nz)
        u = inv_det * (e2x * rx + e2y * ry + e2z * rz)
        v = inv_det * (e1x * rx + e1y * ry + e1z * rz)
        t = inv_det * (cx * nx + cy * ny + cz * nz)
        h = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & \
            (t <= tmax) & (pid.astype(jnp.int32) != exclude)
        hit_any = h if hit_any is None else (hit_any | h)
    return hit_any


def _lane_setup(o_ref, d_ref, t_ref, ti):
    """Ray precompute for tile ti (pallas_wide._ray_setup minus the
    tile-wide octant — the lane walker's octants are per sublane)."""
    eps = float(np.finfo(np.float32).eps)
    o = (o_ref[ti, 0], o_ref[ti, 1], o_ref[ti, 2])
    d = (d_ref[ti, 0], d_ref[ti, 1], d_ref[ti, 2])
    safe = tuple(jnp.where(jnp.abs(dk) < eps, jnp.copysign(eps, dk), dk)
                 for dk in d)
    inv = tuple(1.0 / dk for dk in safe)
    sc = tuple(-ok * ik for ok, ik in zip(o, inv))
    return o, d, inv, sc, t_ref[ti]


def _sublane_octants(xch_ref, d, valid):
    """Per-sublane (octant | any_valid << 3) scalars, one exchange."""
    md = [jnp.sum(dk, axis=1, keepdims=True) for dk in d]
    octv = ((md[0] < 0).astype(jnp.int32)
            | ((md[1] < 0).astype(jnp.int32) << 1)
            | ((md[2] < 0).astype(jnp.int32) << 2))
    anyv = (jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)
            > 0).astype(jnp.int32)
    return _exchange(xch_ref, octv | (anyv << 3))


def _descend_one(s, m, cur, sp, qn, octs, cm_at, info_read, stack_ref,
                 q_ref, width, qh=None):
    """One sublane's scalar descent: enqueue leaf hits, descend the first
    internal hit (push the rest as one mask-stack entry) or pop.  Mirrors
    pallas_wide._walk_step's scalar half on the sublane's private stack
    slice [s*LSTACK, (s+1)*LSTACK) and queue slice [s*LQUEUE, ...).

    A sublane whose queue lacks headroom for a full node of leaves STALLS:
    it keeps its cursor and does nothing this round, while other sublanes
    keep walking and filling their queues.  The walk chunk then ends only
    when every live sublane is stalled or done, so drains start with
    BALANCED queues — lockstep drain rounds cost max(qn_s), and without
    stalling one hot sublane forced a drain while the others held ~nothing
    (measured imbalance was the lane walker's largest overhead)."""
    mask_all = (1 << width) - 1
    shift = width + 1
    stall = (qn > LQUEUE - width) if LSTALL else jnp.bool_(False)
    active = (cur != IDLE) & ~stall
    node = jnp.maximum(cur, 0)
    m = jnp.where(active, m, 0)

    info = info_read(node)
    lm = info & mask_all
    axis = (info >> width) & 3
    rev = (octs[s] >> axis) & 1
    leaf_hits = m & lm
    int_hits = m & ~lm & mask_all
    cm_node = cm_at(node)

    base = jnp.int32(0) if qh is None else qh

    def q_body(c2):
        lh, q = c2
        q_ref[s * LQUEUE + ((base + q) & (LQUEUE - 1))] = cm_node(_ctz(lh))
        return lh & (lh - 1), q + 1

    _, qn = jax.lax.while_loop(lambda c2: c2[0] != 0, q_body,
                               (leaf_hits, qn))

    has = int_hits != 0
    first = _pick(int_hits, rev)
    rest = int_hits & ~(1 << first)

    @pl.when(has & (rest != 0))
    def _():
        stack_ref[s * LSTACK + sp] = (node << shift) | (rest << 1) | rev
    sp = jnp.where(has & (rest != 0), sp + 1, sp)
    nxt_direct = cm_node(first) >> 4

    can_pop = sp > 0
    entry = stack_ref[s * LSTACK + jnp.maximum(sp - 1, 0)]
    pnode = entry >> shift
    pmask = (entry >> 1) & mask_all
    prev = entry & 1
    pfirst = _pick(pmask, prev)
    prest = pmask & ~(1 << pfirst)
    do_pop = ~has & ~stall & can_pop

    @pl.when(do_pop & (prest != 0))
    def _():
        stack_ref[s * LSTACK + sp - 1] = \
            (pnode << shift) | (prest << 1) | prev
    sp = jnp.where(do_pop & (prest == 0), sp - 1, sp)
    nxt_pop = cm_at(pnode)(pfirst) >> 4

    new_cur = jnp.where(has, nxt_direct,
                        jnp.where(do_pop, nxt_pop,
                                  jnp.where(stall, cur, IDLE)))
    return new_cur, sp, qn


def _lane_walk_round(curs, sps, qns, tmax, octs, refs, inv, sc, width,
                     qhs=None):
    """One lockstep round: slab-test all 16 cursors' nodes (one vector
    pass), then run 16 independent scalar descents.  ``qhs``: per-sublane
    FIFO ring heads (None = queues start at slot 0, the full-drain mode)."""
    nb_ref, cm_at, info_read, stack_ref, q_ref, xch_ref = refs
    nodes = [jnp.maximum(c, 0) for c in curs]
    row_b = _row_tile(nb_ref, nodes)
    b = _bcast_lanes(row_b, range(6 * width))
    hits = [_slab(b[6 * c:6 * c + 6], inv, sc, tmax) for c in range(width)]
    masks = _exchange(xch_ref, _sublane_any_masks(hits, width))

    new_c, new_s, new_q = [], [], []
    for s in range(SUBLANES):
        c, p, q = _descend_one(s, masks[s], curs[s], sps[s], qns[s], octs,
                               cm_at, info_read, stack_ref, q_ref, width,
                               None if qhs is None else qhs[s])
        new_c.append(c)
        new_s.append(p)
        new_q.append(q)
    return tuple(new_c), tuple(new_s), tuple(new_q)


def _lane_drain(qns, tmax, ds, lt_ref, q_ref, drain_fn, qhs=None,
                flush=None, width=WIDTH):
    """Lockstep leaf drain: round r pops queue entry r of every sublane
    (the dummy row when r >= qn_s) and runs one [16, 128] MT pass.

    Full mode (qhs is None): empties every queue; rounds = max(qn_s).
    PARTIAL mode (FIFO rings): drains only the DENSE head rounds — enough
    that every queue regains ``width`` headroom — unless ``flush`` is set
    (walks all dry), which empties everything.  Entries accumulate across
    walk chunks, so partial rounds run with most queues nonempty (~3x the
    visits per vector pass of chunk-end full drains), while draining as
    EARLY as the full mode keeps the tmax feedback that prunes the walk.

    Returns (tmax, ds, visits, rounds, new_qhs, new_qns)."""
    dummy = lt_ref.shape[0] - 1  # pack_leaf_rows' all-zero trailing row
    mx = qns[0]
    for q in qns[1:]:
        mx = jnp.maximum(mx, q)
    if qhs is None:
        rounds = mx
        heads = (jnp.int32(0),) * SUBLANES
    else:
        rounds = jnp.where(flush, mx,
                           jnp.maximum(mx - (LQUEUE - width), 0))
        heads = qhs
    visits = jnp.int32(0)
    for q in qns:
        visits = visits + jnp.minimum(q, rounds)

    def body(c2):
        r, tmax, ds = c2
        idxs = [jnp.where(
            r < qns[s],
            q_ref[s * LQUEUE + ((heads[s] + r) & (LQUEUE - 1))] >> 4,
            dummy) for s in range(SUBLANES)]
        row_b = _row_tile(lt_ref, idxs)
        tmax, ds = drain_fn(row_b, tmax, ds)
        return r + 1, tmax, ds

    _, tmax, ds = jax.lax.while_loop(lambda c2: c2[0] < rounds, body,
                                     (jnp.int32(0), tmax, ds))
    popped = [jnp.minimum(q, rounds) for q in qns]
    new_qhs = tuple((h + p) & (LQUEUE - 1) for h, p in zip(heads, popped))
    new_qns = tuple(q - p for q, p in zip(qns, popped))
    return tmax, ds, visits, rounds, new_qhs, new_qns


def _run_lane_walk(refs, lt_ref, inv, sc, octs, roots, tmax, ds, drain_fn,
                   stop_fn, width):
    """Alternate lockstep walk chunks with PARTIAL lockstep drains until
    every sublane's cursor is idle, every stack empty, and every FIFO ring
    drained.  Returns (rounds, visits, drain_rounds, tmax, ds)."""
    q_ref = refs[4]
    zero = jnp.int32(0)
    curs0 = tuple(roots)
    sps0 = (zero,) * SUBLANES
    qns0 = (zero,) * SUBLANES
    qhs0 = (zero,) * SUBLANES

    def alive(curs, sps):
        a = curs[0] != IDLE
        for c in curs[1:]:
            a = a | (c != IDLE)
        for p in sps:
            a = a | (p > 0)
        return a

    def any_q(qns):
        q = qns[0] > 0
        for x in qns[1:]:
            q = q | (x > 0)
        return q

    def outer_cond(carry):
        curs, sps, qns, ds = carry[0], carry[1], carry[2], carry[8]
        return ~stop_fn(ds) & (alive(curs, sps) | any_q(qns))

    def outer_body(carry):
        curs, sps, qns, qhs, rounds, visits, drounds, tmax, ds = carry

        def walk_cond(c2):
            # LSTALL: keep walking while ANY sublane can still advance —
            # stalled (queue-full) sublanes idle in place while the rest
            # fill their queues.  Default: any full queue ends the chunk
            # for the whole tile (cond = any(alive) & all(room)); the
            # partial drain below then takes only the dense head rounds.
            curs, sps, qns, _ = c2
            if LSTALL:
                go = None
                for c, p, q in zip(curs, sps, qns):
                    g = ((c != IDLE) | (p > 0)) & (q <= LQUEUE - width)
                    go = g if go is None else (go | g)
                return go
            any_alive, all_room = None, None
            for c, p, q in zip(curs, sps, qns):
                a = (c != IDLE) | (p > 0)
                r = q <= LQUEUE - width
                any_alive = a if any_alive is None else (any_alive | a)
                all_room = r if all_room is None else (all_room & r)
            return any_alive & all_room

        def walk_body(c2):
            curs, sps, qns, rounds = c2
            curs, sps, qns = _lane_walk_round(curs, sps, qns, tmax, octs,
                                              refs, inv, sc, width, qhs)
            return curs, sps, qns, rounds + 1

        curs, sps, qns, rounds = jax.lax.while_loop(
            walk_cond, walk_body, (curs, sps, qns, rounds))
        tmax, ds, nv, nd, qhs, qns = _lane_drain(
            qns, tmax, ds, lt_ref, q_ref, drain_fn, qhs=qhs,
            flush=~alive(curs, sps), width=width)
        return (curs, sps, qns, qhs, rounds,
                visits + nv, drounds + nd, tmax, ds)

    out = jax.lax.while_loop(
        outer_cond, outer_body,
        (curs0, sps0, qns0, qhs0, zero, zero, zero, tmax, ds))
    return out[4], out[5], out[6], out[7], out[8]


def _make_lane_closest_kernel(meta_vmem: bool = False, width: int = WIDTH):
  """Lane-walker closest-hit kernel.  Same in/out contract as
  pallas_wide._make_closest_kernel (VMEM leaf table, unpacked node rows);
  st_ref counts (lockstep walk rounds, enqueued leaf visits)."""

  def kernel(*args):
    if meta_vmem:
        o_ref, d_ref, t_ref, act_ref, nb_ref, lt_ref, *rest = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, ni_ref, cm_ref, nb_ref, lt_ref,
         *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    (hit_ref, tout_ref, prim_ref, nx_ref, ny_ref, nz_ref,
     st_ref, stack_ref, q_ref, xch_ref) = rest
    n_tiles = hit_ref.shape[0]

    def tile_body(ti, _):
      o, d, inv, sc, tmax0 = _lane_setup(o_ref, d_ref, t_ref, ti)
      valid = act_ref[ti] != 0
      tmax = jnp.where(valid, tmax0, -BIG)
      oa = _sublane_octants(xch_ref, d, valid)
      octs = tuple(v & 7 for v in oa)
      roots = tuple(jnp.where((v >> 3) != 0, 0, IDLE) for v in oa)

      # speculative pops read slot 0 of each sublane's stack slice
      for s in range(SUBLANES):
          stack_ref[s * LSTACK] = 0

      refs = (nb_ref, cm_at, info_read, stack_ref, q_ref, xch_ref)

      def drain_fn(row_b, tmax, ds):
          t, prim, n3 = ds
          bt, bp, bnx, bny, bnz = _mt8_sublane(row_b, o, d, tmax)
          ok = bp >= 0
          tmax = jnp.where(ok, bt, tmax)
          t = jnp.where(ok, bt, t)
          prim = jnp.where(ok, bp.astype(jnp.int32), prim)
          n3 = tuple(jnp.where(ok, bn, n)
                     for bn, n in zip((bnx, bny, bnz), n3))
          return tmax, (t, prim, n3)

      ds0 = (jnp.full(tmax.shape, BIG, jnp.float32),
             jnp.full(tmax.shape, -1, jnp.int32),
             (jnp.zeros_like(tmax),) * 3)
      rounds, visits, drounds, _, ds = _run_lane_walk(
          refs, lt_ref, inv, sc, octs, roots, tmax, ds0, drain_fn,
          lambda ds: jnp.bool_(False), width)
      t, prim, n3 = ds
      hit = (prim >= 0) & valid
      hit_ref[ti] = hit.astype(jnp.int32)
      tout_ref[ti] = t
      prim_ref[ti] = jnp.where(hit, prim, -1)
      nx_ref[ti] = n3[0]
      ny_ref[ti] = n3[1]
      nz_ref[ti] = n3[2]
      st_ref[ti, 0] = rounds
      st_ref[ti, 1] = visits
      st_ref[ti, 2] = drounds
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


def _make_lane_anyhit_kernel(meta_vmem: bool = False, width: int = WIDTH):
  """Lane-walker any-hit kernel with per-lane excluded prim id.  A fully
  occluded sublane drops its tmax to -BIG (no slab ever hits), so its
  walk pops to idle without special-casing; the all-lanes-occluded early
  exit matches the packet kernel's."""

  def kernel(*args):
    if meta_vmem:
        o_ref, d_ref, t_ref, act_ref, ex_ref, nb_ref, lt_ref, *rest = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, ni_ref, cm_ref, nb_ref,
         lt_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    occ_ref, st_ref, stack_ref, q_ref, xch_ref = rest
    n_tiles = occ_ref.shape[0]

    def tile_body(ti, _):
      o, d, inv, sc, tmax0 = _lane_setup(o_ref, d_ref, t_ref, ti)
      valid = act_ref[ti] != 0
      exclude = ex_ref[ti]
      tmax = jnp.where(valid, tmax0, -BIG)
      oa = _sublane_octants(xch_ref, d, valid)
      octs = tuple(v & 7 for v in oa)
      roots = tuple(jnp.where((v >> 3) != 0, 0, IDLE) for v in oa)

      for s in range(SUBLANES):
          stack_ref[s * LSTACK] = 0

      refs = (nb_ref, cm_at, info_read, stack_ref, q_ref, xch_ref)

      def drain_fn(row_b, tmax, occ):
          h = _mt8_sublane_any(row_b, o, d, tmax, exclude)
          occ = occ | h.astype(jnp.int32)
          return jnp.where(occ != 0, -BIG, tmax), occ

      stop = lambda occ: jnp.all((occ != 0) | ~valid)
      rounds, visits, drounds, _, occluded = _run_lane_walk(
          refs, lt_ref, inv, sc, octs, roots, tmax,
          jnp.zeros(tmax.shape, jnp.int32), drain_fn, stop, width)
      occ_ref[ti] = jnp.where((occluded != 0) & valid, 1, 0)
      st_ref[ti, 0] = rounds
      st_ref[ti, 1] = visits
      st_ref[ti, 2] = drounds
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)
_SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)


def _lane_scratch():
    return [pltpu.SMEM((SUBLANES * LSTACK,), jnp.int32),
            pltpu.SMEM((SUBLANES * LQUEUE,), jnp.int32),
            pltpu.VMEM((SUBLANES, 128), jnp.int32)]


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def lane_traverse_closest(tables: WideTables, origin, direction, tmax,
                          active, interpret: bool = False,
                          with_stats: bool = False, meta_vmem: bool = False):
    """Per-sublane-walk closest-hit traversal.  Same contract as
    pallas_wide.wide_traverse_closest (hit, t, prim, normal [+stats]);
    requires unpacked node rows and a VMEM-resident leaf table."""
    assert not tables.packed_nodes, "lane walker needs unpacked node rows"
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)

    shp = (n_tiles, SUBLANES, 128)
    if meta_vmem:
        in_specs = [_VMEM] * 6
        ins = (o, d, tm, act, tables.node_bounds, tables.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _VMEM, _VMEM]
        ins = (o, d, tm, act, tables.node_info, tables.child_meta,
               tables.node_bounds, tables.leaf_tris)
    out_shape = [jax.ShapeDtypeStruct(shp, jnp.int32),
                 jax.ShapeDtypeStruct(shp, jnp.float32),
                 jax.ShapeDtypeStruct(shp, jnp.int32)]
    out_shape += [jax.ShapeDtypeStruct(shp, jnp.float32)] * 3
    out_shape += [jax.ShapeDtypeStruct((n_tiles, 3), jnp.int32)]
    outs = pl.pallas_call(
        _make_lane_closest_kernel(meta_vmem, tables.width),
        in_specs=in_specs,
        out_specs=[_VMEM] * 6 + [_SMEM],
        out_shape=out_shape,
        scratch_shapes=_lane_scratch(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad)),
        interpret=interpret,
    )(*ins)

    flat = lambda a: a.reshape(n_pad)[:n]
    hit, t, prim, nx, ny, nz, st = outs
    hit = flat(hit) != 0
    prim = flat(prim)
    normal = (flat(nx), flat(ny), flat(nz))
    if not as_v3:
        normal = jnp.stack(normal, axis=-1)
    out = (hit, flat(t), prim, normal)
    if with_stats:
        # (walk rounds, enqueued visits, lockstep drain rounds): the first
        # two match the packet kernel's stats contract; engine consumers
        # index [0]/[1], benches read the drain-round cost from [2]
        out = out + ((jnp.sum(st[:, 0]), jnp.sum(st[:, 1]),
                      jnp.sum(st[:, 2])),)
    return out


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def lane_traverse_anyhit(tables: WideTables, origin, direction, tmax,
                         exclude, active, interpret: bool = False,
                         with_stats: bool = False, meta_vmem: bool = False):
    """Per-sublane-walk any-hit traversal (occlusion with prim exclusion).
    Same contract as pallas_wide.wide_traverse_anyhit."""
    assert not tables.packed_nodes, "lane walker needs unpacked node rows"
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)
    ex = _scalar_tiles(_pad(exclude, n_pad, -1), n_tiles)

    if meta_vmem:
        in_specs = [_VMEM] * 7
        ins = (o, d, tm, act, ex, tables.node_bounds, tables.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _VMEM,
                    _VMEM]
        ins = (o, d, tm, act, ex, tables.node_info, tables.child_meta,
               tables.node_bounds, tables.leaf_tris)
    occ, st = pl.pallas_call(
        _make_lane_anyhit_kernel(meta_vmem, tables.width),
        in_specs=in_specs,
        out_specs=[_VMEM, _SMEM],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, SUBLANES, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, 3), jnp.int32)],
        scratch_shapes=_lane_scratch(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad)),
        interpret=interpret,
    )(*ins)
    occluded = occ.reshape(n_pad)[:n] != 0
    if with_stats:
        return occluded, (jnp.sum(st[:, 0]), jnp.sum(st[:, 1]),
                          jnp.sum(st[:, 2]))
    return occluded
