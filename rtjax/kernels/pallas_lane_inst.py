"""Two-level (instanced) traversal on the per-sublane lane walker.

The packet two-level kernel (pallas_wide._make_closest_inst_kernel) walks
every pending instance with the WHOLE 2048-ray tile: with 16 overlapping
instances a tile pays the union of per-instance walks (~70 walk rounds per
camera tile vs ~10 for one bunny, docs/ROUND3.md instance anatomy) — the
instance-level version of the bounce-divergence wall.  Here every SUBLANE
(128 rays) schedules its OWN instances:

1. **Per-(sublane, instance) entry distances.**  One [16, 128] world slab
   pass per instance AABB, min-reduced per sublane, bitcast to int32 keys
   (IEEE order-preserving for non-negative floats) in an SMEM table.
2. **Per-sublane nearest-first scheduling.**  A sublane whose walk went
   idle (cursor IDLE, stack empty) pops its nearest pending instance —
   re-culled against its CURRENT max tmax — and restarts at that
   instance's BLAS root.  Sublanes walk DIFFERENT instances concurrently;
   a sublane never touches an instance its own 128 rays miss.
3. **Per-sublane local frames.**  Each outer round re-assembles a
   [16, 128] affine tile (16 dynamic row loads from the VMEM affine-row
   table) where sublane s holds ITS current instance's world->local rows,
   and transforms o/d per sublane.  Directions stay unnormalized so t is
   in world units and ONE tmax prunes across instances
   (pallas_wide._inst_local_rays, same convention).
4. Walk chunks and lockstep drains are the single-level lane walker's
   (pallas_lane): stall-balanced queues, up to 16 leaf visits per vector
   pass — instance ids ride the affine rows (lane 18) so drains record
   the winning instance per lane.

Semantics match wide_traverse_*_inst exactly: closest hit over base scene
(instance 0) + all instances, prim ids local to the mesh, LOCAL-frame
normals (caller applies the cofactor transform), any-hit exclusion only
within the base scene (lights cannot be instanced).  Reference equivalent:
the CUDA build has no instancing; this extends bvh.cuh:251-303's
per-thread walk model to a TLAS/BLAS world at sublane granularity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lane import (LQUEUE, LSTACK, LSTALL, _bcast_lanes, _exchange,
                          _lane_drain, _lane_walk_round, _mt8_sublane,
                          _mt8_sublane_any, _row_tile)
from .pallas_wide import (BIG, IDLE, SUBLANES, TILE, InstancedTables,
                          _pad, _scalar_tiles, _smem_meta, _to_tiles,
                          _vmem_meta, _vmem_limit)

DONE = -1      # sublane instance cursor: pending list exhausted
FRESH = -2     # initial value: idle, but scheduling has not started
INT_MAX = 2**31 - 1


def _f2key(x):
    """float32 -> int32 whose ordering matches the floats for
    NON-NEGATIVE inputs (IEEE bit pattern).  Entry distances are clamped
    >= 0; tmax keys may go negative (occluded lanes carry -BIG), where any
    non-negative entry key correctly compares greater."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _setup_dists(ai_ref, dist_ref, xch_ref, num_inst, inv_w, sc_w, tmax):
    """Fill dist_ref[s*num_inst + k] with sublane s's entry-distance key to
    instance k's world AABB (INT_MAX when no lane of s hits)."""

    def body(k, _):
        b = tuple(ai_ref[18 * k + 12 + j] for j in range(6))
        e0 = b[0] * inv_w[0] + sc_w[0]
        e1 = b[1] * inv_w[1] + sc_w[1]
        e2 = b[2] * inv_w[2] + sc_w[2]
        x0 = b[3] * inv_w[0] + sc_w[0]
        x1 = b[4] * inv_w[1] + sc_w[1]
        x2 = b[5] * inv_w[2] + sc_w[2]
        entry = jnp.maximum(jnp.maximum(jnp.minimum(e0, x0),
                                        jnp.minimum(e1, x1)),
                            jnp.minimum(e2, x2))
        exit_ = jnp.minimum(jnp.minimum(jnp.maximum(e0, x0),
                                        jnp.maximum(e1, x1)),
                            jnp.maximum(e2, x2))
        hit = jnp.maximum(entry, 0.0) <= jnp.minimum(exit_, tmax)
        key = jnp.where(hit, _f2key(jnp.maximum(entry, 0.0)), INT_MAX)
        ks = _exchange(xch_ref, jnp.min(key, axis=1, keepdims=True))
        for s in range(SUBLANES):
            dist_ref[s * num_inst + k] = ks[s]
        return 0

    jax.lax.fori_loop(0, num_inst, body, 0)


def _switch_instances(curs, sps, qns, kis, tmax, root_ref, dist_ref,
                      xch_ref, num_inst):
    """Idle sublanes pop their nearest pending instance (nearest-first:
    closer geometry shrinks tmax before farther instances are walked,
    the two-level analog of bvh.cuh:284-290's child ordering); a pop only
    succeeds while the instance's entry distance beats the sublane's
    current max tmax, else the sublane is DONE.  A sublane with PENDING
    queue entries must not switch: its entries were enqueued under the
    current instance's local frame and must drain first."""
    tkeys = _exchange(xch_ref, jnp.max(_f2key(tmax), axis=1, keepdims=True))
    new_curs, new_kis = [], []
    for s in range(SUBLANES):
        idle = (curs[s] == IDLE) & (sps[s] == 0) & (qns[s] == 0) & \
            (kis[s] != DONE)

        def scan(k, best):
            dk = dist_ref[s * num_inst + k]
            better = dk < best[0]
            return (jnp.where(better, dk, best[0]),
                    jnp.where(better, k, best[1]))

        bd, bk = jax.lax.fori_loop(0, num_inst, scan,
                                   (jnp.int32(INT_MAX), jnp.int32(0)))
        ok = idle & (bd < INT_MAX) & (bd <= tkeys[s])

        @pl.when(ok)
        def _():
            dist_ref[s * num_inst + bk] = INT_MAX

        new_kis.append(jnp.where(ok, bk, jnp.where(idle, DONE, kis[s])))
        new_curs.append(jnp.where(ok, root_ref[bk], curs[s]))
    return tuple(new_curs), tuple(new_kis)


def _sublane_context(aff_ref, kis, xch_ref, o_w, d_w):
    """Per-sublane local-frame context for the current instances: assemble
    the [16, 128] affine tile (sublane s = instance kis[s]'s row; DONE
    sublanes get the all-zero dummy row) and transform the world rays.
    Returns (o_l, d_l, inv, sc, octs, k_vec)."""
    dummy = aff_ref.shape[0] - 1
    rows = _row_tile(aff_ref, [jnp.where(k < 0, dummy, k) for k in kis])
    A = _bcast_lanes(rows, list(range(12)) + [18])
    k_vec = A[12].astype(jnp.int32)
    o_l = (A[0] * o_w[0] + A[1] * o_w[1] + A[2] * o_w[2] + A[3],
           A[4] * o_w[0] + A[5] * o_w[1] + A[6] * o_w[2] + A[7],
           A[8] * o_w[0] + A[9] * o_w[1] + A[10] * o_w[2] + A[11])
    d_l = (A[0] * d_w[0] + A[1] * d_w[1] + A[2] * d_w[2],
           A[4] * d_w[0] + A[5] * d_w[1] + A[6] * d_w[2],
           A[8] * d_w[0] + A[9] * d_w[1] + A[10] * d_w[2])
    eps = float(np.finfo(np.float32).eps)
    safe = tuple(jnp.where(jnp.abs(dk) < eps, jnp.copysign(eps, dk), dk)
                 for dk in d_l)
    inv = tuple(1.0 / dk for dk in safe)
    sc = tuple(-ok * ik for ok, ik in zip(o_l, inv))
    md = [jnp.sum(dk, axis=1, keepdims=True) for dk in d_l]
    octv = ((md[0] < 0).astype(jnp.int32)
            | ((md[1] < 0).astype(jnp.int32) << 1)
            | ((md[2] < 0).astype(jnp.int32) << 2))
    octs = _exchange(xch_ref, octv)
    return o_l, d_l, inv, sc, octs, k_vec


def _run_inst_lane_walk(refs, aff_ref, root_ref, dist_ref, lt_ref, o_w, d_w,
                        tmax, ds, make_drain, stop_fn, width, num_inst):
    """Outer loop: (re)schedule instances for idle sublanes, rebuild the
    per-sublane local-frame context, run one stall-balanced walk chunk,
    drain.  Ends when every sublane is DONE with empty stack/queue (or
    stop_fn fires).  Returns (rounds, visits, drounds, tmax, ds)."""
    xch_ref = refs[5]
    zero = jnp.int32(0)
    curs0 = (jnp.int32(IDLE),) * SUBLANES
    sps0 = (zero,) * SUBLANES
    qns0 = (zero,) * SUBLANES
    qhs0 = (zero,) * SUBLANES
    kis0 = (jnp.int32(FRESH),) * SUBLANES

    def alive(curs, sps):
        a = None
        for c, p in zip(curs, sps):
            g = (c != IDLE) | (p > 0)
            a = g if a is None else (a | g)
        return a

    def outer_cond(carry):
        curs, sps, qns, kis, ds = (carry[0], carry[1], carry[2], carry[4],
                                   carry[9])
        live = None
        for c, p, q, k in zip(curs, sps, qns, kis):
            g = (c != IDLE) | (p > 0) | (q > 0) | (k != DONE)
            live = g if live is None else (live | g)
        return ~stop_fn(ds) & live

    def outer_body(carry):
        curs, sps, qns, qhs, kis, rounds, visits, drounds, tmax, ds = carry
        curs, kis = _switch_instances(curs, sps, qns, kis, tmax, root_ref,
                                      dist_ref, xch_ref, num_inst)
        o_l, d_l, inv, sc, octs, k_vec = _sublane_context(
            aff_ref, kis, xch_ref, o_w, d_w)
        drain_fn = make_drain(o_l, d_l, k_vec)

        def walk_cond(c2):
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
            qns, tmax, ds, lt_ref, refs[4], drain_fn, qhs=qhs,
            flush=~alive(curs, sps), width=width)
        return (curs, sps, qns, qhs, kis, rounds, visits + nv,
                drounds + nd, tmax, ds)

    out = jax.lax.while_loop(
        outer_cond, outer_body,
        (curs0, sps0, qns0, qhs0, kis0, zero, zero, zero, tmax, ds))
    return out[5], out[6], out[7], out[8], out[9]


def _make_lane_closest_inst_kernel(meta_vmem: bool = False, width: int = 8):
  """Two-level lane-walker closest hit.  Output contract matches
  pallas_wide._make_closest_inst_kernel (+ the third stats slot)."""

  def kernel(*args):
    if meta_vmem:
        (o_ref, d_ref, t_ref, act_ref, root_ref, ai_ref, nb_ref, lt_ref,
         aff_ref, *rest) = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, root_ref, ai_ref, ni_ref, cm_ref,
         nb_ref, lt_ref, aff_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    (hit_ref, tout_ref, prim_ref, inst_ref, nx_ref, ny_ref, nz_ref,
     st_ref, stack_ref, q_ref, xch_ref, dist_ref) = rest
    n_tiles = hit_ref.shape[0]
    num_inst = root_ref.shape[0]

    def tile_body(ti, _):
      o_w = (o_ref[ti, 0], o_ref[ti, 1], o_ref[ti, 2])
      d_w = (d_ref[ti, 0], d_ref[ti, 1], d_ref[ti, 2])
      valid = act_ref[ti] != 0
      tmax = jnp.where(valid, t_ref[ti], -BIG)

      eps = float(np.finfo(np.float32).eps)
      safe = tuple(jnp.where(jnp.abs(dk) < eps, jnp.copysign(eps, dk), dk)
                   for dk in d_w)
      inv_w = tuple(1.0 / dk for dk in safe)
      sc_w = tuple(-ok * ik for ok, ik in zip(o_w, inv_w))
      _setup_dists(ai_ref, dist_ref, xch_ref, num_inst, inv_w, sc_w, tmax)

      for s in range(SUBLANES):
          stack_ref[s * LSTACK] = 0  # speculative pops read slot 0

      refs = (nb_ref, cm_at, info_read, stack_ref, q_ref, xch_ref)

      def make_drain(o_l, d_l, k_vec):
          def drain_fn(row_b, tmax, ds):
              t, prim, inst, n3 = ds
              bt, bp, bnx, bny, bnz = _mt8_sublane(row_b, o_l, d_l, tmax)
              ok = bp >= 0
              tmax = jnp.where(ok, bt, tmax)
              t = jnp.where(ok, bt, t)
              prim = jnp.where(ok, bp.astype(jnp.int32), prim)
              inst = jnp.where(ok, k_vec, inst)
              n3 = tuple(jnp.where(ok, bn, n)
                         for bn, n in zip((bnx, bny, bnz), n3))
              return tmax, (t, prim, inst, n3)
          return drain_fn

      ds0 = (jnp.full(tmax.shape, BIG, jnp.float32),
             jnp.full(tmax.shape, -1, jnp.int32),
             jnp.zeros(tmax.shape, jnp.int32),
             (jnp.zeros_like(tmax),) * 3)
      rounds, visits, drounds, _, ds = _run_inst_lane_walk(
          refs, aff_ref, root_ref, dist_ref, lt_ref, o_w, d_w, tmax, ds0,
          make_drain, lambda ds: jnp.bool_(False), width, num_inst)
      t, prim, inst, n3 = ds
      hit = (prim >= 0) & valid
      hit_ref[ti] = hit.astype(jnp.int32)
      tout_ref[ti] = t
      prim_ref[ti] = jnp.where(hit, prim, -1)
      inst_ref[ti] = jnp.where(hit, inst, 0)
      nx_ref[ti] = n3[0]
      ny_ref[ti] = n3[1]
      nz_ref[ti] = n3[2]
      st_ref[ti, 0] = rounds
      st_ref[ti, 1] = visits
      st_ref[ti, 2] = drounds
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


def _make_lane_anyhit_inst_kernel(meta_vmem: bool = False, width: int = 8):
  """Two-level lane-walker any-hit.  The excluded prim id applies only
  within the base scene (instance 0, per-lane gate on k_vec); a fully
  occluded sublane's tmax drops to -BIG, failing every future instance
  pop, so it runs dry without special-casing."""

  def kernel(*args):
    if meta_vmem:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, root_ref, ai_ref, nb_ref,
         lt_ref, aff_ref, *rest) = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, root_ref, ai_ref, ni_ref,
         cm_ref, nb_ref, lt_ref, aff_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    occ_ref, st_ref, stack_ref, q_ref, xch_ref, dist_ref = rest
    n_tiles = occ_ref.shape[0]
    num_inst = root_ref.shape[0]

    def tile_body(ti, _):
      o_w = (o_ref[ti, 0], o_ref[ti, 1], o_ref[ti, 2])
      d_w = (d_ref[ti, 0], d_ref[ti, 1], d_ref[ti, 2])
      valid = act_ref[ti] != 0
      exclude = ex_ref[ti]
      tmax = jnp.where(valid, t_ref[ti], -BIG)

      eps = float(np.finfo(np.float32).eps)
      safe = tuple(jnp.where(jnp.abs(dk) < eps, jnp.copysign(eps, dk), dk)
                   for dk in d_w)
      inv_w = tuple(1.0 / dk for dk in safe)
      sc_w = tuple(-ok * ik for ok, ik in zip(o_w, inv_w))
      _setup_dists(ai_ref, dist_ref, xch_ref, num_inst, inv_w, sc_w, tmax)

      for s in range(SUBLANES):
          stack_ref[s * LSTACK] = 0

      refs = (nb_ref, cm_at, info_read, stack_ref, q_ref, xch_ref)
      no_excl = jnp.full(exclude.shape, -1, jnp.int32)

      def make_drain(o_l, d_l, k_vec):
          ex_k = jnp.where(k_vec == 0, exclude, no_excl)

          def drain_fn(row_b, tmax, occ):
              h = _mt8_sublane_any(row_b, o_l, d_l, tmax, ex_k)
              occ = occ | h.astype(jnp.int32)
              return jnp.where(occ != 0, -BIG, tmax), occ
          return drain_fn

      stop = lambda occ: jnp.all((occ != 0) | ~valid)
      rounds, visits, drounds, _, occluded = _run_inst_lane_walk(
          refs, aff_ref, root_ref, dist_ref, lt_ref, o_w, d_w, tmax,
          jnp.zeros(tmax.shape, jnp.int32), make_drain, stop, width,
          num_inst)
      occ_ref[ti] = jnp.where((occluded != 0) & valid, 1, 0)
      st_ref[ti, 0] = rounds
      st_ref[ti, 1] = visits
      st_ref[ti, 2] = drounds
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)
_SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)


def _aff_rows(tabs: InstancedTables):
    """VMEM affine-row table [I+1, 128]: lanes 0-11 world->local affine,
    12-17 world AABB, 18 the instance id as exact f32; trailing all-zero
    dummy row for DONE sublanes."""
    I = tabs.num_instances
    aff = tabs.affine.reshape(I, 18)
    ids = jnp.arange(I, dtype=jnp.float32)[:, None]
    rows = jnp.concatenate(
        [aff, ids, jnp.zeros((I, 128 - 19), jnp.float32)], axis=1)
    return jnp.concatenate([rows, jnp.zeros((1, 128), jnp.float32)], axis=0)


def _inst_scratch(num_inst):
    return [pltpu.SMEM((SUBLANES * LSTACK,), jnp.int32),
            pltpu.SMEM((SUBLANES * LQUEUE,), jnp.int32),
            pltpu.VMEM((SUBLANES, 128), jnp.int32),
            pltpu.SMEM((SUBLANES * num_inst,), jnp.int32)]


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def lane_traverse_closest_inst(tabs: InstancedTables, origin, direction,
                               tmax, active, interpret: bool = False,
                               with_stats: bool = False,
                               meta_vmem: bool = False):
    """Two-level per-sublane closest hit: one launch over base + instances.

    Same contract as pallas_wide.wide_traverse_closest_inst —
    ``(hit, t, prim, inst, normal_local)``, prim local to the mesh, normal
    in the instance's local frame; ``with_stats`` appends ``(walk_rounds,
    leaf_visits, drain_rounds)``.  Requires unpacked node rows."""
    assert not tabs.wide.packed_nodes, "lane walker needs unpacked node rows"
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)
    aff = _aff_rows(tabs)

    shp = (n_tiles, SUBLANES, 128)
    f32 = jnp.float32
    if meta_vmem:
        in_specs = [_VMEM] * 4 + [_SMEM, _SMEM, _VMEM, _VMEM, _VMEM]
        ins = (o, d, tm, act, tabs.root, tabs.affine,
               tabs.wide.node_bounds, tabs.wide.leaf_tris, aff)
    else:
        in_specs = [_VMEM] * 4 + [_SMEM] * 4 + [_VMEM, _VMEM, _VMEM]
        ins = (o, d, tm, act, tabs.root, tabs.affine, tabs.wide.node_info,
               tabs.wide.child_meta, tabs.wide.node_bounds,
               tabs.wide.leaf_tris, aff)
    outs = pl.pallas_call(
        _make_lane_closest_inst_kernel(meta_vmem, tabs.wide.width),
        in_specs=in_specs,
        out_specs=[_VMEM] * 7 + [_SMEM],
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct((n_tiles, 3), jnp.int32)],
        scratch_shapes=_inst_scratch(tabs.num_instances),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tabs.wide, n_pad)),
        interpret=interpret,
    )(*ins)
    hit, t, prim, inst, nx, ny, nz, st = outs

    flat = lambda a: a.reshape(n_pad)[:n]
    normal = (flat(nx), flat(ny), flat(nz))
    if not as_v3:
        normal = jnp.stack(normal, axis=-1)
    out = (flat(hit) != 0, flat(t), flat(prim), flat(inst), normal)
    if with_stats:
        out = out + ((jnp.sum(st[:, 0]), jnp.sum(st[:, 1]),
                      jnp.sum(st[:, 2])),)
    return out


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def lane_traverse_anyhit_inst(tabs: InstancedTables, origin, direction,
                              tmax, exclude, active, interpret: bool = False,
                              with_stats: bool = False,
                              meta_vmem: bool = False):
    """Two-level per-sublane any-hit (contract of
    pallas_wide.wide_traverse_anyhit_inst, + third stats slot)."""
    assert not tabs.wide.packed_nodes, "lane walker needs unpacked node rows"
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)
    ex = _scalar_tiles(_pad(exclude, n_pad, -1), n_tiles)
    aff = _aff_rows(tabs)

    if meta_vmem:
        in_specs = [_VMEM] * 5 + [_SMEM, _SMEM, _VMEM, _VMEM, _VMEM]
        ins = (o, d, tm, act, ex, tabs.root, tabs.affine,
               tabs.wide.node_bounds, tabs.wide.leaf_tris, aff)
    else:
        in_specs = [_VMEM] * 5 + [_SMEM] * 4 + [_VMEM, _VMEM, _VMEM]
        ins = (o, d, tm, act, ex, tabs.root, tabs.affine,
               tabs.wide.node_info, tabs.wide.child_meta,
               tabs.wide.node_bounds, tabs.wide.leaf_tris, aff)
    occ, st = pl.pallas_call(
        _make_lane_anyhit_inst_kernel(meta_vmem, tabs.wide.width),
        in_specs=in_specs,
        out_specs=[_VMEM, _SMEM],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, SUBLANES, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, 3), jnp.int32)],
        scratch_shapes=_inst_scratch(tabs.num_instances),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tabs.wide, n_pad)),
        interpret=interpret,
    )(*ins)
    occluded = occ.reshape(n_pad)[:n] != 0
    if with_stats:
        return occluded, (jnp.sum(st[:, 0]), jnp.sum(st[:, 1]),
                          jnp.sum(st[:, 2]))
    return occluded
