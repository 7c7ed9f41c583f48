"""Ray-BVH traversal — Pallas TPU packet kernel (the fast path).

TPU-native redesign of the reference traversal (bvh.cuh:221-357).  Instead of
one CUDA thread per ray chasing pointers, a *packet* of TILE rays shares a
single scalar traversal: the scene lives in VMEM/SMEM, one scalar walk reads
node records with scalar loads, and every box/triangle test is a full-tile
VPU op.  This trades extra node visits (the packet visits the union of its
rays' node sets — small for coherent/sorted packets) for the complete
elimination of per-step HBM traffic: the XLA gather variant streams its
[N, stack] carry through HBM on every loop step, this kernel keeps all state
in registers and the stack in SMEM.

Memory layout (driven by Mosaic's access rules: dynamic indices are free on
the sublane axis, lane offsets must be static):
- ``pair_bounds [(M-1)//2, 16]`` f32 VMEM — one row per *child pair*
  (children are allocated adjacently, right = left + 1, bvh.cuh:153-154):
  left bmin/bmax, right bmin/bmax, 4 pad lanes.
- ``node_meta [M]`` int32 SMEM — packed ``(value << 4) | count``:
  count = 0 for internal (value = left child index), count in [1, MAX_LEAF]
  for a leaf (value = row in the leaf-triangle table).
- ``leaf_tris [L, 128]`` f32 VMEM — MAX_LEAF (8) triangles per leaf row
  (p0, e1, e2, n = 12 floats each, reference edge-precomputed storage,
  triangle.cuh:6-7) + 8 global prim ids (exact f32 values) at PID_BASE.
  Short leaves are padded with degenerate triangles (n = 0 never passes the
  Moeller-Trumbore accept rule) and prim id -1.  Wide leaves trade extra
  (cheap) vector MT tests for fewer (expensive, scalar-latency-bound)
  traversal steps.

Requires ``max_leaf_size <= MAX_LEAF`` at BVH build time.

Semantics preserved from the reference: MT accept rule + tmax shrinking
(triangle.cuh:39-58), any-hit exclusion by triangle index with early exit
(bvh.cuh:306-357).  Deliberate improvements (results identical): the slab
test clips against [0, per-lane tmax] (the reference tests the infinite
line, aabb_intersector.cuh:24-36), and near-child ordering uses the
packet-wide minimum entry distance.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import BuildResult

# tile geometry: TILE rays = SUBLANES x 128 lanes (16 sublanes measured
# fastest on v5e: bigger tiles amortize the scalar walk, unions grow slower)
SUBLANES = 16
TILE = SUBLANES * 128
STACK_SIZE = 64
MAX_LEAF = 8          # 8 tris/leaf fit one 128-lane row: 96 floats + 8 ids
PID_BASE = 12 * MAX_LEAF
BIG = 3.4e38  # plain float: jnp constants would be captured as kernel consts


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneTables:
    pair_bounds: jax.Array  # [(M-1)//2, 128] f32 (12 lanes used)
    node_meta: jax.Array    # [M] i32 (SMEM side)
    pair_order: jax.Array   # [(M-1)//2] i32: near-child bit per direction
                            # octant (SMEM side) — build-time replacement for
                            # the reference's per-ray entry compare
                            # (bvh.cuh:284), one SMEM read per step
    leaf_tris: jax.Array    # [L, 128] f32


def build_scene_tables(res: BuildResult, p0, e1, e2, n_vec,
                       prim_ids=None) -> SceneTables:
    """Pack a BVH build + (leaf-ordered) triangle soup into kernel tables.

    Args:
      res: BuildResult (host arrays, pre-padding).
      p0/e1/e2/n_vec: ``[T, 3]`` leaf-ordered triangle arrays (numpy).
      prim_ids: global ids to report per triangle (default: leaf order).
    """
    m = res.num_nodes
    bmin = np.asarray(res.bmin[:m], np.float32)
    bmax = np.asarray(res.bmax[:m], np.float32)
    left_first = np.asarray(res.left_first[:m], np.int64)
    num_prims = np.asarray(res.num_prims[:m], np.int64)

    if num_prims[0] > 0:  # same leaf-root wrapping as BuildResult.to_device
        inf = np.float32(np.inf)
        bmin = np.concatenate([bmin[:1], bmin[:1], [[inf, inf, inf]]])
        bmax = np.concatenate([bmax[:1], bmax[:1], [[-inf, -inf, -inf]]])
        left_first = np.array([1, left_first[0], 0], np.int64)
        num_prims = np.array([0, num_prims[0], 1], np.int64)
        m = 3

    assert num_prims.max(initial=1) <= MAX_LEAF, (
        f"pallas traversal requires max_leaf_size <= {MAX_LEAF} at build time")

    # pair rows for children (left = 2k+1, right = 2k+2); 128 logical lanes
    # (the physical layout pads to 128 anyway) so one row loads as a full
    # vector for lane-broadcast gathers
    n_pairs = (m - 1) // 2
    pair = np.zeros((max(n_pairs, 1), 128), np.float32)
    li = 1 + 2 * np.arange(n_pairs)
    pair[:n_pairs, 0:3] = bmin[li]
    pair[:n_pairs, 3:6] = bmax[li]
    pair[:n_pairs, 6:9] = bmin[li + 1]
    pair[:n_pairs, 9:12] = bmax[li + 1]

    # per-octant near-child ordering bits: bit o set <=> LEFT child is
    # farther for rays whose direction signs match octant o.
    # (nan_to_num: the leaf-root wrap's dummy child has an inverted
    # inf/-inf bbox whose center is NaN; its order bit is never used)
    with np.errstate(invalid="ignore"):
        c_l = np.nan_to_num(0.5 * (bmin[li] + bmax[li]))
        c_r = np.nan_to_num(0.5 * (bmin[li + 1] + bmax[li + 1]))
    order = np.zeros(max(n_pairs, 1), np.int64)
    for o in range(8):
        dirv = np.array([1 - 2 * (o & 1), 1 - 2 * ((o >> 1) & 1),
                         1 - 2 * ((o >> 2) & 1)], np.float32)
        l_far = (c_l @ dirv) > (c_r @ dirv)
        order[:n_pairs] |= l_far.astype(np.int64) << o

    # leaf-packed triangles
    leaves = np.nonzero(num_prims > 0)[0]
    n_leaves = len(leaves)
    tri_rows = np.zeros((max(n_leaves, 1), 128), np.float32)
    pid_rows = np.full((max(n_leaves, 1), MAX_LEAF), -1, np.int32)
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n_vec = np.asarray(n_vec, np.float32)
    if prim_ids is None:
        prim_ids = np.arange(len(p0), dtype=np.int32)

    first = left_first[leaves]
    count = num_prims[leaves]
    for j in range(MAX_LEAF):
        has = count > j
        src = np.where(has, first + j, 0)
        base = 12 * j
        tri_rows[:n_leaves, base + 0:base + 3] = np.where(
            has[:, None], p0[src], 0.0)
        tri_rows[:n_leaves, base + 3:base + 6] = np.where(
            has[:, None], e1[src], 0.0)
        tri_rows[:n_leaves, base + 6:base + 9] = np.where(
            has[:, None], e2[src], 0.0)
        tri_rows[:n_leaves, base + 9:base + 12] = np.where(
            has[:, None], n_vec[src], 0.0)
        pid_rows[:n_leaves, j] = np.where(has, prim_ids[src], -1)
    # prim ids stored as exact f32 VALUES (< 2^24): Mosaic cannot
    # bitcast scalars, and triangle counts stay far below the mantissa limit
    tri_rows[:, PID_BASE:PID_BASE + MAX_LEAF] = pid_rows.astype(np.float32)

    # packed meta: internal -> left_first<<4; leaf -> leaf_row<<4 | count
    meta = (left_first.astype(np.int64) << 4).astype(np.int64)
    leaf_row = np.zeros(m, np.int64)
    leaf_row[leaves] = np.arange(n_leaves)
    is_leaf = num_prims > 0
    meta = np.where(is_leaf, (leaf_row << 4) | num_prims, meta).astype(np.int32)

    return SceneTables(pair_bounds=jnp.asarray(pair),
                       node_meta=jnp.asarray(meta),
                       pair_order=jnp.asarray(order.astype(np.int32)),
                       leaf_tris=jnp.asarray(tri_rows))


def _ray_setup(o_ref, d_ref, t_ref, ti):
    eps = float(np.finfo(np.float32).eps)
    o = (o_ref[ti, 0], o_ref[ti, 1], o_ref[ti, 2])
    d_raw = (d_ref[ti, 0], d_ref[ti, 1], d_ref[ti, 2])
    safe = tuple(jnp.where(jnp.abs(dk) < eps, jnp.copysign(eps, dk), dk)
                 for dk in d_raw)
    inv = tuple(1.0 / dk for dk in safe)
    sc = tuple(-ok * ik for ok, ik in zip(o, inv))
    # packet mean-direction octant (scalar): picks the per-pair precomputed
    # near-child bit (3 reductions, once per tile)
    md = tuple(jnp.sum(dk) for dk in d_raw)
    octant = ((md[0] < 0).astype(jnp.int32)
              | ((md[1] < 0).astype(jnp.int32) << 1)
              | ((md[2] < 0).astype(jnp.int32) << 2))
    return o, d_raw, inv, sc, t_ref[ti], octant


# packed any() base: must exceed the max lane count of a tile or the right
# count overflows into the left field (hit at SUBLANES=32)
_PACK = 1 << 14
assert TILE < _PACK


def _any_pair(hit_l, hit_r):
    """Both any() flags with ONE vector->scalar crossing.

    countR <= TILE < _PACK, so the packed sum separates exactly.
    """
    s = jnp.sum(hit_l.astype(jnp.int32) * _PACK + hit_r.astype(jnp.int32))
    return s >= _PACK, (s & (_PACK - 1)) > 0


def _bcast_lanes(row_b, lanes):
    """Broadcast selected lanes of a row to full [S, 128] tiles.

    ``row_b`` is a [SUBLANES, 128] broadcast of one table row; each output is
    the row's lane ``k`` replicated everywhere.  Constant-index
    ``take_along_axis`` is a pure-VPU lane shuffle — this moves table reads
    off the saturated scalar unit (12 scalar loads -> 1 vector load).
    """
    return tuple(
        jnp.take_along_axis(row_b, jnp.full(row_b.shape, k, jnp.int32),
                            axis=1)
        for k in lanes)


def _load_pair_row(pb_ref, pair):
    row = pb_ref[pl.ds(pair, 1), :]            # [1, 128]
    return jnp.broadcast_to(row, (SUBLANES, 128))


def _slab(b, inv, sc, tmax):
    """Full-tile slab test vs one child's (preloaded scalar) bounds."""
    e0 = b[0] * inv[0] + sc[0]
    e1 = b[1] * inv[1] + sc[1]
    e2 = b[2] * inv[2] + sc[2]
    x0 = b[3] * inv[0] + sc[0]
    x1 = b[4] * inv[1] + sc[1]
    x2 = b[5] * inv[2] + sc[2]
    entry = jnp.maximum(jnp.maximum(jnp.minimum(e0, x0), jnp.minimum(e1, x1)),
                        jnp.minimum(e2, x2))
    exit_ = jnp.minimum(jnp.minimum(jnp.maximum(e0, x0), jnp.maximum(e1, x1)),
                        jnp.maximum(e2, x2))
    return (entry <= exit_) & (exit_ >= 0.0) & (entry <= tmax)


def _mt(row_b, slot, o, d, tmax):
    """Full-tile Moeller-Trumbore vs leaf-table triangle ``slot`` (0..7).

    ``row_b``: broadcast [S, 128] leaf row.  Exact reference accept rule
    (triangle.cuh:39-58).  Returns (hit, t, u, v, prim_id_as_f32).
    """
    b = 12 * slot
    (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz, pid) = \
        _bcast_lanes(row_b, list(range(b, b + 12)) + [PID_BASE + slot])

    ox, oy, oz = o
    dx, dy, dz = d
    cx = p0x - ox; cy = p0y - oy; cz = p0z - oz
    rx = dy * cz - dz * cy
    ry = dz * cx - dx * cz
    rz = dx * cy - dy * cx
    inv_det = 1.0 / (dx * nx + dy * ny + dz * nz)
    u = inv_det * (e2x * rx + e2y * ry + e2z * rz)
    v = inv_det * (e1x * rx + e1y * ry + e1z * rz)
    t = inv_det * (cx * nx + cy * ny + cz * nz)
    hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (t <= tmax)
    return hit, t, u, v, pid


def _pid_to_int(pid_f32):
    return pid_f32.astype(jnp.int32)


def _descend(nm_ref, stack_ref, l_far, live_l, live_r, child_l, child_r,
             sp, done):
    """Shared descent/push/pop logic (bvh.cuh:282-299), packet-ordered.

    ``l_far`` is the scalar mean-ray ordering decision (a heuristic only:
    any order is exact thanks to tmax pruning).
    """
    both = live_l & live_r
    push_val = jnp.where(l_far, child_l, child_r)
    next_both = jnp.where(l_far, child_r, child_l)

    pop_needed = ~live_l & ~live_r
    can_pop = sp > 0
    done = done | (pop_needed & ~can_pop)

    @pl.when(both)
    def _():
        stack_ref[sp] = push_val

    new_sp = jnp.where(both, sp + 1,
                       jnp.where(pop_needed & can_pop, sp - 1, sp))
    popped = stack_ref[jnp.maximum(new_sp, 0)]
    cur = jnp.where(both, next_both,
                    jnp.where(live_l, child_l,
                              jnp.where(live_r, child_r, popped)))
    return cur, new_sp, done


def _closest_kernel(o_ref, d_ref, t_ref, act_ref, nm_ref, po_ref, pb_ref,
                    lt_ref, hit_ref, tout_ref, u_ref, v_ref, prim_ref,
                    stack_ref):
  """Single grid step; tiles iterated INSIDE the kernel so the VMEM-resident
  scene tables are fetched once, not per tile (Mosaic re-DMAs full-array
  operands on every grid step — 30 MB x n_tiles of wasted HBM traffic)."""
  n_tiles = hit_ref.shape[0]

  def tile_body(ti, _):
    o, d, inv, sc, tmax0, octant = _ray_setup(o_ref, d_ref, t_ref, ti)
    valid = act_ref[ti] != 0
    # dead lanes never match anything: tmax = -BIG rejects every test
    tmax = jnp.where(valid, tmax0, -BIG)

    def leaf_loop(meta, carry):
        row = meta >> 4
        count = meta & 15
        row_b = jnp.broadcast_to(lt_ref[pl.ds(row, 1), :], (SUBLANES, 128))
        for slot in range(MAX_LEAF):  # unrolled; padded slots never hit
            tmax, t, u, v, prim = carry
            h, tt, uu, vv, pidf = _mt(row_b, slot, o, d, tmax)
            h = h & (slot < count)
            pid = _pid_to_int(pidf)
            carry = (jnp.where(h, tt, tmax), jnp.where(h, tt, t),
                     jnp.where(h, uu, u), jnp.where(h, vv, v),
                     jnp.where(h, pid, prim))
        return carry

    def step(carry):
        cur, sp, done, tmax, t, u, v, prim = carry
        pair = cur >> 1  # left child is always odd: pair row = (cur-1)/2

        row_b = _load_pair_row(pb_ref, pair)
        b = _bcast_lanes(row_b, range(12))
        hit_l = _slab(b[0:6], inv, sc, tmax)
        hit_r = _slab(b[6:12], inv, sc, tmax)
        any_l, any_r = _any_pair(hit_l, hit_r)
        meta_l = nm_ref[cur]
        meta_r = nm_ref[cur + 1]
        leaf_l = (meta_l & 15) > 0
        leaf_r = (meta_r & 15) > 0

        carry5 = (tmax, t, u, v, prim)
        carry5 = jax.lax.cond(any_l & leaf_l,
                              lambda c: leaf_loop(meta_l, c), lambda c: c,
                              carry5)
        carry5 = jax.lax.cond(any_r & leaf_r,
                              lambda c: leaf_loop(meta_r, c), lambda c: c,
                              carry5)
        tmax, t, u, v, prim = carry5

        l_far = ((po_ref[pair] >> octant) & 1) == 1
        cur, sp, done = _descend(
            nm_ref, stack_ref, l_far,
            any_l & ~leaf_l, any_r & ~leaf_r, meta_l >> 4, meta_r >> 4,
            sp, done)
        return cur, sp, done, tmax, t, u, v, prim

    init = (nm_ref[0] >> 4, jnp.int32(0), ~jnp.any(valid),
            tmax, jnp.full(tmax.shape, BIG, jnp.float32),
            jnp.zeros_like(tmax), jnp.zeros_like(tmax),
            jnp.full(tmax.shape, -1, jnp.int32))
    out = jax.lax.while_loop(lambda c: ~c[2], step, init)
    _, _, _, _, t, u, v, prim = out
    hit = (prim >= 0) & valid
    hit_ref[ti] = hit.astype(jnp.int32)
    tout_ref[ti] = t
    u_ref[ti] = u
    v_ref[ti] = v
    prim_ref[ti] = jnp.where(hit, prim, -1)
    return 0

  jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _anyhit_kernel(o_ref, d_ref, t_ref, act_ref, ex_ref, nm_ref, po_ref,
                   pb_ref, lt_ref, occ_ref, stack_ref):
  """Single grid step, in-kernel tile loop (see _closest_kernel)."""
  n_tiles = occ_ref.shape[0]

  def tile_body(ti, _):
    o, d, inv, sc, tmax0, octant = _ray_setup(o_ref, d_ref, t_ref, ti)
    valid = act_ref[ti] != 0
    exclude = ex_ref[ti]
    tmax = jnp.where(valid, tmax0, -BIG)

    def leaf_loop(meta, occluded):
        # occluded is an int32 0/1 vector: Mosaic cannot carry i1 vectors
        # through scf.if regions
        row = meta >> 4
        count = meta & 15
        row_b = jnp.broadcast_to(lt_ref[pl.ds(row, 1), :], (SUBLANES, 128))
        for slot in range(MAX_LEAF):
            h, _, _, _, pidf = _mt(row_b, slot, o, d, tmax)
            pid = _pid_to_int(pidf)
            occluded = occluded | (
                h & (slot < count) & (pid != exclude)).astype(jnp.int32)
        return occluded

    def step(carry):
        cur, sp, done, occluded = carry
        live_tmax = jnp.where(occluded != 0, -BIG, tmax)
        pair = cur >> 1

        row_b = _load_pair_row(pb_ref, pair)
        b = _bcast_lanes(row_b, range(12))
        hit_l = _slab(b[0:6], inv, sc, live_tmax)
        hit_r = _slab(b[6:12], inv, sc, live_tmax)
        any_l, any_r = _any_pair(hit_l, hit_r)
        meta_l = nm_ref[cur]
        meta_r = nm_ref[cur + 1]
        leaf_l = (meta_l & 15) > 0
        leaf_r = (meta_r & 15) > 0

        occluded = jax.lax.cond(any_l & leaf_l,
                                lambda oc: leaf_loop(meta_l, oc),
                                lambda oc: oc, occluded)
        occluded = jax.lax.cond(any_r & leaf_r,
                                lambda oc: leaf_loop(meta_r, oc),
                                lambda oc: oc, occluded)
        # early exit once every valid lane is occluded (bvh.cuh:318,328).
        # NB outside the conds: Mosaic cannot legalize reductions in scf.if.
        done = done | jnp.all((occluded != 0) | ~valid)

        l_far = ((po_ref[pair] >> octant) & 1) == 1
        cur, sp, done = _descend(
            nm_ref, stack_ref, l_far,
            any_l & ~leaf_l, any_r & ~leaf_r, meta_l >> 4, meta_r >> 4,
            sp, done)
        return cur, sp, done, occluded

    init = (nm_ref[0] >> 4, jnp.int32(0), ~jnp.any(valid),
            jnp.zeros(tmax.shape, jnp.int32))
    out = jax.lax.while_loop(lambda c: ~c[2], step, init)
    occ_ref[ti] = jnp.where((out[3] != 0) & valid, 1, 0)
    return 0

  jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _to_tiles(x, n_tiles):
    """[N, 3] -> [n_tiles, 3, SUBLANES, 128]."""
    return x.T.reshape(3, n_tiles, SUBLANES, 128).transpose(1, 0, 2, 3)


def _scalar_tiles(x, n_tiles):
    return x.reshape(n_tiles, SUBLANES, 128)


def _pad(x, n, fill):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)
_META = pl.BlockSpec(memory_space=pltpu.SMEM)


def _vmem_limit(tables: SceneTables, n_rays: int) -> int:
    table_bytes = (tables.pair_bounds.shape[0] + tables.leaf_tris.shape[0]
                   ) * 128 * 4
    ray_bytes = n_rays * 4 * 14  # o,d (6) + tmax/act/ex + 5 outputs
    return min(int((table_bytes + ray_bytes) * 1.25) + (4 << 20), 127 << 20)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_traverse_closest(tables: SceneTables, origin, direction, tmax,
                            active, interpret: bool = False):
    """Packet closest-hit traversal; same contract as traverse_closest."""
    n = origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)

    shp = (n_tiles, SUBLANES, 128)
    hit, t, u, v, prim = pl.pallas_call(
        _closest_kernel,
        in_specs=[_VMEM, _VMEM, _VMEM, _VMEM, _META, _META, _VMEM, _VMEM],
        out_specs=[_VMEM] * 5,
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.int32)],
        scratch_shapes=[pltpu.SMEM((STACK_SIZE,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad)),
        interpret=interpret,
    )(o, d, tm, act, tables.node_meta, tables.pair_order,
      tables.pair_bounds, tables.leaf_tris)

    flat = lambda a: a.reshape(n_pad)[:n]
    return (flat(hit) != 0, flat(t), flat(u), flat(v), flat(prim))


@partial(jax.jit, static_argnames=("interpret",))
def pallas_traverse_anyhit(tables: SceneTables, origin, direction, tmax,
                           exclude, active, interpret: bool = False):
    """Packet any-hit traversal; same contract as traverse_anyhit."""
    n = origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)
    ex = _scalar_tiles(_pad(exclude, n_pad, -1), n_tiles)

    occ = pl.pallas_call(
        _anyhit_kernel,
        in_specs=[_VMEM, _VMEM, _VMEM, _VMEM, _VMEM, _META, _META, _VMEM,
                  _VMEM],
        out_specs=_VMEM,
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((STACK_SIZE,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad)),
        interpret=interpret,
    )(o, d, tm, act, ex, tables.node_meta, tables.pair_order,
      tables.pair_bounds, tables.leaf_tris)
    return occ.reshape(n_pad)[:n] != 0
