"""Ray-BVH traversal — wide (BVH8) Pallas TPU packet kernel.

Second-generation traversal engine (it replaced the round-1 binary packet
kernel, deleted in round 3).  Keeps the packet model — a tile of
SUBLANES x 128 rays shares one traversal — but is designed around the measured
bottleneck (benchmarks/micro_kernel.py): a traversal step is bound by the
~250 ns latency chain *slab -> vector->scalar reduction -> scalar descent ->
dynamic row load*, not by vector work (an 8-child step costs barely more than
a 2-child one).  Three structural changes attack that chain:

1. **Wide nodes (BVH8).**  The binary sweep-SAH BVH (the parity build of
   /root/reference/bvh.cuh:30-219) is collapsed into 8-wide nodes; one step
   slab-tests 8 children, cutting steps/ray ~3x for near-free (+25% step
   cost).  Descent uses a mask stack: one int32 entry packs (node,
   remaining-children mask, order bit); children are build-time sorted along
   the node's dominant axis and consumed with ctz/clz depending on the packet
   octant's sign along that axis — an O(1)-per-step replacement for the
   reference's per-ray entry-distance compare (bvh.cuh:284-290; any order is
   exact, tmax prunes).
2. **Deferred leaf visits.**  Leaf hits are appended to an SMEM queue and
   drained in a separate pipelined loop (no vector scf regions inside the
   walk): per-visit cost drops from serial latency (~350 ns) toward vector
   throughput.  The walk's tmax refreshes at each drain, so pruning stays
   within a QUEUE_CAP-leaf staleness window.
3. **Interleaved walks, shared stack.**  NUM_WALKS independent cursors step
   in one loop body; their latency chains overlap because the walk body is
   branch-free vector code.  The shared SMEM stack doubles as a
   work-stealing deque: an idle walk pops whatever any walk pushed, so load
   balances and no packet waits on one deep subtree.

Semantics preserved from the reference: exact Moeller-Trumbore accept rule +
tmax shrinking (triangle.cuh:39-58), any-hit exclusion by triangle index with
early exit (bvh.cuh:306-357).  Tie-breaks between equal-t hits may differ
from the binary kernel (visit order differs); both match the reference's
"first strictly-closer hit wins" semantics.
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

import os as _os

SUBLANES = int(_os.environ.get("RTJAX_SUBLANES", "16"))
TILE = SUBLANES * 128
WIDTH = 8             # default children per wide node (see also WIDTH16)
WIDTH16 = 16          # the 16-wide variant: one step slab-tests 16 children
                      # at 1.34x the 8-wide step cost (micro_kernel
                      # slab_wide16_fused: 456 vs 340 ns) while node count
                      # roughly halves — net walk win on every packet class.
                      # Constraint: the mask-stack entry packs
                      # (node << width+1 | mask << 1 | rev) into one int32,
                      # so 16-wide trees are capped at 2^14 nodes (~2M tris);
                      # bigger scenes stay 8-wide (+ packed node rows).
MAX_LEAF = 8          # triangles per leaf row (96 floats + 8 ids = 104 lanes)
PID_BASE = 12 * MAX_LEAF
STACK_SIZE = 1024     # shared by all walks (generous; overflow faults SMEM)
# leaf visits buffered between drains (stale-tmax window).  Swept per width
# on the headline bench: 8-wide 16/24/48/96 -> 24 optimal (PERF_NOTES);
# 16-wide 16/24/32/48 -> 13.52/13.26/13.08/12.84 Mrays/s — the minimum legal
# cap (= width; the walk chunk needs QUEUE_CAP - width >= 0 headroom) wins
# because one 16-wide round already queues enough visits to amortize a
# drain, and a tighter cap shrinks the stale-tmax window.  Env overrides
# for A/B runs apply to BOTH widths.
_qc_env = int(_os.environ.get("RTJAX_QUEUE_CAP", "0"))
QUEUE_CAP = _qc_env or 24          # 8-wide cap (and Q_ALLOC sizing)
QUEUE_CAP16 = _qc_env or 16        # 16-wide cap
# interleaved walk cursors: 3 optimal at width 8 (2/3/4/6 ->
# 5.59/5.01/5.11/5.31 ms, PERF_NOTES); 2 at width 16 (1/2/3/4 ->
# 13.77/13.88/13.52/13.23 Mrays/s whole-frame) — the wider step is more
# vector-heavy, leaving less scalar latency for extra cursors to hide
_nw_env = int(_os.environ.get("RTJAX_NUM_WALKS", "0"))
NUM_WALKS = _nw_env or 3           # 8-wide (and Q_ALLOC sizing)
NUM_WALKS16 = _nw_env or 2         # 16-wide


def _queue_cap(width):
    return QUEUE_CAP16 if width == WIDTH16 else QUEUE_CAP


def _num_walks(width):
    return NUM_WALKS16 if width == WIDTH16 else NUM_WALKS
MT_SUBLANES = 8       # leaf rows broadcast to ONE vreg for the drain's
                      # lane gathers (see _bcast_lanes_row1)
# the cap check runs once per walk round; a round can append `width` per
# walk — allocate for the widest variant
Q_ALLOC = QUEUE_CAP + NUM_WALKS * WIDTH16
BIG = 3.4e38
IDLE = -1
META_BASE = 6 * WIDTH  # 8-wide bounds-row lanes 48..55: child meta as f32
INFO_LANE = META_BASE + WIDTH  # lane 56: node info as f32
# (for a 16-wide node the same layout lands at lanes 96..111 + 112: a
# 16-child node still fits ONE 128-lane row — 96 bounds + 16 meta + info)
SMEM_META_CAP = 768 << 10  # child_meta+node_info bytes that may live in SMEM
MAX_NODES16 = 1 << 14  # 16-wide node cap (stack-entry node field)


# ============================================================ host-side build

@partial(jax.tree_util.register_dataclass,
         data_fields=["node_bounds", "child_meta", "node_info", "leaf_tris"],
         meta_fields=["packed_nodes", "n_nodes", "width"])
@dataclasses.dataclass(frozen=True)
class WideTables:
    """Device tables for the wide packet kernel (``width`` = 8 or 16).

    node_bounds [M, 128] f32: child c's (bmin, bmax) at lanes [6c, 6c+6);
      empty slots are NaN boxes (every slab comparison is false).
      With ``packed_nodes`` (8-wide only) the rows hold TWO nodes each
      (node n at row n >> 1, lane offset (n & 1) * 64 — an 8-wide node's
      used lanes stop at 56), halving the node-row VMEM so scenes to ~4M
      tris keep the Pallas path; the kernel selects the half with one
      dynamic lane roll.  A 16-wide node uses lanes 0..112 (96 bounds + 16
      meta mirrors + info) — always one node per row.
    child_meta [M * width] i32 (SMEM): (value << 4) | count; count > 0 =>
      leaf (value = leaf row), count == 0 => internal (value = wide node
      index).
    node_info [M] i32 (SMEM): (axis << width) | leaf_mask — axis = dominant
      child-sort axis (traversal-order hint), leaf_mask bit c set iff child c
      is a leaf (or empty; empties never hit).
    leaf_tris [L, 128] f32: MAX_LEAF triangles (p0,e1,e2,n — the reference's
      edge-precomputed storage, triangle.cuh:6-7) + 8 prim ids as exact f32.
      The final row is all-zero (degenerate: n = 0 makes every MT test
      reject), reserved as the lane walker's dummy-pop target.

    (A round-2/3 MXU leaf-drain subsystem — split-K bf16 A-matrix tables +
    group matmul drains — was measured slower at system level on every
    shipping config and deleted in round 4; docs/PERF_NOTES.md keeps the
    full post-mortem.)
    """

    node_bounds: jax.Array
    child_meta: jax.Array
    node_info: jax.Array
    leaf_tris: jax.Array
    packed_nodes: bool = False  # static: two nodes per bounds row
    n_nodes: int = -1           # static: node count when packed (rows != nodes)
    width: int = WIDTH          # static: children per wide node (8 or 16)

    @property
    def num_wide_nodes(self) -> int:
        return self.n_nodes if self.packed_nodes else self.node_bounds.shape[0]

    @property
    def num_leaf_rows(self) -> int:
        return self.leaf_tris.shape[0]

    def device(self) -> "WideTables":
        """jnp-ify (host-built tables are numpy until placed)."""
        return WideTables(node_bounds=jnp.asarray(self.node_bounds),
                          child_meta=jnp.asarray(self.child_meta),
                          node_info=jnp.asarray(self.node_info),
                          leaf_tris=jnp.asarray(self.leaf_tris),
                          packed_nodes=self.packed_nodes,
                          n_nodes=self.n_nodes,
                          width=self.width)


def pack_node_rows(tables: WideTables) -> WideTables:
    """Two-nodes-per-row packing of the bounds table (host-side).

    A node uses lanes 0..56 of its 128-lane row (48 bounds + 8 meta
    mirrors + info); packing node 2r+1 into lanes 64..120 of row r halves
    node-row VMEM, which is the single-BLAS scene-size ceiling (the ~60 MB
    node budget capped scenes at ~2M triangles; packed rows double that).
    """
    assert not tables.packed_nodes and tables.width == WIDTH, \
        "packed node rows are an 8-wide layout (16-wide rows have no room)"
    nb = np.asarray(tables.node_bounds)
    m = nb.shape[0]
    m2 = (m + 1) // 2
    out = np.full((m2, 128), np.nan, np.float32)
    out[:, :64] = nb[0::2, :64]
    out[: m // 2, 64:] = nb[1::2, :64]
    return dataclasses.replace(tables, node_bounds=out, packed_nodes=True,
                               n_nodes=m)


def _half_area(bmin, bmax):
    d = np.maximum(bmax - bmin, 0)
    return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]


def collapse_wide(bmin, bmax, left_first, num_prims, width=WIDTH):
    """Collapse a binary BVH into wide nodes (host, numpy).

    Greedy top-down: each wide node absorbs binary descendants by always
    expanding the internal candidate with the largest surface area until
    ``width`` children are reached (the standard BVH2->BVH8 collapse).

    Returns ``(children, axes)``: ``children[i]`` is the list of
    ``(bin_node, ref, is_leaf)`` per wide node i sorted along the dominant
    axis, where ``ref`` is the wide node index (internal) or the binary node
    id (leaf); ``axes[i]`` is the sort axis.

    Per-node metrics (half area, centers) are precomputed vectorized and
    the inner loops run on plain Python scalars: a per-group numpy-call
    version took ~10 min at 1M triangles, this takes seconds (decisions
    are identical — f32 values compare the same as exact f64 converts).
    """
    is_leaf_a = np.asarray(num_prims) > 0
    if is_leaf_a[0]:
        return [[(0, 0, True)]], [0]

    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    d = np.maximum(bmax - bmin, 0)
    area = (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
            + d[:, 2] * d[:, 0]).tolist()
    cent = (0.5 * (bmin + bmax))
    cx, cy, cz = (cent[:, 0].tolist(), cent[:, 1].tolist(),
                  cent[:, 2].tolist())
    cents = (cx, cy, cz)
    left = np.asarray(left_first).tolist()
    is_leaf = is_leaf_a.tolist()

    children: list[list[tuple[int, int, bool]]] = []
    axes: list[int] = []
    pending: list[tuple[int, int]] = [(0, 0)]  # (binary node, wide index)
    children.append(None)
    axes.append(0)
    while pending:
        b, wi = pending.pop()
        grp = [left[b], left[b] + 1]
        while len(grp) < width:
            best, best_a = -1, -1.0
            for j, g in enumerate(grp):
                if not is_leaf[g] and area[g] > best_a:
                    best, best_a = j, area[g]
            if best < 0:
                break
            g = grp.pop(best)
            grp.extend((left[g], left[g] + 1))
        spans = [max(c[g] for g in grp) - min(c[g] for g in grp)
                 for c in cents]
        axis = spans.index(max(spans))
        ca = cents[axis]
        grp.sort(key=lambda g: ca[g])  # list.sort is stable

        entry = []
        for g in grp:
            if is_leaf[g]:
                entry.append((g, g, True))
            else:
                ref = len(children)
                children.append(None)
                axes.append(0)
                pending.append((g, ref))
                entry.append((g, ref, False))
        children[wi] = entry
        axes[wi] = axis
    return children, axes


def collapse_wide_dp(bmin, bmax, left_first, num_prims, width=WIDTH):
    """Optimal binary->wide collapse by bottom-up dynamic programming.

    The greedy area-first collapse (:func:`collapse_wide`) fragments at
    higher widths: a full group's leftover internal children root SMALL
    subtrees, each spawning a nearly-empty wide node (measured on the
    bunny: 3,154 sixteen-wide nodes vs 2,920 eight-wide — the wider tree
    was WORSE).  This DP (the flat-cost case of Ylitie et al. 2017's
    BVH8 construction) minimizes the true walk-cost proxy instead: the sum
    of half-areas of the chosen wide-node roots (a random ray's expected
    node visits is proportional to that sum).

    Recurrences over the binary tree, bottom-up, with budgets s = 1..W:
      G[x, s] = cheapest cost of REPRESENTING subtree x in s frontier
                slots = min(F[x],  min_k G[l, k] + G[r, s-k])
      F[x]    = cost of making x a wide-node root
              = area(x) + min_{k} G[l, k] + G[r, W-k]
    Leaves: G = 0 (they occupy a slot for free — leaf visits do not depend
    on the collapse).  Frontiers are reconstructed top-down by re-running
    the argmins.  Same return contract as :func:`collapse_wide`.
    """
    is_leaf_a = np.asarray(num_prims) > 0
    if is_leaf_a[0]:
        return [[(0, 0, True)]], [0]

    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    d = np.maximum(bmax - bmin, 0)
    area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
    left = np.asarray(left_first, np.int64)
    m = len(left)

    # level order (children before parents when reversed): internal x has
    # children (left[x], left[x]+1)
    levels = [np.array([0], np.int64)]
    while True:
        ints = levels[-1][~is_leaf_a[levels[-1]]]
        if ints.size == 0:
            break
        l = left[ints]
        levels.append(np.concatenate([l, l + 1]))

    INF = np.float32(3e38)
    G = np.zeros((m, width + 1), np.float32)  # G[:, 0] unused
    F = np.zeros(m, np.float32)
    for lev in reversed(levels):
        ints = lev[~is_leaf_a[lev]]
        if ints.size == 0:
            continue
        A = G[left[ints]]        # [N, W+1]
        B = G[left[ints] + 1]
        E = np.full((len(ints), width + 1), INF, np.float32)
        for s in range(2, width + 1):
            E[:, s] = (A[:, 1:s] + B[:, s - 1:0:-1]).min(axis=1)
        F[ints] = area[ints] + E[:, width]
        G[ints, 1] = F[ints]
        for s in range(2, width + 1):
            G[ints, s] = np.minimum(F[ints], E[:, s])

    cent = 0.5 * (bmin + bmax)
    Gl = G  # alias for closures below

    def frontier(x, s, out):
        """Collect subtree x's frontier within s slots into ``out``."""
        stack = [(int(x), int(s))]
        while stack:
            x, s = stack.pop()
            if is_leaf_a[x] or (s == 1) or (Gl[x, s] == F[x]
                                            and not is_leaf_a[x]):
                # leaf slot, or internal that becomes its own wide root
                out.append(x)
                continue
            l = int(left[x])
            ks = np.arange(1, s)
            k = int(ks[np.argmin(Gl[l, 1:s] + Gl[l + 1, s - 1:0:-1])])
            stack.append((l, k))
            stack.append((l + 1, s - k))

    children: list[list[tuple[int, int, bool]] | None] = [None]
    axes: list[int] = [0]
    pending: list[tuple[int, int]] = [(0, 0)]
    while pending:
        b, wi = pending.pop()
        l = int(left[b])
        ks = np.arange(1, width)
        k = int(ks[np.argmin(Gl[l, 1:width] + Gl[l + 1, width - 1:0:-1])])
        grp: list[int] = []
        frontier(l, k, grp)
        frontier(l + 1, width - k, grp)
        spans = [cent[grp, a].max() - cent[grp, a].min() for a in range(3)]
        axis = int(np.argmax(spans))
        grp.sort(key=lambda g: cent[g, axis])  # stable

        entry = []
        for g in grp:
            if is_leaf_a[g]:
                entry.append((g, g, True))
            else:
                ref = len(children)
                children.append(None)
                axes.append(0)
                pending.append((g, ref))
                entry.append((g, ref, False))
        children[wi] = entry
        axes[wi] = axis
    return children, axes


DP_COLLAPSE_CAP = 3_000_000  # binary nodes; beyond this the O(M * W^2) DP
                             # tables get heavy on the 1-vCPU build host —
                             # fall back to the greedy collapse


def pack_leaf_rows(leaves, left_first, num_prims, p0, e1, e2, n_vec,
                   prim_ids=None):
    """Pack binary-BVH leaves into [L+1, 128] rows: 8x12 triangle floats
    (p0, e1, e2, n) + 8 prim ids stored as exact f32 values (< 2^24).
    Short leaves pad with degenerate triangles (n = 0 never passes MT).
    One extra all-zero row is appended at index L: the lane walker's
    dummy-pop target (never referenced by child_meta, rejects every MT)."""
    n_leaves = len(leaves)
    tri_rows = np.zeros((max(n_leaves, 1) + 1, 128), np.float32)
    pid_rows = np.full((max(n_leaves, 1), MAX_LEAF), -1, np.int32)
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n_vec = np.asarray(n_vec, np.float32)
    if prim_ids is None:
        prim_ids = np.arange(len(p0), dtype=np.int32)
    assert len(p0) < (1 << 24), "prim ids must be exact as f32"

    first = np.asarray(left_first)[leaves]
    count = np.asarray(num_prims)[leaves]
    assert count.max(initial=1) <= MAX_LEAF
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
    tri_rows[:-1, PID_BASE:PID_BASE + MAX_LEAF] = pid_rows.astype(np.float32)
    return tri_rows


def build_wide_tables(res: BuildResult, p0, e1, e2, n_vec,
                      prim_ids=None, as_numpy=False,
                      width: int = WIDTH) -> WideTables:
    """Collapse a binary BuildResult + leaf-ordered triangles into wide
    kernel tables (``width`` = 8 or 16 children per node).

    ``as_numpy=True`` keeps the tables host-side (call ``.device()`` to
    place them) — building on numpy avoids device round-trips when tables
    are post-processed (concat_wide_tables), which cost minutes through a
    remote-TPU tunnel."""
    assert width in (WIDTH, WIDTH16)
    m = res.num_nodes
    bmin = np.asarray(res.bmin[:m], np.float32)
    bmax = np.asarray(res.bmax[:m], np.float32)
    left_first = np.asarray(res.left_first[:m], np.int64)
    num_prims = np.asarray(res.num_prims[:m], np.int64)

    collapse = (collapse_wide_dp if m <= DP_COLLAPSE_CAP
                and _os.environ.get("RTJAX_COLLAPSE") != "greedy"
                else collapse_wide)
    children, axes = collapse(bmin, bmax, left_first, num_prims, width=width)
    if width != WIDTH and len(children) > MAX_NODES16:
        # 16-wide stack entries cap the tree at 2^14 nodes; degenerate
        # trees (deep median-split chains) can exceed the caller's
        # estimate — fall back to the 8-wide layout transparently
        width = WIDTH
        children, axes = collapse(bmin, bmax, left_first, num_prims,
                                  width=width)
    n_wide = len(children)

    leaf_nodes = [g for grp in children for (g, _, lf) in grp if lf]
    leaf_row_of = {g: i for i, g in enumerate(leaf_nodes)}
    leaf_tris = pack_leaf_rows(np.asarray(leaf_nodes, np.int64), left_first,
                               num_prims, p0, e1, e2, n_vec, prim_ids)

    node_bounds = np.full((n_wide, 128), np.nan, np.float32)
    child_meta = np.zeros((n_wide, width), np.int32)
    node_info = np.zeros(n_wide, np.int32)
    # flatten the (node, child) fill into vectorized scatters (a per-slice
    # python loop cost ~90 s at 1M tris)
    fi, fc, fg, fm, flm = [], [], [], [], np.zeros(n_wide, np.int64)
    for i, grp in enumerate(children):
        lm = 0
        for c, (g, ref, lf) in enumerate(grp):
            fi.append(i)
            fc.append(c)
            fg.append(g)
            if lf:
                lm |= 1 << c
                fm.append((leaf_row_of[g] << 4) | int(num_prims[g]))
            else:
                fm.append(ref << 4)
        for c in range(len(grp), width):
            lm |= 1 << c  # empty: leaf-marked, count 0, NaN box never hits
        flm[i] = lm
    fi = np.asarray(fi); fc = np.asarray(fc); fg = np.asarray(fg)
    lo = np.asarray(bmin, np.float32)[fg]
    hi = np.asarray(bmax, np.float32)[fg]
    for k in range(3):
        node_bounds[fi, 6 * fc + k] = lo[:, k]
        node_bounds[fi, 6 * fc + 3 + k] = hi[:, k]
    child_meta[fi, fc] = np.asarray(fm, np.int32)
    node_info[:] = (np.asarray(axes, np.int64) << width) | flm

    # meta mirrored into spare bounds-row lanes (exact int-valued f32):
    # big scenes whose child_meta/node_info would overflow SMEM read these
    # via static-lane scalar VMEM loads instead (meta_vmem kernel mode)
    assert n_wide < (1 << 20) and len(leaf_nodes) < (1 << 20), \
        "meta refs must stay exact as f32 (< 2^24 after << 4)"
    node_bounds[:, 6 * width:7 * width] = child_meta.astype(np.float32)
    node_bounds[:, 7 * width] = node_info.astype(np.float32)

    out = WideTables(node_bounds=node_bounds,
                     child_meta=child_meta.reshape(-1),
                     node_info=node_info,
                     leaf_tris=leaf_tris, width=width)
    return out if as_numpy else out.device()


# ============================================================= device kernel

def _ray_setup(o_ref, d_ref, t_ref, ti):
    eps = float(np.finfo(np.float32).eps)
    o = (o_ref[ti, 0], o_ref[ti, 1], o_ref[ti, 2])
    d = (d_ref[ti, 0], d_ref[ti, 1], d_ref[ti, 2])
    safe = tuple(jnp.where(jnp.abs(dk) < eps, jnp.copysign(eps, dk), dk)
                 for dk in d)
    inv = tuple(1.0 / dk for dk in safe)
    sc = tuple(-ok * ik for ok, ik in zip(o, inv))
    md = tuple(jnp.sum(dk) for dk in d)
    octant = ((md[0] < 0).astype(jnp.int32)
              | ((md[1] < 0).astype(jnp.int32) << 1)
              | ((md[2] < 0).astype(jnp.int32) << 2))
    return o, d, inv, sc, t_ref[ti], octant


def _bcast_lanes(row_b, lanes):
    """Lane-broadcast gathers: constant-index take_along_axis is a pure-VPU
    lane shuffle (table reads stay off the saturated scalar unit)."""
    return tuple(
        jnp.take_along_axis(row_b, jnp.full(row_b.shape, k, jnp.int32),
                            axis=1)
        for k in lanes)


def _slab(b, inv, sc, tmax):
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
    # fused accept: max(entry, 0) <= min(exit, tmax)  <=>  the reference's
    # (entry <= exit) & (exit >= 0) & (entry <= tmax) for every input
    # (including NaN boxes -> false and occluded lanes' tmax = -BIG): one
    # compare instead of three compares + two ands, and the walk step is
    # vector-issue bound (8 children x ~27 slab ops dominate the round).
    return jnp.maximum(entry, 0.0) <= jnp.minimum(exit_, tmax)


def _hit_mask8(hits):
    """N child-hit tiles -> one N-bit scalar mask via N/2 packed reductions
    (two 16-bit count fields per int32; counts <= TILE < 2^15).  (A single
    max-reduce of a per-lane bitmask would be cheaper but is WRONG: max
    picks one lane's mask, it is not a per-bit OR across lanes.)"""
    mask = jnp.int32(0)
    for j in range(len(hits) // 2):
        s = jnp.sum(hits[2 * j].astype(jnp.int32) * 32768
                    + hits[2 * j + 1].astype(jnp.int32))
        mask = mask | ((s >= 32768).astype(jnp.int32) << (2 * j)) \
                    | (((s & 32767) > 0).astype(jnp.int32) << (2 * j + 1))
    return mask


def _ctz(x):
    return 31 - jax.lax.clz(x & -x)


def _pick(mask, rev):
    """Next child slot: lowest set bit, or highest when the packet octant
    reverses the build-time axis order.  Caller guards mask == 0."""
    safe = jnp.maximum(mask, 1)
    return jnp.where(rev != 0, 31 - jax.lax.clz(safe), _ctz(safe))


def _bcast_lanes_row1(row_b, lanes):
    """Lane-broadcast gathers on ONE vreg: the gather runs on the [8, 128]
    row broadcast and the result is sliced to [1, 128]; downstream
    arithmetic broadcasts sublanes implicitly.  Microbenched slightly ahead
    of materializing [SUBLANES, 128] gather results (means 342 vs 364
    ns/visit across 3 runs, within tunnel noise; whole-frame A/B neutral at
    12.21 vs 12.29 Mrays/s) — kept for the lower vreg pressure in drains
    (live row = 1 vreg, not 2).  The same trick measured slightly WORSE on
    the walk's slab gathers, so _bcast_lanes stays for bounds rows
    (benchmarks/micro_kernel.py slab_wide8_row1 / leaf_mt_vpu_row1)."""
    return tuple(
        jnp.take_along_axis(row_b, jnp.full(row_b.shape, k, jnp.int32),
                            axis=1)[0:1]
        for k in lanes)


def _mt8(row_b, o, d, tmax):
    """All 8 leaf-row MT tests vs the SAME tmax (no slot serialization);
    returns the closest accepted hit per lane as (t, pid_f32, nx, ny, nz),
    with (BIG, -1, 0, 0, 0) when none.  The unnormalized geometric normal
    rides along so the engine needs no triangle gather after traversal;
    u/v are computed only for the accept rule — the engine never consumes
    them (hit position is o + t*d), so they are not tracked.  Exact
    reference accept rule (triangle.cuh:39-58); padded slots have
    n = 0 => t = NaN => rejected."""
    shape = tmax.shape
    best_t = jnp.full(shape, BIG, jnp.float32)
    best_p = jnp.full(shape, -1.0, jnp.float32)
    best_nx = jnp.zeros(shape, jnp.float32)
    best_ny = jnp.zeros(shape, jnp.float32)
    best_nz = jnp.zeros(shape, jnp.float32)
    for slot in range(MAX_LEAF):
        base = 12 * slot
        (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz, pid) = \
            _bcast_lanes_row1(row_b, list(range(base, base + 12))
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


def _mt8_any(row_b, o, d, tmax, exclude):
    """Any accepted hit per lane across the 8 slots, excluding prim id
    ``exclude`` (shadow-ray light exclusion, bvh.cuh:239-248)."""
    hit_any = None
    for slot in range(MAX_LEAF):
        base = 12 * slot
        (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz, pid) = \
            _bcast_lanes_row1(row_b, list(range(base, base + 12))
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


def _smem_meta(cm_ref, ni_ref, width=WIDTH):
    """Meta accessors over the SMEM tables (fast path): direct dynamic
    indexing."""

    def cm_at(node):
        return lambda c: cm_ref[node * width + c]

    def info_read(node):
        return ni_ref[node]

    return cm_at, info_read


def _vmem_meta(nb_ref, packed=False, width=WIDTH):
    """Meta accessors over the bounds-row mirror lanes (big-scene path).

    Scalar VMEM loads need STATIC lane indices (Mosaic), so a node's
    ``width`` child metas are loaded up front from lanes 6*width.. and a
    dynamic child pick becomes a select chain.  Frees SMEM of all per-node
    data — the scene size cap moves from ~1 MB SMEM to the VMEM node-row
    budget.

    With ``packed`` rows (8-wide only, two nodes per row) the half offset
    is dynamic but lanes must be static: load BOTH halves' lanes and select
    by the node's parity (16 loads + 8 selects instead of 8 loads).
    """
    meta_base = 6 * width
    info_lane = 7 * width
    assert not (packed and width != WIDTH)

    def cm_at(node):
        if packed:
            r = node >> 1
            lo = [nb_ref[r, meta_base + c].astype(jnp.int32)
                  for c in range(width)]
            hi = [nb_ref[r, 64 + meta_base + c].astype(jnp.int32)
                  for c in range(width)]
            odd = (node & 1) != 0
            ms = [jnp.where(odd, h, l) for l, h in zip(lo, hi)]
        else:
            ms = [nb_ref[node, meta_base + c].astype(jnp.int32)
                  for c in range(width)]

        def read(c):
            v = ms[width - 1]
            for k in range(width - 2, -1, -1):
                v = jnp.where(c == k, ms[k], v)
            return v

        return read

    def info_read(node):
        if packed:
            r = node >> 1
            return jnp.where((node & 1) != 0,
                             nb_ref[r, 64 + info_lane].astype(jnp.int32),
                             nb_ref[r, info_lane].astype(jnp.int32))
        return nb_ref[node, info_lane].astype(jnp.int32)

    return cm_at, info_read


def _node_row(nb_ref, packed=False):
    """Bounds-row loader: node -> its 48 bound lanes broadcast to a
    [SUBLANES, 128] tile.  Packed rows select the node's half with one
    dynamic lane roll (pltpu.roll) so every downstream lane index stays
    static."""

    def row_at(node):
        if packed:
            r = jnp.broadcast_to(nb_ref[pl.ds(node >> 1, 1), :],
                                 (SUBLANES, 128))
            return pltpu.roll(r, -(node & 1) * 64, axis=1)
        return jnp.broadcast_to(nb_ref[pl.ds(node, 1), :], (SUBLANES, 128))

    return row_at


def _walk_step(cur, sp, qn, tmax, refs, inv, sc, octant, width=WIDTH):
    """One branch-free step of one walk: slab all ``width`` children of its
    cursor, queue leaf hits, descend/push/pop on the shared stack.

    An idle walk (cur == IDLE) executes the same vector code on node 0 with
    its hit mask forced to 0, then steals from the shared stack (pop path).
    Returns (new_cur, new_sp, new_qn).
    """
    row_at, cm_at, info_read, stack_ref, q_ref = refs
    mask_all = (1 << width) - 1
    shift = width + 1  # stack entry: (node << shift) | (mask << 1) | rev
    active = cur != IDLE
    node = jnp.maximum(cur, 0)

    row_b = row_at(node)
    b = _bcast_lanes(row_b, range(6 * width))
    hits = [_slab(b[6 * c:6 * c + 6], inv, sc, tmax) for c in range(width)]
    mask = jnp.where(active, _hit_mask8(hits), 0)

    info = info_read(node)
    lm = info & mask_all
    axis = (info >> width) & 3
    rev = (octant >> axis) & 1
    leaf_hits = mask & lm
    int_hits = mask & ~lm & mask_all
    cm_node = cm_at(node)

    # append leaf metas to the drain queue (scalar-only loop, trips 0..8)
    def q_body(c2):
        lh, q = c2
        q_ref[q] = cm_node(_ctz(lh))
        return lh & (lh - 1), q + 1

    _, qn = jax.lax.while_loop(lambda c2: c2[0] != 0, q_body,
                               (leaf_hits, qn))

    # descend: nearest internal child continues, remainder pushed
    has = int_hits != 0
    first = _pick(int_hits, rev)
    rest = int_hits & ~(1 << first)

    @pl.when(has & (rest != 0))
    def _():
        stack_ref[sp] = (node << shift) | (rest << 1) | rev
    sp = jnp.where(has & (rest != 0), sp + 1, sp)
    nxt_direct = cm_node(first) >> 4

    # pop path (work stealing): take one child off the top entry, write the
    # remainder back in place (or retire the entry)
    can_pop = sp > 0
    entry = stack_ref[jnp.maximum(sp - 1, 0)]
    pnode = entry >> shift
    pmask = (entry >> 1) & mask_all
    prev = entry & 1
    pfirst = _pick(pmask, prev)
    prest = pmask & ~(1 << pfirst)
    do_pop = ~has & can_pop

    @pl.when(do_pop & (prest != 0))
    def _():
        stack_ref[sp - 1] = (pnode << shift) | (prest << 1) | prev
    sp = jnp.where(do_pop & (prest == 0), sp - 1, sp)
    nxt_pop = cm_at(pnode)(pfirst) >> 4

    new_cur = jnp.where(has, nxt_direct,
                        jnp.where(do_pop, nxt_pop, IDLE))
    return new_cur, sp, qn


def _alive(curs, sp):
    alive = sp > 0
    for cur in curs:
        alive = alive | (cur != IDLE)
    return alive


def _never(_ds):
    return jnp.bool_(False)


def _run_walk(refs, inv, sc, octant, root, tmax, ds, drain_loop, stop_fn,
              rounds, leafs, width=WIDTH):
    """Walk one (sub)tree to completion: alternate branch-free walk chunks
    with pipelined leaf-queue drains (module docstring, items 2-3).

    ``ds`` is an arbitrary drain-state pytree threaded through
    ``drain_loop(qn, tmax, ds) -> (tmax, ds)`` per filled queue;
    ``stop_fn(ds)`` aborts the walk early (the any-hit all-lanes-occluded
    exit).  ``rounds``/``leafs`` are running work counters.
    Returns ``(rounds, leafs, tmax, ds)``.
    """
    nw = _num_walks(width)
    curs0 = (root,) + tuple(jnp.int32(IDLE) for _ in range(nw - 1))

    def outer_cond(carry):
        curs, sp, qn, ds = carry[0], carry[1], carry[2], carry[6]
        return ~stop_fn(ds) & (_alive(curs, sp) | (qn > 0))

    def outer_body(carry):
        curs, sp, qn, rounds, leafs, tmax, ds = carry

        # walk chunk: step all walks until the queue nears capacity
        def walk_cond(c2):
            curs, sp, qn, _ = c2
            return _alive(curs, sp) & (qn <= _queue_cap(width) - width)

        def walk_body(c2):
            curs, sp, qn, rounds = c2
            new = []
            for w in range(nw):
                cw, sp, qn = _walk_step(curs[w], sp, qn, tmax, refs, inv,
                                        sc, octant, width)
                new.append(cw)
            return tuple(new), sp, qn, rounds + 1

        curs, sp, qn, rounds = jax.lax.while_loop(walk_cond, walk_body,
                                                  (curs, sp, qn, rounds))
        leafs = leafs + qn
        tmax, ds = drain_loop(qn, tmax, ds)
        return curs, sp, jnp.int32(0), rounds, leafs, tmax, ds

    out = jax.lax.while_loop(outer_cond, outer_body,
                             (curs0, jnp.int32(0), jnp.int32(0), rounds,
                              leafs, tmax, ds))
    return out[3], out[4], out[5], out[6]


def _simple_drain_loop(q_ref, lt_ref, drain_fn):
    """Drain the leaf queue from VMEM-resident leaf rows."""

    def loop(qn, tmax, ds):
        def body(c2):
            qi, tmax, ds = c2
            meta = q_ref[qi]
            row_b = jnp.broadcast_to(lt_ref[pl.ds(meta >> 4, 1), :],
                                     (MT_SUBLANES, 128))
            tmax, ds = drain_fn(meta, row_b, tmax, ds)
            return qi + 1, tmax, ds

        _, tmax, ds = jax.lax.while_loop(lambda c2: c2[0] < qn, body,
                                         (jnp.int32(0), tmax, ds))
        return tmax, ds

    return loop


DMA_DEPTH = 8  # leaf-row prefetch pipeline depth (HBM-streamed tables)


def _hbm_drain_loop(q_ref, lt_hbm, rowbuf, sems, drain_fn):
    """Drain the leaf queue from HBM with a DMA prefetch pipeline.

    The deferred leaf queue doubles as the lookahead list: rows qi..qi+DEPTH
    are in flight into the ``rowbuf`` ring while row qi is MT-tested, so the
    ~1 us HBM latency overlaps compute instead of serializing it (the
    VMEM-cliff fix: scenes whose leaf table exceeds VMEM stream at HBM
    latency instead of falling to the XLA gather path)."""

    def start(qi):
        slot = qi & (DMA_DEPTH - 1)
        pltpu.make_async_copy(lt_hbm.at[pl.ds(q_ref[qi] >> 4, 1), :],
                              rowbuf.at[slot], sems.at[slot]).start()

    def loop(qn, tmax, ds):
        def pro(s, _):
            @pl.when(s < qn)
            def _():
                start(s)
            return 0

        jax.lax.fori_loop(0, DMA_DEPTH, pro, 0)

        def body(c2):
            qi, tmax, ds = c2
            meta = q_ref[qi]
            slot = qi & (DMA_DEPTH - 1)
            pltpu.make_async_copy(lt_hbm.at[pl.ds(meta >> 4, 1), :],
                                  rowbuf.at[slot], sems.at[slot]).wait()
            row_b = jnp.broadcast_to(rowbuf[slot], (MT_SUBLANES, 128))
            tmax, ds = drain_fn(meta, row_b, tmax, ds)

            @pl.when(qi + DMA_DEPTH < qn)
            def _():
                start(qi + DMA_DEPTH)
            return qi + 1, tmax, ds

        _, tmax, ds = jax.lax.while_loop(lambda c2: c2[0] < qn, body,
                                         (jnp.int32(0), tmax, ds))
        return tmax, ds

    return loop


def _closest_drain(o, d, inst_id=None):
    """Drain-state update for closest-hit: MT-test a leaf row, keep the
    per-lane closest accepted hit and shrink tmax.  ``inst_id`` (scalar) is
    recorded per winning lane when given (two-level traversal)."""

    def drain(meta, row_b, tmax, ds):
        if inst_id is None:
            t, prim, n3 = ds
        else:
            t, prim, inst, n3 = ds
        bt, bp, bnx, bny, bnz = _mt8(row_b, o, d, tmax)
        ok = (bp >= 0) & ((meta & 15) > 0)
        tmax = jnp.where(ok, bt, tmax)
        t = jnp.where(ok, bt, t)
        prim = jnp.where(ok, bp.astype(jnp.int32), prim)
        n3 = tuple(jnp.where(ok, bn, n) for bn, n in zip((bnx, bny, bnz), n3))
        if inst_id is None:
            return tmax, (t, prim, n3)
        inst = jnp.where(ok, inst_id, inst)
        return tmax, (t, prim, inst, n3)

    return drain


def _anyhit_drain(o, d, exclude):
    """Drain-state update for any-hit: one accepted non-excluded hit occludes
    the lane; occluded lanes drop their tmax so the walk prunes them."""

    def drain(meta, row_b, tmax, occluded):
        h = _mt8_any(row_b, o, d, tmax, exclude) & ((meta & 15) > 0)
        occluded = occluded | h.astype(jnp.int32)
        return jnp.where(occluded != 0, -BIG, tmax), occluded

    return drain


def _make_closest_kernel(leaf_hbm: bool, meta_vmem: bool = False,
                         packed_nodes: bool = False, width: int = WIDTH):
  """Wide closest-hit kernel: in-kernel tile loop (tables DMA'd once), per
  tile an outer loop alternating walk chunks and leaf-queue drains.

  ``st_ref [n_tiles, 2]`` (SMEM) are per-tile traversal counters — walk-loop
  rounds (NUM_WALKS node steps each, idle walks included) and leaf-row
  visits — the node-visits observability the reference never had.

  With ``leaf_hbm`` the leaf table stays in HBM and drains stream rows
  through a DMA ring (two extra scratch args); with ``meta_vmem`` the
  child_meta/node_info SMEM inputs are dropped and meta comes from the
  bounds-row mirror lanes (see _vmem_meta)."""

  def kernel(*args):
    if meta_vmem:
        o_ref, d_ref, t_ref, act_ref, nb_ref, lt_ref, *rest = args
        cm_at, info_read = _vmem_meta(nb_ref, packed_nodes, width)
    else:
        (o_ref, d_ref, t_ref, act_ref, ni_ref, cm_ref, nb_ref, lt_ref,
         *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    row_at = _node_row(nb_ref, packed_nodes)
    (hit_ref, tout_ref, prim_ref, nx_ref, ny_ref, nz_ref,
     st_ref, stack_ref, q_ref, *dma) = rest
    n_tiles = hit_ref.shape[0]

    def tile_body(ti, _):
      o, d, inv, sc, tmax0, octant = _ray_setup(o_ref, d_ref, t_ref, ti)
      valid = act_ref[ti] != 0
      tmax = jnp.where(valid, tmax0, -BIG)
      any_valid = jnp.any(valid)

      # the pop path reads stack_ref[max(sp-1, 0)] UNCONDITIONALLY (selects
      # discard it when sp == 0); seed slot 0 so the speculative child_meta
      # index derived from it is always in range (uninitialized SMEM would be
      # an out-of-bounds scalar load => device fault)
      stack_ref[0] = 0

      refs = (row_at, cm_at, info_read, stack_ref, q_ref)
      drain_fn = _closest_drain(o, d)
      if leaf_hbm:
          dloop = _hbm_drain_loop(q_ref, lt_ref, dma[0], dma[1], drain_fn)
      else:
          dloop = _simple_drain_loop(q_ref, lt_ref, drain_fn)
      ds0 = (jnp.full(tmax.shape, BIG, jnp.float32),
             jnp.full(tmax.shape, -1, jnp.int32),
             (jnp.zeros_like(tmax),) * 3)
      rounds, leafs, _, ds = _run_walk(
          refs, inv, sc, octant, jnp.where(any_valid, 0, IDLE), tmax, ds0,
          dloop, _never, jnp.int32(0), jnp.int32(0), width=width)
      t, prim, n3 = ds
      hit = (prim >= 0) & valid
      hit_ref[ti] = hit.astype(jnp.int32)
      tout_ref[ti] = t
      prim_ref[ti] = jnp.where(hit, prim, -1)
      nx_ref[ti] = n3[0]
      ny_ref[ti] = n3[1]
      nz_ref[ti] = n3[2]
      st_ref[ti, 0] = rounds
      st_ref[ti, 1] = leafs
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


def _make_anyhit_kernel(leaf_hbm: bool, meta_vmem: bool = False,
                        packed_nodes: bool = False, width: int = WIDTH):
  """Wide any-hit kernel with excluded prim id; early exit once every valid
  lane is occluded (bvh.cuh:318,328).  See _make_closest_kernel."""

  def kernel(*args):
    if meta_vmem:
        o_ref, d_ref, t_ref, act_ref, ex_ref, nb_ref, lt_ref, *rest = args
        cm_at, info_read = _vmem_meta(nb_ref, packed_nodes, width)
    else:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, ni_ref, cm_ref, nb_ref,
         lt_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width)
    row_at = _node_row(nb_ref, packed_nodes)
    occ_ref, st_ref, stack_ref, q_ref, *dma = rest
    n_tiles = occ_ref.shape[0]

    def tile_body(ti, _):
      o, d, inv, sc, tmax0, octant = _ray_setup(o_ref, d_ref, t_ref, ti)
      valid = act_ref[ti] != 0
      exclude = ex_ref[ti]
      tmax_all = jnp.where(valid, tmax0, -BIG)
      any_valid = jnp.any(valid)

      stack_ref[0] = 0  # see _make_closest_kernel: speculative pop reads it

      refs = (row_at, cm_at, info_read, stack_ref, q_ref)
      drain_fn = _anyhit_drain(o, d, exclude)
      if leaf_hbm:
          dloop = _hbm_drain_loop(q_ref, lt_ref, dma[0], dma[1], drain_fn)
      else:
          dloop = _simple_drain_loop(q_ref, lt_ref, drain_fn)
      stop = lambda occ: jnp.all((occ != 0) | ~valid)
      rounds, leafs, _, occluded = _run_walk(
          refs, inv, sc, octant, jnp.where(any_valid, 0, IDLE), tmax_all,
          jnp.zeros(tmax_all.shape, jnp.int32), dloop, stop,
          jnp.int32(0), jnp.int32(0), width=width)
      occ_ref[ti] = jnp.where((occluded != 0) & valid, 1, 0)
      st_ref[ti, 0] = rounds
      st_ref[ti, 1] = leafs
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


# ================================================= two-level (instanced) path


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InstancedTables:
    """Concatenated wide tables + per-instance records for the in-kernel
    two-level traversal.

    One kernel launch traverses the base scene AND every instance: per
    packet tile the kernel culls instances by world AABB (one slab test
    each), then walks each surviving instance's BLAS with the rays
    transformed into its local frame — replacing the per-instance
    full-pool-width launches of the host-loop fallback (the reference has no
    instancing at all; main.cu:67-84 bakes transforms into triangles).

    ``wide``: base-scene tables and every unique mesh's tables concatenated
    (child refs re-offset).  ``root [I] i32``: each instance's BLAS root
    wide-node.  ``affine [I*18] f32``: per instance 12 world->local affine
    row floats + 6 world-AABB floats.  Instance 0 is the base scene
    (identity transform, root 0).
    """

    wide: WideTables
    root: jax.Array
    affine: jax.Array

    @property
    def num_instances(self) -> int:
        return self.root.shape[0]


def concat_wide_tables(parts):
    """Concatenate WideTables, re-offsetting child refs.

    Returns ``(tables, node_offsets, leaf_offsets)``.  child_meta packs
    ``(value << 4) | count``: leaf entries (count > 0) get the leaf-row
    offset, internal entries (count == 0, value > 0) the node offset;
    empty slots (0) stay 0 — they are never dereferenced (NaN boxes never
    hit the slab test).
    """
    assert all(not t.packed_nodes for t in parts), \
        "concat_wide_tables needs unpacked node rows (pack last)"
    width = parts[0].width
    assert all(t.width == width for t in parts), \
        "concat_wide_tables needs a uniform node width"
    node_off, leaf_off = [], []
    nb, cm, ni, lt = [], [], [], []
    n_nodes = n_leaves = 0
    total_nodes = sum(t.num_wide_nodes for t in parts)
    total_leaves = sum(t.num_leaf_rows for t in parts)
    assert total_nodes < (1 << 20) and total_leaves < (1 << 20), \
        "concatenated meta refs must stay exact as f32 (< 2^24 after << 4)"
    for t in parts:
        node_off.append(n_nodes)
        leaf_off.append(n_leaves)
        cmk = np.asarray(t.child_meta)
        count = cmk & 15
        value = cmk >> 4
        value = np.where(count > 0, value + n_leaves,
                         np.where(value > 0, value + n_nodes, 0))
        cmk2 = ((value << 4) | count).astype(np.int32)
        cm.append(cmk2)
        # keep the bounds-row meta mirror lanes consistent with the
        # re-offset SMEM meta (the instanced kernel reads SMEM, but the
        # mirrors must never go stale)
        nbk = np.array(np.asarray(t.node_bounds))
        nbk[:, 6 * width:7 * width] = \
            cmk2.reshape(-1, width).astype(np.float32)
        nb.append(nbk)
        ni.append(np.asarray(t.node_info))
        lt.append(np.asarray(t.leaf_tris))
        n_nodes += t.num_wide_nodes
        n_leaves += t.num_leaf_rows
    tables = WideTables(
        node_bounds=jnp.asarray(np.concatenate(nb)),
        child_meta=jnp.asarray(np.concatenate(cm)),
        node_info=jnp.asarray(np.concatenate(ni)),
        leaf_tris=jnp.asarray(np.concatenate(lt)),
        width=width,
    )
    return tables, node_off, leaf_off


def build_instanced_tables(base: WideTables, base_lo, base_hi,
                           blas_tables, instances) -> InstancedTables | None:
    """Assemble the two-level kernel tables.

    ``blas_tables``: WideTables per unique mesh; ``instances``: an
    accel.instancing.InstanceTable.  Returns None when any table is missing
    or the combined tables exceed VMEM.  (Round 3 lifted the old
    31-instance pending-bitmask cap — the kernel loops instances with an
    IDLE-root cull — and oversized meta now rides the VMEM mirror lanes.)
    """
    if base is None or any(t is None for t in blas_tables):
        return None
    parts = [base] + list(blas_tables)
    if len({t.width for t in parts}) != 1:
        return None  # mixed widths cannot concatenate (per-instance loop)
    rows = sum(t.num_wide_nodes + t.num_leaf_rows for t in parts)
    if rows * 512 >= (100 << 20):  # combined tables must fit VMEM
        return None
    if parts[0].width != WIDTH and \
            sum(t.num_wide_nodes for t in parts) >= MAX_NODES16:
        # 16-wide stack entries address the CONCATENATED node table; the
        # scene builder screens for this and rebuilds 8-wide, so this is a
        # belt-and-braces refusal (per-instance fallback stays correct)
        return None
    wide, node_off, _ = concat_wide_tables([base] + list(blas_tables))

    inv = np.asarray(instances.inv, np.float32).reshape(instances.num, 12)
    lo = np.asarray(instances.aabb_lo, np.float32)
    hi = np.asarray(instances.aabb_hi, np.float32)
    ident = np.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], np.float32)

    n_inst = 1 + instances.num
    aff = np.zeros((n_inst, 18), np.float32)
    root = np.zeros(n_inst, np.int32)
    aff[0, :12] = ident
    aff[0, 12:15] = np.asarray(base_lo, np.float32)
    aff[0, 15:18] = np.asarray(base_hi, np.float32)
    for i in range(instances.num):
        aff[1 + i, :12] = inv[i]
        aff[1 + i, 12:15] = lo[i]
        aff[1 + i, 15:18] = hi[i]
        root[1 + i] = node_off[1 + instances.mesh_id[i]]
    return InstancedTables(wide=wide, root=jnp.asarray(root),
                           affine=jnp.asarray(aff.reshape(-1)))


def _world_slab_pre(o, d):
    eps = float(np.finfo(np.float32).eps)
    safe = tuple(jnp.where(jnp.abs(dk) < eps, jnp.copysign(eps, dk), dk)
                 for dk in d)
    inv = tuple(1.0 / dk for dk in safe)
    sc = tuple(-ok * ik for ok, ik in zip(o, inv))
    md = tuple(jnp.sum(dk) for dk in d)
    octant = ((md[0] < 0).astype(jnp.int32)
              | ((md[1] < 0).astype(jnp.int32) << 1)
              | ((md[2] < 0).astype(jnp.int32) << 2))
    return inv, sc, octant


def _inst_local_rays(ai_ref, k, o_w, d_w):
    """Transform the packet into instance k's local frame (12 scalar affine
    rows broadcast against the ray vectors).  The local direction is NOT
    normalized, so the ray parameter t stays in world units and one tmax
    prunes across instances."""
    A = tuple(ai_ref[18 * k + j] for j in range(12))
    o_l = (A[0] * o_w[0] + A[1] * o_w[1] + A[2] * o_w[2] + A[3],
           A[4] * o_w[0] + A[5] * o_w[1] + A[6] * o_w[2] + A[7],
           A[8] * o_w[0] + A[9] * o_w[1] + A[10] * o_w[2] + A[11])
    d_l = (A[0] * d_w[0] + A[1] * d_w[1] + A[2] * d_w[2],
           A[4] * d_w[0] + A[5] * d_w[1] + A[6] * d_w[2],
           A[8] * d_w[0] + A[9] * d_w[1] + A[10] * d_w[2])
    inv, sc, octant = _world_slab_pre(o_l, d_l)
    return o_l, d_l, inv, sc, octant


def _inst_cull(ai_ref, k, inv_w, sc_w, tmax):
    """Does any lane hit instance k's world AABB?  (One slab + one packed
    reduction — the per-instance cull of the in-kernel loop.)"""
    b = tuple(ai_ref[18 * k + 12 + j] for j in range(6))
    return jnp.any(_slab(b, inv_w, sc_w, tmax))


def _inst_entry_dist(ai_ref, k, inv_w, sc_w, tmax):
    """Packet entry distance to instance k's world AABB: min over hitting
    lanes of max(slab entry, 0); BIG when no lane hits.  One slab + one
    packed min-reduction."""
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
    hit = (entry <= exit_) & (exit_ >= 0.0) & (entry <= tmax)
    return jnp.min(jnp.where(hit, jnp.maximum(entry, 0.0), BIG))


def _inst_order_setup(ai_ref, dist_ref, num_inst, inv_w, sc_w, tmax):
    """Fill dist_ref[k] with each instance's packet entry distance (BIG
    when culled).  The visit loop then repeatedly extracts the nearest
    unvisited instance, so closer geometry shrinks tmax BEFORE farther
    instances are walked — the two-level analog of the reference's
    nearest-first child ordering (bvh.cuh:284-290)."""

    def body(k, _):
        dist_ref[k] = _inst_entry_dist(ai_ref, k, inv_w, sc_w, tmax)
        return 0

    jax.lax.fori_loop(0, num_inst, body, 0)


def _inst_next(dist_ref, num_inst):
    """Pop the nearest pending instance: scalar argmin over dist_ref, then
    mark it visited (dist = BIG).  Returns (k, dist)."""

    def scan(k, best):
        d = dist_ref[k]
        better = d < best[0]
        return jnp.where(better, d, best[0]), jnp.where(better, k, best[1])

    bd, bk = jax.lax.fori_loop(0, num_inst, scan,
                               (jnp.float32(BIG), jnp.int32(0)))
    dist_ref[bk] = BIG
    return bk, bd


def _make_closest_inst_kernel(meta_vmem: bool = False, width: int = WIDTH):
  """Two-level wide closest-hit (see InstancedTables).  Outputs add
  ``inst_ref``: the winning instance per lane (0 = base scene); normals are
  LOCAL-frame (the caller applies the instance's cofactor transform).

  Instances are visited with a ``fori_loop`` whose culled iterations start
  the walk at an IDLE root: the walk's while_loop condition is then false
  on entry, so a culled instance costs one slab test + one reduction.
  This replaced the round-2 int32 pending bitmask (and its 31-instance
  cap); ``lax.cond`` around the walk is not an option — Mosaic forbids
  vector->scalar reductions inside cond regions."""

  def kernel(*args):
    if meta_vmem:
        (o_ref, d_ref, t_ref, act_ref, root_ref, ai_ref, nb_ref, lt_ref,
         *rest) = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, root_ref, ai_ref, ni_ref, cm_ref,
         nb_ref, lt_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width=width)
    (hit_ref, tout_ref, prim_ref, inst_ref,
     nx_ref, ny_ref, nz_ref, st_ref, stack_ref, q_ref, dist_ref) = rest
    n_tiles = hit_ref.shape[0]
    num_inst = root_ref.shape[0]

    def tile_body(ti, _):
      o_w = (o_ref[ti, 0], o_ref[ti, 1], o_ref[ti, 2])
      d_w = (d_ref[ti, 0], d_ref[ti, 1], d_ref[ti, 2])
      valid = act_ref[ti] != 0
      tmax = jnp.where(valid, t_ref[ti], -BIG)
      stack_ref[0] = 0  # speculative pop reads slot 0 (_make_closest_kernel)
      refs = (_node_row(nb_ref), cm_at, info_read, stack_ref, q_ref)

      inv_w, sc_w, _ = _world_slab_pre(o_w, d_w)

      shape = tmax.shape
      ds0 = (jnp.full(shape, BIG, jnp.float32),
             jnp.full(shape, -1, jnp.int32),
             jnp.zeros(shape, jnp.int32),
             (jnp.zeros(shape, jnp.float32),) * 3)

      # nearest-first instance order: closer geometry shrinks tmax before
      # farther instances are considered, and the per-visit re-cull against
      # the CURRENT tmax then skips fully-occluded instances outright
      _inst_order_setup(ai_ref, dist_ref, num_inst, inv_w, sc_w, tmax)

      def inst_body(i, c):
          rounds, leafs, tmax, ds = c
          k, dist = _inst_next(dist_ref, num_inst)
          pending = (dist < BIG) & _inst_cull(ai_ref, k, inv_w, sc_w, tmax)
          o_l, d_l, inv, sc, octant = _inst_local_rays(ai_ref, k, o_w, d_w)
          root = jnp.where(pending, root_ref[k], IDLE)
          dloop = _simple_drain_loop(q_ref, lt_ref,
                                     _closest_drain(o_l, d_l, inst_id=k))
          rounds, leafs, tmax, ds = _run_walk(
              refs, inv, sc, octant, root, tmax, ds, dloop, _never,
              rounds, leafs, width=width)
          return rounds, leafs, tmax, ds

      out = jax.lax.fori_loop(0, num_inst, inst_body,
                              (jnp.int32(0), jnp.int32(0), tmax, ds0))
      rounds, leafs, _, ds = out
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
      st_ref[ti, 1] = leafs
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


def _make_anyhit_inst_kernel(meta_vmem: bool = False, width: int = WIDTH):
  """Two-level wide any-hit.  The excluded prim id applies only within the
  base scene (instance 0) — shadow-ray light exclusion targets base-scene
  triangles (lights cannot be instanced).  Same IDLE-root instance loop as
  _make_closest_inst_kernel; all-lanes-occluded also idles the remaining
  instances' walks."""

  def kernel(*args):
    if meta_vmem:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, root_ref, ai_ref, nb_ref,
         lt_ref, *rest) = args
        cm_at, info_read = _vmem_meta(nb_ref, width=width)
    else:
        (o_ref, d_ref, t_ref, act_ref, ex_ref, root_ref, ai_ref, ni_ref,
         cm_ref, nb_ref, lt_ref, *rest) = args
        cm_at, info_read = _smem_meta(cm_ref, ni_ref, width=width)
    occ_ref, st_ref, stack_ref, q_ref, dist_ref = rest
    n_tiles = occ_ref.shape[0]
    num_inst = root_ref.shape[0]

    def tile_body(ti, _):
      o_w = (o_ref[ti, 0], o_ref[ti, 1], o_ref[ti, 2])
      d_w = (d_ref[ti, 0], d_ref[ti, 1], d_ref[ti, 2])
      valid = act_ref[ti] != 0
      exclude = ex_ref[ti]
      tmax_all = jnp.where(valid, t_ref[ti], -BIG)
      stack_ref[0] = 0
      refs = (_node_row(nb_ref), cm_at, info_read, stack_ref, q_ref)

      inv_w, sc_w, _ = _world_slab_pre(o_w, d_w)
      stop = lambda occ: jnp.all((occ != 0) | ~valid)
      no_excl = jnp.full(exclude.shape, -1, jnp.int32)

      # nearest-first here too: finding occluders early trips the
      # all-lanes-occluded stop and idles the remaining instances' walks
      _inst_order_setup(ai_ref, dist_ref, num_inst, inv_w, sc_w, tmax_all)

      def inst_body(i, c):
          rounds, leafs, tmax, occ = c
          k, dist = _inst_next(dist_ref, num_inst)
          pending = (dist < BIG) & ~stop(occ) & \
              _inst_cull(ai_ref, k, inv_w, sc_w, tmax)
          o_l, d_l, inv, sc, octant = _inst_local_rays(ai_ref, k, o_w, d_w)
          root = jnp.where(pending, root_ref[k], IDLE)
          ex_k = jnp.where(k == 0, exclude, no_excl)
          dloop = _simple_drain_loop(q_ref, lt_ref,
                                     _anyhit_drain(o_l, d_l, ex_k))
          rounds, leafs, tmax, occ = _run_walk(
              refs, inv, sc, octant, root, tmax, occ, dloop, stop,
              rounds, leafs, width=width)
          return rounds, leafs, tmax, occ

      out = jax.lax.fori_loop(
          0, num_inst, inst_body,
          (jnp.int32(0), jnp.int32(0), tmax_all,
           jnp.zeros(tmax_all.shape, jnp.int32)))
      occ_ref[ti] = jnp.where((out[3] != 0) & valid, 1, 0)
      st_ref[ti, 0] = out[0]
      st_ref[ti, 1] = out[1]
      return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

  return kernel


# ================================================================= wrappers

def _to_tiles(x, n_tiles):
    """Ray vectors -> (n_tiles, 3, SUBLANES, 128).

    Accepts an ``[N, 3]`` array or a component triple of ``[N]`` arrays
    (core.v3, the engine's hot-path layout — avoids materializing the
    padded trailing-3 layout at all).
    """
    if isinstance(x, tuple):
        return jnp.stack([c.reshape(n_tiles, SUBLANES, 128) for c in x],
                         axis=1)
    return x.T.reshape(3, n_tiles, SUBLANES, 128).transpose(1, 0, 2, 3)


def _scalar_tiles(x, n_tiles):
    return x.reshape(n_tiles, SUBLANES, 128)


def _pad(x, n, fill):
    if isinstance(x, tuple):
        return tuple(_pad(c, n, fill) for c in x)
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)
_SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)


def _vmem_limit(tables: WideTables, n_rays: int,
                leaf_hbm: bool = False) -> int:
    rows = tables.node_bounds.shape[0]
    if not leaf_hbm:
        rows += tables.leaf_tris.shape[0]
    table_bytes = rows * 128 * 4
    ray_bytes = n_rays * 4 * 14
    return min(int((table_bytes + ray_bytes) * 1.25) + (4 << 20), 127 << 20)


def _scratch(leaf_hbm: bool = False):
    s = [pltpu.SMEM((STACK_SIZE,), jnp.int32),
         pltpu.SMEM((Q_ALLOC,), jnp.int32)]
    if leaf_hbm:
        s += [pltpu.VMEM((DMA_DEPTH, 1, 128), jnp.float32),
              pltpu.SemaphoreType.DMA((DMA_DEPTH,))]
    return s


_HBM = pl.BlockSpec(memory_space=pl.ANY)


@partial(jax.jit, static_argnames=("interpret", "with_stats", "leaf_hbm",
                                   "meta_vmem"))
def wide_traverse_closest(tables: WideTables, origin, direction, tmax,
                          active, interpret: bool = False,
                          with_stats: bool = False, leaf_hbm: bool = False,
                          meta_vmem: bool = False):
    """Wide-BVH packet closest-hit traversal.

    Returns ``(hit, t, prim, normal)`` over ``[N]`` rays, where ``normal``
    ``[N, 3]`` is the hit triangle's unnormalized geometric normal
    (cross(e1, e2), triangle.cuh:19) — zero on miss.  The reference's
    intersection record also carries (u, v) (triangle.cuh:29-37); the
    engine computes hit positions as o + t*d and never reads them, so the
    kernel does not extract them (fewer live payloads across the walk
    loop; the XLA fallback still returns them).  With
    ``with_stats=True`` a trailing ``(walk_rounds, leaf_visits)`` int32
    scalar pair is appended (summed over tiles; a walk round = NUM_WALKS
    wide-node steps, idle walks included).  ``leaf_hbm`` keeps the leaf
    table in HBM and streams rows per visit (big-scene mode).
    """
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)

    shp = (n_tiles, SUBLANES, 128)
    leaf_spec = _HBM if leaf_hbm else _VMEM
    if meta_vmem:
        in_specs = [_VMEM] * 5 + [leaf_spec]
        ins = (o, d, tm, act, tables.node_bounds, tables.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _VMEM,
                    leaf_spec]
        ins = (o, d, tm, act, tables.node_info, tables.child_meta,
               tables.node_bounds, tables.leaf_tris)
    out_shape = [jax.ShapeDtypeStruct(shp, jnp.int32),
                 jax.ShapeDtypeStruct(shp, jnp.float32),
                 jax.ShapeDtypeStruct(shp, jnp.int32)]
    out_shape += [jax.ShapeDtypeStruct(shp, jnp.float32)] * 3
    out_shape += [jax.ShapeDtypeStruct((n_tiles, 2), jnp.int32)]
    outs = pl.pallas_call(
        _make_closest_kernel(leaf_hbm, meta_vmem, tables.packed_nodes,
                             tables.width),
        in_specs=in_specs,
        out_specs=[_VMEM] * 6 + [_SMEM],
        out_shape=out_shape,
        scratch_shapes=_scratch(leaf_hbm),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad, leaf_hbm)),
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
        out = out + ((jnp.sum(st[:, 0]), jnp.sum(st[:, 1])),)
    return out


@partial(jax.jit, static_argnames=("interpret", "with_stats", "leaf_hbm",
                                   "meta_vmem"))
def wide_traverse_anyhit(tables: WideTables, origin, direction, tmax,
                         exclude, active, interpret: bool = False,
                         with_stats: bool = False, leaf_hbm: bool = False,
                         meta_vmem: bool = False):
    """Wide-BVH packet any-hit traversal (occlusion with prim exclusion).

    With ``with_stats=True`` returns ``(occluded, (walk_rounds,
    leaf_visits))`` instead of just ``occluded``."""
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
        in_specs = [_VMEM] * 6 + [_HBM if leaf_hbm else _VMEM]
        ins = (o, d, tm, act, ex, tables.node_bounds, tables.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _VMEM,
                    _HBM if leaf_hbm else _VMEM]
        ins = (o, d, tm, act, ex, tables.node_info, tables.child_meta,
               tables.node_bounds, tables.leaf_tris)
    occ, st = pl.pallas_call(
        _make_anyhit_kernel(leaf_hbm, meta_vmem, tables.packed_nodes,
                            tables.width),
        in_specs=in_specs,
        out_specs=[_VMEM, _SMEM],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, SUBLANES, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, 2), jnp.int32)],
        scratch_shapes=_scratch(leaf_hbm),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tables, n_pad, leaf_hbm)),
        interpret=interpret,
    )(*ins)
    occluded = occ.reshape(n_pad)[:n] != 0
    if with_stats:
        return occluded, (jnp.sum(st[:, 0]), jnp.sum(st[:, 1]))
    return occluded


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def wide_traverse_closest_inst(tabs: InstancedTables, origin, direction,
                               tmax, active, interpret: bool = False,
                               with_stats: bool = False,
                               meta_vmem: bool = False):
    """Two-level closest-hit over base scene + all instances in ONE launch.

    Returns ``(hit, t, prim, inst, normal_local)``: ``inst`` is 0 for
    base-scene hits and k for instance k (1-based, matching the engine's
    ``src``); ``prim`` is the triangle index within that instance's mesh;
    ``normal_local`` is the hit triangle's unnormalized geometric normal in
    the instance's LOCAL frame — apply the instance cofactor transform for
    world space.  ``with_stats`` appends ``(walk_rounds, leaf_visits)``.
    ``meta_vmem`` reads node meta from the bounds-row mirror lanes (big
    combined tables whose meta exceeds SMEM).
    """
    as_v3 = isinstance(origin, tuple)
    n = origin[0].shape[0] if as_v3 else origin.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    n_tiles = n_pad // TILE

    o = _to_tiles(_pad(origin, n_pad, 0.0), n_tiles)
    d = _to_tiles(_pad(direction, n_pad, 1.0), n_tiles)
    tm = _scalar_tiles(_pad(tmax, n_pad, 0.0), n_tiles)
    act = _scalar_tiles(_pad(active.astype(jnp.int32), n_pad, 0), n_tiles)

    shp = (n_tiles, SUBLANES, 128)
    f32 = jnp.float32
    if meta_vmem:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _VMEM, _VMEM]
        ins = (o, d, tm, act, tabs.root, tabs.affine,
               tabs.wide.node_bounds, tabs.wide.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _SMEM, _SMEM,
                    _VMEM, _VMEM]
        ins = (o, d, tm, act, tabs.root, tabs.affine, tabs.wide.node_info,
               tabs.wide.child_meta, tabs.wide.node_bounds,
               tabs.wide.leaf_tris)
    outs = pl.pallas_call(
        _make_closest_inst_kernel(meta_vmem, tabs.wide.width),
        in_specs=in_specs,
        out_specs=[_VMEM] * 7 + [_SMEM],
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct(shp, jnp.int32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct(shp, f32),
                   jax.ShapeDtypeStruct((n_tiles, 2), jnp.int32)],
        scratch_shapes=_scratch()
        + [pltpu.SMEM((tabs.root.shape[0],), jnp.float32)],
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
        out = out + ((jnp.sum(st[:, 0]), jnp.sum(st[:, 1])),)
    return out


@partial(jax.jit, static_argnames=("interpret", "with_stats", "meta_vmem"))
def wide_traverse_anyhit_inst(tabs: InstancedTables, origin, direction,
                              tmax, exclude, active, interpret: bool = False,
                              with_stats: bool = False,
                              meta_vmem: bool = False):
    """Two-level any-hit over base scene + all instances in one launch.

    ``exclude`` (base-scene prim id) applies only within instance 0."""
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
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _VMEM,
                    _VMEM]
        ins = (o, d, tm, act, ex, tabs.root, tabs.affine,
               tabs.wide.node_bounds, tabs.wide.leaf_tris)
    else:
        in_specs = [_VMEM, _VMEM, _VMEM, _VMEM, _VMEM, _SMEM, _SMEM, _SMEM,
                    _SMEM, _VMEM, _VMEM]
        ins = (o, d, tm, act, ex, tabs.root, tabs.affine,
               tabs.wide.node_info, tabs.wide.child_meta,
               tabs.wide.node_bounds, tabs.wide.leaf_tris)
    occ, st = pl.pallas_call(
        _make_anyhit_inst_kernel(meta_vmem, tabs.wide.width),
        in_specs=in_specs,
        out_specs=[_VMEM, _SMEM],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, SUBLANES, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, 2), jnp.int32)],
        scratch_shapes=_scratch()
        + [pltpu.SMEM((tabs.root.shape[0],), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tabs.wide, n_pad)),
        interpret=interpret,
    )(*ins)
    occluded = occ.reshape(n_pad)[:n] != 0
    if with_stats:
        return occluded, (jnp.sum(st[:, 0]), jnp.sum(st[:, 1]))
    return occluded
