"""Wide (BVH8) Pallas packet traversal vs XLA traversal parity
(interpret mode on CPU) + wide-table structural invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtjax.accel import build_bvh_np
from rtjax.core.geometry import Triangles
from rtjax.kernels import traverse_anyhit, traverse_closest
from rtjax.kernels.pallas_wide import (WIDTH, build_wide_tables,
                                       collapse_wide, wide_traverse_anyhit,
                                       wide_traverse_closest)

from conftest import random_triangles


def _pack(n_tris=300, max_leaf=8, seed=11):
    rng = np.random.default_rng(seed)
    p0, p1, p2 = random_triangles(rng, n_tris)
    tris = Triangles.from_vertices(p0, p1, p2)
    bmin, bmax = (np.asarray(b) for b in tris.bounds())
    res = build_bvh_np(bmin, bmax, np.asarray(tris.center()),
                       max_leaf_size=max_leaf)
    perm = res.perm
    ptris = Triangles(p0=tris.p0[perm], e1=tris.e1[perm], e2=tris.e2[perm],
                      n=tris.n[perm])
    tables = build_wide_tables(res, np.asarray(ptris.p0),
                               np.asarray(ptris.e1), np.asarray(ptris.e2),
                               np.asarray(ptris.n))
    return res, ptris, tables


@pytest.fixture(scope="module")
def packed_scene():
    return _pack()


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def test_collapse_invariants(packed_scene):
    """Every binary leaf appears exactly once; internal refs are acyclic and
    in range; empty slots are leaf-marked with NaN boxes."""
    res, _, tables = packed_scene
    nb = np.asarray(tables.node_bounds)
    cm = np.asarray(tables.child_meta)
    ni = np.asarray(tables.node_info)
    m = nb.shape[0]

    seen = np.zeros(m, bool)
    stack = [0]
    leaf_rows = []
    while stack:
        n_ = stack.pop()
        assert not seen[n_], "wide node visited twice (cycle)"
        seen[n_] = True
        lm = ni[n_] & 255
        for c in range(WIDTH):
            meta = int(cm[n_ * WIDTH + c])
            if (lm >> c) & 1:
                if meta & 15:
                    leaf_rows.append(meta >> 4)
                else:  # empty slot: NaN box never hits
                    assert np.isnan(nb[n_, 6 * c])
            else:
                ref = meta >> 4
                assert 0 <= ref < m and ref != n_
                stack.append(ref)
    assert seen.all()
    # the final leaf row is the all-zero dummy (lane-walker pop target):
    # never referenced by child_meta, rejects every MT test
    assert sorted(leaf_rows) == list(range(tables.leaf_tris.shape[0] - 1))
    assert not np.asarray(tables.leaf_tris)[-1].any()


def test_wide_closest_matches_xla(packed_scene):
    res, ptris, tables = packed_scene
    bvh = res.to_device()
    n = 2048 + 300  # one full tile + ragged remainder exercises padding
    o, d = _rays(n)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.asarray(np.random.default_rng(5).random(n) > 0.1)

    hp, tp, pp, np_ = wide_traverse_closest(tables, o, d, tmax,
                                            active, interpret=True)
    hx, tx, ux, vx, px, nx_ = traverse_closest(bvh, ptris, o, d, tmax, active)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hx))
    m = np.asarray(hp)
    # rtol + atol: the two kernels contract FMAs differently, so t can
    # differ by one ulp-ish on tiny hit distances (same prim, same hit)
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(tx)[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pp)[m], np.asarray(px)[m])
    # the kernel-returned geometric normal must equal the hit triangle's
    # stored cross(e1, e2) exactly (it is a copy, not a recomputation)
    np.testing.assert_array_equal(np.asarray(np_)[m], np.asarray(nx_)[m])


def test_wide_anyhit_matches_xla(packed_scene):
    res, ptris, tables = packed_scene
    bvh = res.to_device()
    n = 2048
    o, d = _rays(n, seed=7)
    tmax = jnp.full(n, 1.5)
    active = jnp.ones(n, bool)
    # exclude a rotating triangle index to exercise the exclusion path
    exclude = jnp.asarray(np.arange(n) % ptris.num, jnp.int32)

    op = wide_traverse_anyhit(tables, o, d, tmax, exclude, active,
                              interpret=True)
    ox = traverse_anyhit(bvh, ptris, o, d, tmax, exclude, active)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ox))


def test_wide_leaf_root():
    """A <=8 triangle scene collapses to a single leaf-root wide node."""
    res, ptris, tables = _pack(n_tris=5, max_leaf=8, seed=2)
    n = 512
    o, d = _rays(n, seed=9)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)
    hp, tp, pp, _ = wide_traverse_closest(tables, o, d, tmax, active,
                                          interpret=True)
    hx, tx, _, _, px, _ = traverse_closest(res.to_device(), ptris, o, d,
                                           tmax, active)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hx))
    m = np.asarray(hp)
    np.testing.assert_array_equal(np.asarray(pp)[m], np.asarray(px)[m])


def test_wide_dead_lanes():
    res, ptris, tables = _pack(n_tris=100, seed=4)
    n = 600
    o, d = _rays(n, seed=12)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.zeros(n, bool)
    hp, *_ = wide_traverse_closest(tables, o, d, tmax, active,
                                   interpret=True)
    assert not np.asarray(hp).any()


@pytest.mark.slow
def test_leaf_hbm_streaming_matches_vmem():
    """leaf_hbm=True (big-scene mode: leaf table in HBM, rows DMA-streamed
    through a prefetch ring) must produce bitwise-identical results to the
    VMEM-resident path."""
    from rtjax import SceneBuilder

    rng = np.random.default_rng(1)
    b = SceneBuilder()
    m = b.make_matte((0.5, 0.5, 0.5))
    c = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    e = rng.normal(scale=0.15, size=(500, 2, 3)).astype(np.float32)
    b.add_triangles(c, c + e[:, 0], c + e[:, 1], m)
    tables = b.build().tables

    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)
    interp = jax.default_backend() != "tpu"

    a = wide_traverse_closest(tables, o, d, tmax, active, interpret=interp)
    h = wide_traverse_closest(tables, o, d, tmax, active, interpret=interp,
                              leaf_hbm=True)
    assert int(np.asarray(a[0]).sum()) > 50
    for x, y in zip(a, h):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    ex = jnp.full(n, -1, jnp.int32)
    oa = wide_traverse_anyhit(tables, o, d, jnp.full(n, 1.0), ex, active,
                              interpret=interp)
    ob = wide_traverse_anyhit(tables, o, d, jnp.full(n, 1.0), ex, active,
                              interpret=interp, leaf_hbm=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


@pytest.mark.slow
def test_meta_vmem_matches_smem():
    """meta_vmem mode (node meta read from bounds-row mirror lanes instead
    of SMEM — the big-scene path that lifts the ~1 MB SMEM ceiling) must be
    bitwise identical, alone and combined with leaf_hbm."""
    from rtjax import SceneBuilder

    rng = np.random.default_rng(2)
    b = SceneBuilder()
    m = b.make_matte((0.5, 0.5, 0.5))
    c = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
    e = rng.normal(scale=0.15, size=(400, 2, 3)).astype(np.float32)
    b.add_triangles(c, c + e[:, 0], c + e[:, 1], m)
    tables = b.build().tables

    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)
    interp = jax.default_backend() != "tpu"

    a = wide_traverse_closest(tables, o, d, tmax, active, interpret=interp)
    assert int(np.asarray(a[0]).sum()) > 50
    for leaf_hbm in (False, True):
        h = wide_traverse_closest(tables, o, d, tmax, active,
                                  interpret=interp, meta_vmem=True,
                                  leaf_hbm=leaf_hbm)
        for x, y in zip(a, h):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    ex = jnp.full(n, -1, jnp.int32)
    oa = wide_traverse_anyhit(tables, o, d, jnp.full(n, 1.0), ex, active,
                              interpret=interp)
    ob = wide_traverse_anyhit(tables, o, d, jnp.full(n, 1.0), ex, active,
                              interpret=interp, meta_vmem=True,
                              leaf_hbm=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


@pytest.mark.slow
def test_packed_nodes_match_unpacked(packed_scene):
    """Two-nodes-per-row packing (the big-scene node tier) must be exactly
    equivalent: same hits, t, prims, normals and occlusion, in both the
    SMEM-meta and mirror-lane (meta_vmem) modes."""
    from rtjax.kernels.pallas_wide import pack_node_rows

    res, ptris, tables = packed_scene
    packed = pack_node_rows(tables)
    assert packed.num_wide_nodes == tables.num_wide_nodes
    assert packed.node_bounds.shape[0] == \
        (tables.node_bounds.shape[0] + 1) // 2

    n = 2048 + 512
    o, d = _rays(n, seed=21)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.asarray(np.random.default_rng(7).random(n) > 0.1)

    ref = wide_traverse_closest(tables, o, d, tmax, active, interpret=True)
    for meta_vmem in (False, True):
        out = wide_traverse_closest(packed, o, d, tmax, active,
                                    interpret=True, meta_vmem=meta_vmem)
        for a, b in zip(ref[:3], out[:3]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(out[3]))

    exclude = jnp.full(n, -1, jnp.int32)
    occ_ref = wide_traverse_anyhit(tables, o, d, jnp.full(n, 2.0), exclude,
                                   active, interpret=True)
    occ = wide_traverse_anyhit(packed, o, d, jnp.full(n, 2.0), exclude,
                               active, interpret=True, meta_vmem=True)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ))


def _check_tree(tables):
    """Generic wide-table invariants for any width: every leaf row
    referenced exactly once, internal refs acyclic/in-range, empty slots
    leaf-marked with NaN boxes."""
    w = tables.width
    nb = np.asarray(tables.node_bounds)
    cm = np.asarray(tables.child_meta)
    ni = np.asarray(tables.node_info)
    m = nb.shape[0]
    seen = np.zeros(m, bool)
    stack, leaf_rows = [0], []
    while stack:
        n_ = stack.pop()
        assert not seen[n_], "wide node visited twice (cycle)"
        seen[n_] = True
        lm = ni[n_] & ((1 << w) - 1)
        for c in range(w):
            meta = int(cm[n_ * w + c])
            if (lm >> c) & 1:
                if meta & 15:
                    leaf_rows.append(meta >> 4)
                else:
                    assert np.isnan(nb[n_, 6 * c])
            else:
                ref = meta >> 4
                assert 0 <= ref < m and ref != n_
                stack.append(ref)
    assert seen.all()
    # final row = unreferenced all-zero dummy (see pack_leaf_rows)
    assert sorted(leaf_rows) == list(range(tables.leaf_tris.shape[0] - 1))
    assert not np.asarray(tables.leaf_tris)[-1].any()


@pytest.mark.slow
def test_width16_matches_width8(packed_scene):
    """16-wide tables (DP collapse, one node per 128-lane row) must agree
    with the 8-wide tables on hits/t/prim/normal and occlusion, in both
    SMEM-meta and mirror-lane modes."""
    from rtjax.kernels.pallas_wide import WIDTH16

    res, ptris, tables8 = packed_scene
    t16 = build_wide_tables(res, np.asarray(ptris.p0), np.asarray(ptris.e1),
                            np.asarray(ptris.e2), np.asarray(ptris.n),
                            width=WIDTH16)
    assert t16.width == WIDTH16
    assert t16.num_wide_nodes < tables8.num_wide_nodes
    _check_tree(t16)

    n = 2048 + 300
    o, d = _rays(n, seed=17)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.asarray(np.random.default_rng(5).random(n) > 0.1)

    ref = wide_traverse_closest(tables8, o, d, tmax, active, interpret=True)
    for meta_vmem in (False, True):
        out = wide_traverse_closest(t16, o, d, tmax, active,
                                    interpret=True, meta_vmem=meta_vmem)
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    exclude = jnp.full(n, -1, jnp.int32)
    occ8 = wide_traverse_anyhit(tables8, o, d, jnp.full(n, 2.0), exclude,
                                active, interpret=True)
    occ16 = wide_traverse_anyhit(t16, o, d, jnp.full(n, 2.0), exclude,
                                 active, interpret=True, meta_vmem=True)
    np.testing.assert_array_equal(np.asarray(occ8), np.asarray(occ16))


def test_dp_collapse_matches_greedy(packed_scene, monkeypatch):
    """The DP-optimal collapse must produce a valid tree with identical
    traversal results to the greedy collapse, and a no-worse area sum."""
    res, ptris, _ = packed_scene
    monkeypatch.setenv("RTJAX_COLLAPSE", "greedy")
    tg = build_wide_tables(res, np.asarray(ptris.p0), np.asarray(ptris.e1),
                           np.asarray(ptris.e2), np.asarray(ptris.n))
    monkeypatch.delenv("RTJAX_COLLAPSE")
    td = build_wide_tables(res, np.asarray(ptris.p0), np.asarray(ptris.e1),
                           np.asarray(ptris.e2), np.asarray(ptris.n))
    _check_tree(tg)
    _check_tree(td)

    def area_sum(t):
        nb = np.asarray(t.node_bounds)
        s = 0.0
        for c in range(t.width):
            b = nb[:, 6 * c:6 * c + 6]
            ok = ~np.isnan(b[:, 0])
            d_ = np.maximum(b[ok, 3:] - b[ok, :3], 0)
            s += float((d_[:, 0] * d_[:, 1] + d_[:, 1] * d_[:, 2]
                        + d_[:, 2] * d_[:, 0]).sum())
        return s

    assert area_sum(td) <= area_sum(tg) * 1.0001

    n = 2048
    o, d = _rays(n, seed=23)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)
    a = wide_traverse_closest(tg, o, d, tmax, active, interpret=True)
    b = wide_traverse_closest(td, o, d, tmax, active, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
