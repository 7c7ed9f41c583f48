"""Lane-walker (per-sublane independent traversal) parity vs the XLA
oracle and the packet kernel, interpret mode on CPU.

The lane walker must produce IDENTICAL hits to the packet kernel: both
implement the exact reference accept rule (triangle.cuh:39-58) with full
walks, so hit masks, t, prim and normals agree bitwise except for
tie-breaks between exactly-equal t (none in these random scenes).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rtjax.accel import build_bvh_np
from rtjax.core.geometry import Triangles
from rtjax.kernels import traverse_anyhit, traverse_closest
from rtjax.kernels.pallas_lane import (LQUEUE, LSTACK, lane_traverse_anyhit,
                                       lane_traverse_closest)
from rtjax.kernels.pallas_wide import (SUBLANES, build_wide_tables,
                                       wide_traverse_closest)

from conftest import random_triangles


def _pack(n_tris=300, max_leaf=8, seed=11, width=8):
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
                               np.asarray(ptris.n), width=width)
    return res, ptris, tables


@pytest.fixture(scope="module", params=[
    8, pytest.param(16, marks=pytest.mark.slow)], ids=["w8", "w16"])
def lane_scene(request):
    return _pack(width=request.param)


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def test_lane_closest_matches_xla(lane_scene):
    res, ptris, tables = lane_scene
    bvh = res.to_device()
    n = 2048 + 300  # one full tile + ragged remainder exercises padding
    o, d = _rays(n)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.asarray(np.random.default_rng(5).random(n) > 0.1)

    hl, tl, pl_, nl = lane_traverse_closest(tables, o, d, tmax, active,
                                            interpret=True, with_stats=False)
    hx, tx, _, _, px, nx_ = traverse_closest(bvh, ptris, o, d, tmax, active)
    m = np.asarray(hx)
    np.testing.assert_array_equal(np.asarray(hl), m)
    np.testing.assert_allclose(np.asarray(tl)[m], np.asarray(tx)[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pl_)[m], np.asarray(px)[m])
    np.testing.assert_array_equal(np.asarray(nl)[m], np.asarray(nx_)[m])


@pytest.mark.slow
def test_lane_closest_matches_packet(lane_scene):
    """Bitwise agreement with the packet kernel on a mixed batch, plus the
    stats contract (rounds, visits) being positive and finite."""
    _, _, tables = lane_scene
    n = 4096
    o, d = _rays(n, seed=9)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)

    out_l = lane_traverse_closest(tables, o, d, tmax, active,
                                  interpret=True, with_stats=True)
    out_p = wide_traverse_closest(tables, o, d, tmax, active,
                                  interpret=True, with_stats=True)
    for a, b in zip(out_l[:3], out_p[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out_l[3]), np.asarray(out_p[3]))
    rounds, visits, drounds = (int(np.asarray(x)) for x in out_l[4])
    assert rounds > 0 and visits > 0
    # lockstep drains cost max(qn) per call; balanced queues keep the
    # vector-pass count within [visits/16, visits]
    assert visits / 16 <= drounds <= visits


def test_lane_anyhit_matches_xla(lane_scene):
    res, ptris, tables = lane_scene
    bvh = res.to_device()
    n = 2048
    o, d = _rays(n, seed=7)
    tmax = jnp.full(n, 1.5)
    active = jnp.ones(n, bool)
    exclude = jnp.asarray(np.arange(n) % ptris.num, jnp.int32)

    ol = lane_traverse_anyhit(tables, o, d, tmax, exclude, active,
                              interpret=True)
    ox = traverse_anyhit(bvh, ptris, o, d, tmax, exclude, active)
    np.testing.assert_array_equal(np.asarray(ol), np.asarray(ox))


@pytest.mark.slow
def test_lane_inactive_and_finite_tmax(lane_scene):
    """Inactive lanes stay misses; finite tmax prunes far hits identically
    to the oracle."""
    res, ptris, tables = lane_scene
    bvh = res.to_device()
    n = 2048
    o, d = _rays(n, seed=13)
    tmax = jnp.full(n, 0.7)
    active = jnp.asarray(np.random.default_rng(2).random(n) > 0.5)

    hl, tl, pl_, _ = lane_traverse_closest(tables, o, d, tmax, active,
                                           interpret=True)
    hx, tx, _, _, px, _ = traverse_closest(bvh, ptris, o, d, tmax, active)
    np.testing.assert_array_equal(np.asarray(hl), np.asarray(hx))
    assert not np.asarray(hl)[~np.asarray(active)].any()
    m = np.asarray(hx)
    np.testing.assert_allclose(np.asarray(tl)[m], np.asarray(tx)[m],
                               rtol=1e-5, atol=1e-6)


def test_lane_stack_queue_bounds():
    """Static sanity on the sublane slices: queue capacity leaves headroom
    for one full-width round and the stack covers the max wide depth."""
    from rtjax.constants import BVH_MAX_DEPTH
    assert LQUEUE >= 16  # one 16-wide round's worst-case appends
    assert LSTACK > BVH_MAX_DEPTH
    assert SUBLANES * LSTACK * 4 + SUBLANES * LQUEUE * 4 < (16 << 10)
