"""Native C++ builder vs NumPy oracle: bit-identical outputs."""

import numpy as np
import pytest

from rtjax.accel import build_bvh_np, validate

from conftest import random_triangles

cpp = pytest.importorskip("rtjax.accel.builder_cpp")


@pytest.mark.parametrize("n", [1, 2, 77, 1500])
@pytest.mark.parametrize("kw", [dict(), dict(max_leaf_size=4),
                                dict(min_leaf_size=8, max_leaf_size=8)])
def test_cpp_matches_numpy_bitwise(rng, n, kw):
    p0, p1, p2 = random_triangles(rng, n)
    bmin = np.minimum(np.minimum(p0, p1), p2)
    bmax = np.maximum(np.maximum(p0, p1), p2)
    ctr = ((p0 + p1 + p2) / 3).astype(np.float32)

    a = build_bvh_np(bmin, bmax, ctr, **kw)
    b = cpp.build_bvh(bmin, bmax, ctr, **kw)

    assert a.num_nodes == b.num_nodes
    assert a.max_depth == b.max_depth
    np.testing.assert_array_equal(a.perm, b.perm)
    m = a.num_nodes
    np.testing.assert_array_equal(a.left_first[:m], b.left_first[:m])
    np.testing.assert_array_equal(a.num_prims[:m], b.num_prims[:m])
    np.testing.assert_array_equal(a.bmin[:m], b.bmin[:m])
    np.testing.assert_array_equal(a.bmax[:m], b.bmax[:m])
    validate(b, bmin, bmax)


def test_cpp_large_scene_fast(rng):
    # 200k triangles must build in seconds (native path requirement)
    import time
    p0, p1, p2 = random_triangles(rng, 200_000)
    bmin = np.minimum(np.minimum(p0, p1), p2)
    bmax = np.maximum(np.maximum(p0, p1), p2)
    t0 = time.time()
    res = cpp.build_bvh(bmin, bmax, min_leaf_size=8, max_leaf_size=8)
    dt = time.time() - t0
    assert res.num_nodes > 1
    assert dt < 30.0  # generous bound for slow CI hosts


@pytest.mark.parametrize("build", ["np", "cpp"])
def test_degenerate_scene_respects_max_leaf(build):
    # 300 coincident triangles force SAH 1|rest splits to the depth cap;
    # the builder must median-split past the cap rather than emit a leaf
    # larger than max_leaf_size (ADVICE r1)
    n = 300
    p0 = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (n, 1))
    p1 = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    p2 = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    bmin = np.minimum(np.minimum(p0, p1), p2)
    bmax = np.maximum(np.maximum(p0, p1), p2)
    ctr = ((p0 + p1 + p2) / 3).astype(np.float32)
    fn = build_bvh_np if build == "np" else cpp.build_bvh
    res = fn(bmin, bmax, ctr, max_depth=30, max_leaf_size=8, min_leaf_size=8)
    m = res.num_nodes
    leaf = res.num_prims[:m] > 0
    assert res.num_prims[:m][leaf].max() <= 8
    validate(res, bmin, bmax)

    # and the two builders still agree bit-for-bit on this path
    a = build_bvh_np(bmin, bmax, ctr, max_depth=30, max_leaf_size=8,
                     min_leaf_size=8)
    b = cpp.build_bvh(bmin, bmax, ctr, max_depth=30, max_leaf_size=8,
                      min_leaf_size=8)
    assert a.num_nodes == b.num_nodes
    np.testing.assert_array_equal(a.perm, b.perm)
    np.testing.assert_array_equal(a.num_prims[:m], b.num_prims[:m])
