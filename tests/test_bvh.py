"""BVH builder invariants + traversal-vs-brute-force property tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtjax.accel import build_bvh_np, validate
from rtjax.core.geometry import Triangles
from rtjax.kernels import (anyhit_brute, closest_brute, traverse_anyhit,
                           traverse_closest)

from conftest import random_triangles


def _soup(rng, n):
    p0, p1, p2 = random_triangles(rng, n)
    tris = Triangles.from_vertices(p0, p1, p2)
    bmin, bmax = (np.asarray(b) for b in tris.bounds())
    centers = np.asarray(tris.center())
    return tris, bmin, bmax, centers


@pytest.mark.parametrize("n,max_leaf", [(1, None), (2, None), (17, None),
                                        (256, None), (256, 4), (1000, 4)])
def test_builder_invariants(rng, n, max_leaf):
    _, bmin, bmax, centers = _soup(rng, n)
    res = build_bvh_np(bmin, bmax, centers, max_leaf_size=max_leaf)
    validate(res, bmin, bmax)
    assert res.num_nodes <= 2 * n
    assert sorted(res.perm.tolist()) == list(range(n))
    if max_leaf is not None:
        leaves = res.num_prims[:res.num_nodes]
        # depth-capped leaves may exceed max_leaf; with n=1000, depth 30
        # is never reached, so the bound must hold everywhere
        assert leaves.max() <= max_leaf


def test_builder_single_leaf_root(rng):
    _, bmin, bmax, centers = _soup(rng, 1)
    res = build_bvh_np(bmin, bmax, centers)
    assert res.num_nodes == 1
    assert res.num_prims[0] == 1


def _permuted(tris, perm):
    return Triangles(p0=tris.p0[perm], e1=tris.e1[perm], e2=tris.e2[perm],
                     n=tris.n[perm])


@pytest.mark.parametrize("n_tris,max_leaf", [(64, None), (64, 4), (517, 4)])
def test_traversal_matches_brute_force(rng, n_tris, max_leaf):
    tris, bmin, bmax, centers = _soup(rng, n_tris)
    res = build_bvh_np(bmin, bmax, centers, max_leaf_size=max_leaf)
    validate(res, bmin, bmax)
    ptris = _permuted(tris, res.perm)
    bvh = res.to_device()

    n_rays = 256
    o = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32))
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full(n_rays, jnp.inf)
    active = jnp.ones(n_rays, bool)

    hit_b, t_b, u_b, v_b, prim_b, n_b = closest_brute(ptris, o, d, tmax,
                                                      active)
    hit_t, t_t, u_t, v_t, prim_t, n_t = traverse_closest(bvh, ptris, o, d,
                                                         tmax, active)

    np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_t))
    h = np.asarray(hit_b)
    np.testing.assert_allclose(np.asarray(t_b)[h], np.asarray(t_t)[h],
                               rtol=1e-5)
    # prim ids may differ only for exactly-equal t (coplanar overlap): check
    # hit points match instead of ids
    tb = ptris.gather(jnp.maximum(prim_b, 0))
    tt = ptris.gather(jnp.maximum(prim_t, 0))
    pb = np.asarray(tb.point(u_b, v_b))[h]
    pt = np.asarray(tt.point(u_t, v_t))[h]
    np.testing.assert_allclose(pb, pt, atol=1e-4)


def test_anyhit_matches_brute_force(rng):
    tris, bmin, bmax, centers = _soup(rng, 128)
    res = build_bvh_np(bmin, bmax, centers, max_leaf_size=4)
    ptris = _permuted(tris, res.perm)
    bvh = res.to_device()

    n_rays = 256
    o = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32))
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.asarray(rng.uniform(0.5, 4.0, n_rays).astype(np.float32))
    exclude = jnp.asarray(rng.integers(-1, 128, n_rays).astype(np.int32))
    active = jnp.ones(n_rays, bool)

    occ_b = anyhit_brute(ptris, o, d, tmax, exclude, active)
    occ_t = traverse_anyhit(bvh, ptris, o, d, tmax, exclude, active)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_t))


def test_anyhit_implies_closest_hit(rng):
    tris, bmin, bmax, centers = _soup(rng, 128)
    res = build_bvh_np(bmin, bmax, centers, max_leaf_size=4)
    ptris = _permuted(tris, res.perm)
    bvh = res.to_device()

    n_rays = 128
    o = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32))
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full(n_rays, jnp.inf)
    active = jnp.ones(n_rays, bool)
    no_exclude = jnp.full(n_rays, -1, jnp.int32)

    hit, *_ = traverse_closest(bvh, ptris, o, d, tmax, active)
    occ = traverse_anyhit(bvh, ptris, o, d, tmax, no_exclude, active)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(occ))


def test_inactive_lanes_return_miss(rng):
    tris, bmin, bmax, centers = _soup(rng, 32)
    res = build_bvh_np(bmin, bmax, centers, max_leaf_size=4)
    ptris = _permuted(tris, res.perm)
    bvh = res.to_device()
    o = jnp.zeros((8, 3)); d = jnp.tile(jnp.array([[0., 0., 1.]]), (8, 1))
    hit, *_ = traverse_closest(bvh, ptris, o, d, jnp.full(8, jnp.inf),
                               jnp.zeros(8, bool))
    assert not np.asarray(hit).any()
