"""Pallas packet traversal vs XLA traversal parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtjax.accel import build_bvh_np
from rtjax.core.geometry import Triangles
from rtjax.kernels import traverse_anyhit, traverse_closest
from rtjax.kernels.pallas_traversal import (build_scene_tables,
                                            pallas_traverse_anyhit,
                                            pallas_traverse_closest)

from conftest import random_triangles


@pytest.fixture(scope="module")
def packed_scene(rng=None):
    rng = np.random.default_rng(11)
    p0, p1, p2 = random_triangles(rng, 300)
    tris = Triangles.from_vertices(p0, p1, p2)
    bmin, bmax = (np.asarray(b) for b in tris.bounds())
    res = build_bvh_np(bmin, bmax, np.asarray(tris.center()), max_leaf_size=4)
    perm = res.perm
    ptris = Triangles(p0=tris.p0[perm], e1=tris.e1[perm], e2=tris.e2[perm],
                      n=tris.n[perm])
    tables = build_scene_tables(res, np.asarray(ptris.p0),
                                np.asarray(ptris.e1), np.asarray(ptris.e2),
                                np.asarray(ptris.n))
    return res, ptris, tables


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def test_pallas_closest_matches_xla(packed_scene):
    res, ptris, tables = packed_scene
    bvh = res.to_device()
    # one full tile (1024) + a ragged remainder to exercise padding
    n = 1024 + 200
    o, d = _rays(n)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.asarray(np.random.default_rng(5).random(n) > 0.1)

    hp, tp, up, vp, pp = pallas_traverse_closest(tables, o, d, tmax, active,
                                                 interpret=True)
    hx, tx, ux, vx, px, _ = traverse_closest(bvh, ptris, o, d, tmax, active)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hx))
    m = np.asarray(hp)
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(tx)[m],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pp)[m], np.asarray(px)[m])


def test_pallas_anyhit_matches_xla(packed_scene):
    res, ptris, tables = packed_scene
    bvh = res.to_device()
    n = 1024
    o, d = _rays(n, seed=7)
    rng = np.random.default_rng(9)
    tmax = jnp.asarray(rng.uniform(0.5, 4.0, n).astype(np.float32))
    exclude = jnp.asarray(rng.integers(-1, 300, n).astype(np.int32))
    active = jnp.ones(n, bool)

    op = pallas_traverse_anyhit(tables, o, d, tmax, exclude, active,
                                interpret=True)
    ox = traverse_anyhit(bvh, ptris, o, d, tmax, exclude, active)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ox))


def test_pallas_inactive_lanes_miss(packed_scene):
    _, _, tables = packed_scene
    n = 1024
    o, d = _rays(n)
    hit, *_ = pallas_traverse_closest(tables, o, d, jnp.full(n, jnp.inf),
                                      jnp.zeros(n, bool), interpret=True)
    assert not np.asarray(hit).any()
