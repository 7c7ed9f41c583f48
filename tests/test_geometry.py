"""Unit tests for triangle/AABB intersection and the scene host layer."""

import jax.numpy as jnp
import numpy as np

from rtjax.core.geometry import (Triangles, intersect_aabb,
                                 intersect_triangle, ray_slab_precompute)
from rtjax.scene.camera import Camera
from rtjax.scene.transform import Transform, rotate, scale, translate


def _tri(p0, p1, p2):
    return Triangles.from_vertices(np.array([p0], np.float32),
                                   np.array([p1], np.float32),
                                   np.array([p2], np.float32))


def test_triangle_storage_roundtrip():
    t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    np.testing.assert_allclose(np.asarray(t.p1())[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t.p2())[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(float(t.area()[0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t.center())[0],
                               [1 / 3, 1 / 3, 0], atol=1e-6)


def test_moeller_trumbore_hit_and_miss():
    t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    hit, tt, u, v = intersect_triangle(o, d, jnp.inf, t.p0, t.e1, t.e2, t.n)
    assert bool(hit[0])
    np.testing.assert_allclose(float(tt[0]), 1.0, rtol=1e-6)
    # reconstructed point equals the ray hit point
    p = np.asarray(t.point(u, v))[0]
    np.testing.assert_allclose(p, [0.2, 0.2, 0.0], atol=1e-6)

    # outside the triangle
    o2 = jnp.array([[0.9, 0.9, 1.0]], jnp.float32)
    hit2, *_ = intersect_triangle(o2, d, jnp.inf, t.p0, t.e1, t.e2, t.n)
    assert not bool(hit2[0])

    # behind the origin
    d3 = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    hit3, *_ = intersect_triangle(o, d3, jnp.inf, t.p0, t.e1, t.e2, t.n)
    assert not bool(hit3[0])

    # tmax clipping
    hit4, *_ = intersect_triangle(o, d, jnp.float32(0.5), t.p0, t.e1, t.e2, t.n)
    assert not bool(hit4[0])


def test_triangle_point_uses_reference_parameterization():
    # p(u, v) = p0 - u*e1 + v*e2 (triangle.cuh:15)
    t = _tri([1, 2, 3], [2, 2, 3], [1, 5, 3])
    p = np.asarray(t.point(jnp.array([1.0]), jnp.array([0.0])))[0]
    np.testing.assert_allclose(p, [2, 2, 3], atol=1e-6)  # u=1 -> p1
    p = np.asarray(t.point(jnp.array([0.0]), jnp.array([1.0])))[0]
    np.testing.assert_allclose(p, [1, 5, 3], atol=1e-6)  # v=1 -> p2


def test_slab_test_basic():
    o = jnp.array([[-2.0, 0.5, 0.5]], jnp.float32)
    d = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
    inv, sc, neg = ray_slab_precompute(d, o)
    bmin = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    bmax = jnp.array([[1.0, 1.0, 1.0]], jnp.float32)
    ok, entry = intersect_aabb(inv, sc, neg, bmin, bmax)
    assert bool(ok[0])
    np.testing.assert_allclose(float(entry[0]), 2.0, rtol=1e-6)

    # ray pointing away still reports overlap (reference semantics: the slab
    # test is over the infinite line, aabb_intersector.cuh:24-36).  NB use
    # +0.0 components: negative zeros flip the epsilon clamp's sign exactly
    # like copysignf does in the reference.
    d2 = jnp.array([[-1.0, 0.0, 0.0]], jnp.float32)
    inv2, sc2, neg2 = ray_slab_precompute(d2, o)
    ok2, entry2 = intersect_aabb(inv2, sc2, neg2, bmin, bmax)
    assert bool(ok2[0]) and float(entry2[0]) < 0

    # parallel ray outside the slab must miss (epsilon-clamped inverse)
    o3 = jnp.array([[-2.0, 2.0, 0.5]], jnp.float32)
    d3 = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
    inv3, sc3, neg3 = ray_slab_precompute(d3, o3)
    ok3, _ = intersect_aabb(inv3, sc3, neg3, bmin, bmax)
    assert not bool(ok3[0])


def test_transform_chain_matches_reference_composition():
    # main.cu:68-71: translate, then scale, then translate (left-multiplied)
    t = Transform(translate(0.0946899, -0.0329874, -0.0587997))
    t.composite(scale(2.0, 2.0, 2.0))
    t.composite(translate(0.3, 0.0, -0.5))
    v = np.array([[0.1, 0.2, 0.3]])
    out = t.apply(v)[0]
    step1 = np.array([0.1, 0.2, 0.3]) + [0.0946899, -0.0329874, -0.0587997]
    step2 = step1 * 2.0
    step3 = step2 + [0.3, 0.0, -0.5]
    np.testing.assert_allclose(out, step3, rtol=1e-12)


def test_rotate_matrix():
    m = rotate([0, 0, 1], np.pi / 2)
    v = Transform(m).apply(np.array([[1.0, 0.0, 0.0]]))[0]
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-12)


def test_camera_matches_reference_geometry():
    cam = Camera.make((0.5, 0.5, 1.5), (0.5, 0.5, 0.0), (0, 1, 0), 37.8, 1.0)
    # center ray points straight at lookat
    o, d = cam.get_rays(jnp.array([0.5]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(o)[0], [0.5, 0.5, 1.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, -1], atol=1e-6)
    # y grows DOWNWARD in image space (camera.cuh:27): y=0 looks up
    _, d_top = cam.get_rays(jnp.array([0.5]), jnp.array([0.0]))
    assert float(d_top[0, 1]) > 0
    _, d_bot = cam.get_rays(jnp.array([0.5]), jnp.array([1.0]))
    assert float(d_bot[0, 1]) < 0
    # vfov: the half-height at the image plane is tan(vfov/2)
    half = np.tan(np.radians(37.8) / 2)
    expect = np.array([0.0, half, -1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(d_top)[0], expect, atol=1e-5)
