"""Unit tests for the L0/L1 math layers (SURVEY.md §4 'unit' bucket)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtjax.core import vec
from rtjax.core.sampling import (offset_ray_origin, power_heuristic,
                                 same_hemisphere, sample_triangle_barycentric,
                                 uniform_sample_disk, uniform_sample_sphere)


def test_vec_ops_match_numpy(rng):
    a = rng.standard_normal((64, 3)).astype(np.float32)
    b = rng.standard_normal((64, 3)).astype(np.float32)
    np.testing.assert_allclose(vec.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(vec.cross(a, b), np.cross(a, b), rtol=1e-4,
                               atol=1e-6)
    n = np.asarray(vec.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(vec.vmax(a), a.max(-1))


def test_reflect_properties(rng):
    v = np.asarray(vec.normalize(rng.standard_normal((32, 3)).astype(np.float32)))
    n = np.asarray(vec.normalize(rng.standard_normal((32, 3)).astype(np.float32)))
    r = np.asarray(vec.reflect(v, n))
    # |r| == |v| and angle preserved: dot(r, n) == -dot(v, n)
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.sum(r * n, -1), -np.sum(v * n, -1),
                               atol=1e-5)


def test_refract_snell(rng):
    # incident from vacuum into glass: check Snell's law
    eta_ratio = 1.0 / 1.5
    theta_i = rng.uniform(0.05, 1.2, 100).astype(np.float32)
    d = np.stack([np.sin(theta_i), -np.cos(theta_i), np.zeros_like(theta_i)],
                 axis=-1)
    n = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (100, 1))
    cos_theta = np.cos(theta_i)
    wt = np.asarray(vec.refract(d, n, eta_ratio, cos_theta))
    sin_t = np.abs(wt[:, 0])  # transmitted sine
    np.testing.assert_allclose(sin_t, eta_ratio * np.sin(theta_i), atol=1e-5)
    assert (wt[:, 1] < 0).all()  # continues into the surface


def test_power_heuristic_float_pdfs():
    # the reference truncates g_pdf to int (utility.cuh:53) — we must not
    w = float(power_heuristic(jnp.float32(1.0), jnp.float32(0.5)))
    assert abs(w - (1.0 / (1.0 + 0.25))) < 1e-6
    # degenerate: g = 0 -> weight 1
    assert float(power_heuristic(jnp.float32(2.0), jnp.float32(0.0))) == 1.0


def test_same_hemisphere_convention():
    # wo points INTO the surface (utility.cuh:58-60): wo and wi on opposite
    # sides of n means "same hemisphere" for shading purposes.
    n = jnp.array([0.0, 1.0, 0.0])
    wo = jnp.array([0.6, -0.8, 0.0])   # arriving downward
    wi_up = jnp.array([0.0, 1.0, 0.0])
    wi_down = jnp.array([0.0, -1.0, 0.0])
    assert bool(same_hemisphere(wo, wi_up, n))
    assert not bool(same_hemisphere(wo, wi_down, n))


def test_offset_ray_origin_moves_along_normal(rng):
    p = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
    n = np.asarray(vec.normalize(rng.standard_normal((256, 3)).astype(np.float32)))
    q = np.asarray(offset_ray_origin(jnp.asarray(p), jnp.asarray(n)))
    moved = q - p
    # offset is tiny but nonzero, and its sign follows the normal per axis
    assert (np.abs(moved) > 0).any(axis=-1).all()
    assert np.abs(moved).max() < 1e-2
    sgn_ok = (moved * n >= 0) | (np.abs(n) < 1e-3)
    assert sgn_ok.all()


def test_offset_ray_origin_near_zero_uses_fixed_step():
    p = jnp.array([[1e-4, -1e-4, 0.0]], jnp.float32)
    n = jnp.array([[1.0, 1.0, 1.0]], jnp.float32) / np.sqrt(3.0)
    q = np.asarray(offset_ray_origin(p, n))[0]
    expected = np.asarray(p)[0] + (1.0 / 65536.0) * np.asarray(n)[0]
    np.testing.assert_allclose(q, expected, rtol=1e-6)


def test_uniform_sample_sphere_statistics(rng):
    u1 = jnp.asarray(rng.uniform(size=20000).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=20000).astype(np.float32))
    d = np.asarray(uniform_sample_sphere(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(0)).max() < 0.02  # zero mean
    # each component variance of uniform sphere = 1/3
    np.testing.assert_allclose(d.var(0), 1.0 / 3.0, atol=0.02)


def test_uniform_sample_disk_statistics(rng):
    u1 = jnp.asarray(rng.uniform(size=20000).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=20000).astype(np.float32))
    x, y = uniform_sample_disk(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # uniform disk: E[r^2] = 1/2
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.01)


def test_sample_triangle_uniform(rng):
    u1 = jnp.asarray(rng.uniform(size=20000).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=20000).astype(np.float32))
    u, v = sample_triangle_barycentric(u1, u2)
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (v >= 0).all() and (u + v <= 1 + 1e-6).all()
    # uniform barycentric: E[u] = E[v] = 1/3
    np.testing.assert_allclose(u.mean(), 1 / 3, atol=0.01)
    np.testing.assert_allclose(v.mean(), 1 / 3, atol=0.01)
