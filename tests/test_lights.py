"""Light sampling tests: point falloff, area pdf consistency."""

import jax.numpy as jnp
import numpy as np

from rtjax.constants import INVALID_INDEX
from rtjax.core.geometry import Triangles
from rtjax.scene.light import (AREA_LIGHT, POINT_LIGHT, is_delta,
                               make_light_table, pdf_li, sample_li)


def _tris():
    # one unit right triangle in the z=2 plane
    return Triangles.from_vertices(
        np.array([[0, 0, 2.0]], np.float32),
        np.array([[1, 0, 2.0]], np.float32),
        np.array([[0, 1, 2.0]], np.float32))


def test_point_light_inverse_square():
    lights = make_light_table([POINT_LIGHT], [(0, 0, 3)], [(9, 9, 9)],
                              [INVALID_INDEX], _tris())
    p = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    pick = jnp.zeros(1, jnp.int32)
    wi, li, t, pdf, ltri = sample_li(lights, pick, p,
                                     jnp.asarray([0.5]), jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(wi)[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(li)[0], [1, 1, 1], rtol=1e-6)
    assert float(pdf[0]) == 1.0
    assert int(ltri[0]) == INVALID_INDEX
    assert bool(is_delta(lights.ltype)[0])
    # pdf_Li for a point light is 0 (light.cuh:51-52)
    assert float(pdf_li(lights, pick, p, wi)[0]) == 0.0


def test_area_light_sample_pdf_consistency(rng):
    # pdf returned by sample_Li must equal pdf_Li evaluated at the sampled
    # direction (same point/footprint), light.cuh:38-64
    lights = make_light_table([AREA_LIGHT], [(0, 0, 0)], [(5, 5, 5)], [0],
                              _tris())
    n = 4096
    p = jnp.asarray(np.tile([[0.2, 0.2, 0.0]], (n, 1)).astype(np.float32))
    pick = jnp.zeros(n, jnp.int32)
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    wi, li, t, pdf, ltri = sample_li(lights, pick, p, u1, u2)
    np.testing.assert_allclose(np.asarray(li), 5.0, rtol=1e-6)
    assert int(ltri[0]) == 0
    pdf2 = pdf_li(lights, pick, p, wi)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=2e-3)


def test_area_light_solid_angle_integral(rng):
    # MC estimate of the subtended solid angle: E[1/pdf] over samples
    lights = make_light_table([AREA_LIGHT], [(0, 0, 0)], [(1, 1, 1)], [0],
                              _tris())
    n = 200000
    p = jnp.asarray(np.tile([[1 / 3, 1 / 3, 0.0]], (n, 1)).astype(np.float32))
    pick = jnp.zeros(n, jnp.int32)
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    _, _, _, pdf, _ = sample_li(lights, pick, p, u1, u2)
    omega_mc = float((1.0 / np.asarray(pdf)).mean())
    # brute numeric integration of the solid angle on a fine grid
    g = 400
    gu, gv = np.meshgrid((np.arange(g) + 0.5) / g, (np.arange(g) + 0.5) / g)
    m = gu + gv <= 1.0
    # triangle points: p(u,v) = p0 - u*e1 + v*e2, e1 = p0-p1, e2 = p2-p0
    pts = (np.array([0, 0, 2.0]) -
           gu[m][:, None] * np.array([-1, 0, 0.0]) +
           gv[m][:, None] * np.array([0, 1, 0.0]))
    rel = pts - np.array([1 / 3, 1 / 3, 0.0])
    d2 = np.sum(rel ** 2, -1)
    cos = np.abs(rel[:, 2]) / np.sqrt(d2)
    da = 0.5 / m.sum()  # triangle area 0.5 split into equal cells
    omega_ref = float(np.sum(cos / d2) * da)
    np.testing.assert_allclose(omega_mc, omega_ref, rtol=0.01)


def test_mixed_light_table_batched_pick():
    lights = make_light_table([POINT_LIGHT, AREA_LIGHT],
                              [(0, 0, 3), (0, 0, 0)],
                              [(9, 9, 9), (5, 5, 5)], [INVALID_INDEX, 0],
                              _tris())
    p = jnp.zeros((2, 3), jnp.float32)
    pick = jnp.asarray([0, 1], jnp.int32)
    wi, li, t, pdf, ltri = sample_li(lights, pick, p,
                                     jnp.asarray([0.3, 0.3]),
                                     jnp.asarray([0.4, 0.4]))
    assert int(ltri[0]) == INVALID_INDEX and int(ltri[1]) == 0
    assert float(pdf[0]) == 1.0 and float(pdf[1]) > 0
    d = np.asarray(is_delta(lights.ltype[pick]))
    assert d[0] and not d[1]
