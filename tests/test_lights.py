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


def test_many_light_gather_matches_select(rng):
    # >SELECT_LIMIT lights flips gather_light_v3 to the packed one-row-gather
    # path; it must agree exactly with naive per-column indexing
    import jax
    from rtjax.scene.light import gather_light_v3

    L, N = 64, 503
    r = np.random.default_rng(11)
    p0 = r.uniform(-2, 2, (L, 3)).astype(np.float32)
    p1 = p0 + r.uniform(0.1, 1, (L, 3)).astype(np.float32)
    p2 = p0 + r.uniform(0.1, 1, (L, 3)).astype(np.float32)
    tris = Triangles.from_vertices(p0, p1, p2)
    ltype = [AREA_LIGHT if i % 3 else POINT_LIGHT for i in range(L)]
    tri = [i if i % 3 else INVALID_INDEX for i in range(L)]
    lights = make_light_table(ltype, r.uniform(-3, 3, (L, 3)),
                              r.uniform(0, 20, (L, 3)), tri, tris)
    pick = jnp.asarray(r.integers(0, L, N), jnp.int32)
    out = jax.jit(gather_light_v3)(lights, pick)
    got_ltype, got_pos, got_emit, got_tri = out[0], out[1], out[2], out[3]
    idx = np.asarray(pick)
    np.testing.assert_array_equal(np.asarray(got_ltype),
                                  np.asarray(lights.ltype)[idx])
    np.testing.assert_array_equal(np.asarray(got_tri),
                                  np.asarray(lights.tri)[idx])
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(got_pos[k]),
                                      np.asarray(lights.pos)[idx, k])
        np.testing.assert_array_equal(np.asarray(got_emit[k]),
                                      np.asarray(lights.emit)[idx, k])
    for field, trip in zip(("tri_p0", "tri_e1", "tri_e2", "tri_n"),
                           out[4:8]):
        tab = np.asarray(getattr(lights, field))
        for k in range(3):
            np.testing.assert_array_equal(np.asarray(trip[k]), tab[idx, k])


def test_many_light_render_matches_single_panel():
    # a ceiling panel split into an 8x8 grid of 64 area lights must render
    # (statistically) the same image as the single big panel: NEE's uniform
    # 1/64 pick cancels against each sub-light's 64x-larger area pdf.
    # Exercises the many-light engine path end to end (SURVEY §5 scaling).
    import jax
    from rtjax import Camera, RenderConfig, SceneBuilder
    from rtjax.render import render_frame

    def build(split):
        b = SceneBuilder()
        white = b.make_matte((0.73, 0.73, 0.73))
        b.add_triangles([-2, 0, 2], [2, 0, 2], [2, 0, -2], white)
        b.add_triangles([-2, 0, 2], [-2, 0, -2], [2, 0, -2], white)
        y, rad = 1.999, (8.0, 8.0, 8.0)
        lo, hi = -0.4, 0.4
        k = 8 if split else 1
        step = (hi - lo) / k
        for i in range(k):
            for j in range(k):
                x0, z0 = lo + i * step, lo + j * step
                b.add_area_light((x0, y, z0), (x0 + step, y, z0),
                                 (x0 + step, y, z0 + step), rad, white)
        scene = b.build()
        cam = Camera.make((0, 1.0, 3.0), (0, 0.3, 0), (0, 1, 0), 40, 1.0)
        return scene, cam

    cfg = RenderConfig(width=24, height=24, num_samples=48, max_bounces=3,
                       num_working_paths=1 << 12)
    key = jax.random.PRNGKey(7)
    fb1, _ = render_frame(*build(False), cfg, key)
    fb64, _ = render_frame(*build(True), cfg, jax.random.PRNGKey(8))
    fb1, fb64 = np.asarray(fb1), np.asarray(fb64)
    assert np.isfinite(fb64).all()
    # same expectation, different variance: compare de-gamma'd means with a
    # noise-sized tolerance
    m1, m64 = (fb1 ** 2).mean(), (fb64 ** 2).mean()
    assert abs(m1 - m64) / m1 < 0.05, (m1, m64)
