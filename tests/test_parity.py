"""Reference-parity mode: RenderConfig(reference_parity=True) replicates the
reference's three estimator-visible quirks so its output expectation matches
the CUDA binary's (render.cuh:236 CH-MIS own-triangle target, render.cuh:
117-119 Russian-roulette re-roll limbo, utility.cuh:53 int-truncated
power_heuristic)."""

import dataclasses

import jax
import numpy as np
import pytest

from rtjax import Camera, RenderConfig, SceneBuilder
from rtjax.render import render_frame


def _floor_builder():
    sb = SceneBuilder()
    m = sb.make_matte((0.7, 0.7, 0.7))
    sb.add_triangles([(-2, 0, -2), (2, 0, -2)], [(2, 0, -2), (2, 0, 2)],
                     [(-2, 0, 2), (-2, 0, 2)], m)
    return sb, m


def _cam():
    return Camera.make((0, 1.2, 3), (0, 0.2, 0), (0, 1, 0), 45.0, 1.0)


def test_parity_noop_without_quirk_paths():
    """Delta light + bounces below RR start: none of the three quirks can
    fire (AH weight is 1 for delta lights, no CH channel, no RR), so parity
    mode must be BITWISE identical to the fixed estimator."""
    sb, _ = _floor_builder()
    sb.add_point_light((0, 2, 0), (10.0, 10.0, 10.0))
    scene = sb.build()
    cfg = RenderConfig(width=24, height=24, num_samples=8, max_bounces=3,
                       num_working_paths=1 << 11)
    key = jax.random.PRNGKey(3)
    fb_fixed, _ = render_frame(scene, _cam(), cfg, key)
    fb_parity, _ = render_frame(
        scene, _cam(), dataclasses.replace(cfg, reference_parity=True), key)
    np.testing.assert_array_equal(np.asarray(fb_fixed), np.asarray(fb_parity))


@pytest.mark.slow
def test_parity_matte_area_light_agrees_in_mean():
    """For matte surfaces the reference's two MIS bugs nearly cancel: the
    truncated scattering pdf (cos/pi < 1 -> int 0) gives the NEE channel
    weight 1 while the own-triangle-targeted BSDF channel contributes ~0 —
    i.e. plain NEE, which is also unbiased.  Means must agree to noise."""
    sb, m = _floor_builder()
    sb.add_area_light((-0.5, 1.5, -0.5), (0.5, 1.5, -0.5), (0, 1.5, 0.5),
                      (8.0, 8.0, 8.0), m)
    scene = sb.build()
    cfg = RenderConfig(width=24, height=24, num_samples=64, max_bounces=3,
                       num_working_paths=1 << 12)
    key = jax.random.PRNGKey(3)
    fb_fixed, _ = render_frame(scene, _cam(), cfg, key)
    fb_parity, _ = render_frame(
        scene, _cam(), dataclasses.replace(cfg, reference_parity=True), key)
    mf = float(np.asarray(fb_fixed).mean())
    mp = float(np.asarray(fb_parity).mean())
    assert abs(mf - mp) / mf < 0.03


@pytest.mark.slow
def test_parity_mirror_loses_specular_light_reflection():
    """A mirror floor reflecting an area light gets that reflection ONLY via
    the BSDF-sampling channel (specular get_f returns false, material.cuh:
    47-57).  With the own-triangle target bug, the reference loses it: the
    parity image must be strictly darker in the reflection."""
    sb = SceneBuilder()
    mi = sb.make_mirror((0.9, 0.9, 0.9))
    sb.add_triangles([(-2, 0, -2), (2, 0, -2)], [(2, 0, -2), (2, 0, 2)],
                     [(-2, 0, 2), (-2, 0, 2)], mi)
    sb.add_area_light((-0.5, 1.5, -0.5), (0.5, 1.5, -0.5), (0, 1.5, 0.5),
                      (8.0, 8.0, 8.0), mi)
    scene = sb.build()
    cfg = RenderConfig(width=32, height=32, num_samples=32, max_bounces=3,
                       num_working_paths=1 << 12)
    key = jax.random.PRNGKey(5)
    fb_fixed, _ = render_frame(scene, _cam(), cfg, key)
    fb_parity, _ = render_frame(
        scene, _cam(), dataclasses.replace(cfg, reference_parity=True), key)
    mf = float(np.asarray(fb_fixed).mean())
    mp = float(np.asarray(fb_parity).mean())
    assert mp < 0.6 * mf, (mf, mp)


def test_parity_rr_limbo_terminates_and_is_biased_up():
    """The RR re-roll limbo keeps killed paths alive for later re-rolls —
    survivors still get the 1/(1-p) boost, so termination probability is
    effectively lowered without compensation: an upward bias on deep
    bounces.  The render must terminate (limbo paths die at max_bounces)
    and stay finite."""
    sb, m = _floor_builder()
    sb.add_area_light((-0.5, 1.5, -0.5), (0.5, 1.5, -0.5), (0, 1.5, 0.5),
                      (8.0, 8.0, 8.0), m)
    scene = sb.build()
    cfg = RenderConfig(width=16, height=16, num_samples=16, max_bounces=10,
                       num_working_paths=1 << 11, reference_parity=True)
    fb, stats = render_frame(scene, _cam(), cfg, jax.random.PRNGKey(7))
    fb = np.asarray(fb)
    assert np.isfinite(fb).all()
    assert fb.mean() > 0
    assert int(stats["iterations"]) >= 1
