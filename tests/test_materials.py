"""Material model tests: sampling distributions, energy, reference parity."""

import jax.numpy as jnp
import numpy as np

from rtjax.core import vec
from rtjax.scene.material import (GLASS, MATTE, MIRROR, get_f, is_specular,
                                  sample_f)


def _consts(n, mtype, albedo=(0.7, 0.5, 0.3), ior=1.5):
    return (jnp.full(n, mtype, jnp.int32),
            jnp.tile(jnp.asarray([albedo], jnp.float32), (n, 1)),
            jnp.full(n, ior, jnp.float32))


def _uniforms(rng, n):
    return tuple(jnp.asarray(rng.uniform(size=n).astype(np.float32))
                 for _ in range(3))


def test_matte_cosine_sampling(rng):
    n = 50000
    mt, alb, ior = _consts(n, MATTE)
    wo = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    u1, u2, u3 = _uniforms(rng, n)
    f, wi, pdf, n_out = sample_f(mt, alb, ior, wo, nrm, u1, u2, u3)
    wi = np.asarray(wi)
    cos = wi[:, 1]
    assert (cos > -1e-6).all()           # upper hemisphere
    # cosine-weighted: E[cos] = 2/3
    np.testing.assert_allclose(cos.mean(), 2 / 3, atol=0.01)
    # pdf = cos/pi, f = albedo/pi -> weight f*cos/pdf = albedo
    w = np.asarray(f) * cos[:, None] / np.asarray(pdf)[:, None]
    np.testing.assert_allclose(w.mean(0), [0.7, 0.5, 0.3], atol=0.01)
    # normal not flipped (wo opposes n already)
    np.testing.assert_allclose(np.asarray(n_out), np.asarray(nrm), atol=1e-6)


def test_matte_normal_flip():
    # when wo is on the same side as n, n must flip (material.cuh:63)
    mt, alb, ior = _consts(1, MATTE)
    wo = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    nrm = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    _, wi, _, n_out = sample_f(mt, alb, ior, wo, nrm,
                               jnp.asarray([0.3]), jnp.asarray([0.6]),
                               jnp.asarray([0.1]))
    assert float(n_out[0, 1]) == -1.0
    assert float(wi[0, 1]) < 0  # scattered into the flipped hemisphere


def test_mirror_exact_reflection():
    mt, alb, ior = _consts(1, MIRROR, albedo=(0.8, 0.9, 1.0))
    wo = vec.normalize(jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32))
    nrm = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    f, wi, pdf, n_out = sample_f(mt, alb, ior, wo, nrm,
                                 jnp.asarray([0.5]), jnp.asarray([0.5]),
                                 jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(wi)[0],
                               np.asarray(vec.normalize(
                                   jnp.asarray([[1.0, 1.0, 0.0]])))[0],
                               atol=1e-6)
    assert float(pdf[0]) == 1.0
    # f = albedo / cos -> f*cos = albedo
    cos = float(vec.dot(wi, n_out)[0])
    np.testing.assert_allclose(np.asarray(f)[0] * cos, [0.8, 0.9, 1.0],
                               rtol=1e-5)


def test_glass_normal_incidence_schlick(rng):
    # at normal incidence reflect fraction ~ r0 = ((1-ior)/(1+ior))^2
    n = 100000
    mt, alb, ior = _consts(n, GLASS, ior=1.5)
    wo = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    u1, u2, u3 = _uniforms(rng, n)
    _, wi, _, _ = sample_f(mt, alb, ior, wo, nrm, u1, u2, u3)
    frac_reflect = float((np.asarray(wi)[:, 1] > 0).mean())
    r0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    np.testing.assert_allclose(frac_reflect, r0, atol=0.005)


def test_glass_energy_unitary(rng):
    # E[f*cos/pdf] per sample: reflect -> 1, refract -> eta^2 (radiance
    # compression entering denser medium); check both branch weights
    n = 20000
    mt, alb, ior = _consts(n, GLASS, ior=1.5)
    wo = vec.normalize(jnp.tile(jnp.asarray([[0.5, -1.0, 0.1]], jnp.float32),
                                (n, 1)))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    u1, u2, u3 = _uniforms(rng, n)
    f, wi, pdf, n_out = sample_f(mt, alb, ior, wo, nrm, u1, u2, u3)
    w = np.asarray(f)[:, 0] * np.sum(np.asarray(wi) * np.asarray(n_out), -1) \
        / np.asarray(pdf)
    refl = np.asarray(wi)[:, 1] > 0
    np.testing.assert_allclose(w[refl], 1.0, rtol=1e-4)
    np.testing.assert_allclose(w[~refl], (1 / 1.5) ** 2, rtol=1e-4)


def test_glass_total_internal_reflection():
    # from inside the glass at grazing angle: must reflect (material.cuh:81-87)
    mt, alb, ior = _consts(1, GLASS, ior=1.5)
    wo = vec.normalize(jnp.asarray([[1.0, 0.2, 0.0]], jnp.float32))  # exiting
    nrm = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    f, wi, pdf, n_out = sample_f(mt, alb, ior, wo, nrm,
                                 jnp.asarray([0.5]), jnp.asarray([0.5]),
                                 jnp.asarray([0.99]))
    # TIR: pdf == 1 and direction mirrored about -n (the inside face)
    assert float(pdf[0]) == 1.0
    assert float(wi[0, 1]) < 0


def test_glass_refraction_flips_normal_to_transmission_side():
    mt, alb, ior = _consts(1, GLASS, ior=1.5)
    wo = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    nrm = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    # u3 > reflectance at normal incidence (0.04) -> refract
    _, wi, _, n_out = sample_f(mt, alb, ior, wo, nrm,
                               jnp.asarray([0.5]), jnp.asarray([0.5]),
                               jnp.asarray([0.9]))
    assert float(wi[0, 1]) < 0      # transmitted downward
    assert float(n_out[0, 1]) < 0   # normal flipped to transmission side


def test_get_f_matte_only_and_hemisphere():
    wo = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    nrm = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    wi = vec.normalize(jnp.asarray([[0.3, 1.0, 0.0]], jnp.float32))
    for mtype, expect in ((MATTE, True), (MIRROR, False), (GLASS, False)):
        mt, alb, ior = _consts(1, mtype)
        ok, f, pdf = get_f(mt, alb, wo, wi, nrm)
        assert bool(ok[0]) == expect
    # below the surface: invalid even for matte
    wi_dn = vec.normalize(jnp.asarray([[0.3, -1.0, 0.0]], jnp.float32))
    mt, alb, ior = _consts(1, MATTE)
    ok, _, _ = get_f(mt, alb, wo, wi_dn, nrm)
    assert not bool(ok[0])


def test_is_specular():
    assert not bool(is_specular(jnp.int32(MATTE)))
    assert bool(is_specular(jnp.int32(MIRROR)))
    assert bool(is_specular(jnp.int32(GLASS)))
