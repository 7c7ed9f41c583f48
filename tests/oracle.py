"""Slow, trivially-correct NumPy path tracer — the golden-image oracle.

Estimates the same radiance integral as the wavefront engine but with a
deliberately different estimator (pure BSDF sampling, emission added at every
path vertex, brute-force all-triangles intersection, epsilon ray offsets,
NumPy RNG).  Agreement between the two renders therefore validates the whole
light-transport stack, not just reimplementation of identical code
(SURVEY.md §4 'integration' bucket).
"""

from __future__ import annotations

import dataclasses

import numpy as np

MATTE, MIRROR, GLASS = 0, 1, 2


@dataclasses.dataclass
class OracleScene:
    p0: np.ndarray      # [T, 3]
    p1: np.ndarray
    p2: np.ndarray
    albedo: np.ndarray  # [T, 3]
    mtype: np.ndarray   # [T]
    ior: np.ndarray     # [T]
    emit: np.ndarray    # [T, 3] radiance (0 = non-emissive)


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _brute(sc: OracleScene, o, d):
    """Closest hit over all triangles. o,d: [R,3] -> hit, t, point, tri."""
    e1 = sc.p0 - sc.p1
    e2 = sc.p2 - sc.p0
    n = np.cross(e1, e2)
    c = sc.p0[None] - o[:, None]                    # [R,T,3]
    r = np.cross(d[:, None], c)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_det = 1.0 / np.einsum("rj,tj->rt", d, n)
        u = inv_det * np.einsum("tj,rtj->rt", e2, r)
        v = inv_det * np.einsum("tj,rtj->rt", e1, r)
        t = inv_det * np.einsum("rtj,tj->rt", c, n)
    ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-5)
    t = np.where(ok, t, np.inf)
    idx = np.argmin(t, axis=1)
    tbest = t[np.arange(len(o)), idx]
    hit = np.isfinite(tbest)
    point = o + d * np.where(hit, tbest, 0.0)[:, None]
    return hit, tbest, point, idx


def render_oracle(sc: OracleScene, origin, direction, max_bounces: int,
                  seed: int = 123) -> np.ndarray:
    """Trace [R] rays, return per-ray radiance [R, 3]."""
    rng = np.random.default_rng(seed)
    r = len(origin)
    o = origin.astype(np.float64).copy()
    d = _unit(direction.astype(np.float64))
    radiance = np.zeros((r, 3))
    beta = np.ones((r, 3))
    alive = np.ones(r, bool)

    e1 = sc.p0 - sc.p1
    e2 = sc.p2 - sc.p0
    nrm = np.cross(e1, e2)

    for bounce in range(max_bounces + 1):
        if not alive.any():
            break
        hit, t, p, idx = _brute(sc, o[alive], d[alive])
        # double-sided emission at every vertex (pure BSDF estimator)
        gather = np.where(alive)[0]
        hit_ids = gather[hit]
        radiance[hit_ids] += beta[hit_ids] * sc.emit[idx[hit]]
        alive[gather[~hit]] = False
        if bounce == max_bounces:
            break

        hi = idx[hit]
        n_g = -_unit(nrm[hi])
        wo = d[hit_ids]
        n_opp = np.where(np.sum(wo * n_g, -1, keepdims=True) > 0, -n_g, n_g)
        mt = sc.mtype[hi]

        wi = np.zeros_like(wo)
        scale = np.ones((len(hi), 3))
        offs_n = n_opp.copy()

        m = mt == MATTE
        if m.any():
            z = 1 - 2 * rng.random(m.sum())
            rr = np.sqrt(np.maximum(1 - z * z, 0))
            phi = 2 * np.pi * rng.random(m.sum())
            sph = np.stack([rr * np.cos(phi), rr * np.sin(phi), z], -1)
            wi[m] = _unit(n_opp[m] + sph)
            scale[m] = sc.albedo[hi][m]          # f*cos/pdf = albedo
        m = mt == MIRROR
        if m.any():
            wi[m] = wo[m] - 2 * np.sum(wo[m] * n_opp[m], -1, keepdims=True) \
                * n_opp[m]
            scale[m] = sc.albedo[hi][m]
        m = mt == GLASS
        if m.any():
            wog, ng = wo[m], n_g[m]
            cos = np.sum(wog * ng, -1)
            front = cos < 0
            cos = np.abs(cos)
            ior = sc.ior[hi][m]
            eta = np.where(front, 1 / ior, ior)
            sin = np.sqrt(np.maximum(1 - cos ** 2, 0))
            tir = eta * sin > 1
            r0 = ((1 - ior) / (1 + ior)) ** 2
            refl_p = r0 + (1 - r0) * (1 - cos) ** 5
            do_refl = tir | (rng.random(m.sum()) < refl_p)
            nf = np.where(front[:, None], ng, -ng)
            wr = wog - 2 * np.sum(wog * nf, -1, keepdims=True) * nf
            par = eta[:, None] * (wog + cos[:, None] * nf)
            perp = -np.sqrt(np.maximum(1 - np.sum(par * par, -1), 0))[:, None] * nf
            wt = par + perp
            wi[m] = np.where(do_refl[:, None], wr, wt)
            # f*cos/pdf: reflect -> 1, refract -> eta^2
            scale[m] = np.where(do_refl[:, None], 1.0, eta[:, None] ** 2)
            offs_n[m] = np.where(do_refl[:, None], nf, -nf)

        beta[hit_ids] *= scale
        o[hit_ids] = p[hit] + 1e-4 * offs_n
        d[hit_ids] = wi

    return radiance


def render_oracle_image(sc: OracleScene, camera, width, height, spp,
                        max_bounces, seed=123) -> np.ndarray:
    """Render a [H, W, 3] linear-radiance image with jittered camera rays."""
    rng = np.random.default_rng(seed + 1)
    j, i = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    i = np.repeat(i.ravel(), spp).astype(np.float64)
    j = np.repeat(j.ravel(), spp).astype(np.float64)
    x = (i + rng.random(len(i))) / width
    y = (j + rng.random(len(j))) / height
    lookfrom = np.asarray(camera.lookfrom, np.float64)
    d = (np.asarray(camera.upper_left, np.float64)
         + x[:, None] * np.asarray(camera.horizontal, np.float64)
         + y[:, None] * np.asarray(camera.vertical, np.float64) - lookfrom)
    o = np.broadcast_to(lookfrom, d.shape).copy()

    rad = np.zeros((len(d), 3))
    chunk = 65536  # bound brute-force memory
    for s in range(0, len(d), chunk):
        rad[s:s + chunk] = render_oracle(sc, o[s:s + chunk], d[s:s + chunk],
                                         max_bounces, seed + s)
    img = rad.reshape(height, width, spp, 3).mean(axis=2)
    return np.sqrt(np.maximum(img, 0.0))  # gamma 2.0 like render.cuh:330-338


def oracle_scene_from_builder(p0, p1, p2, albedo, mtype, ior, emit):
    return OracleScene(p0=np.asarray(p0, np.float64),
                       p1=np.asarray(p1, np.float64),
                       p2=np.asarray(p2, np.float64),
                       albedo=np.asarray(albedo, np.float64),
                       mtype=np.asarray(mtype),
                       ior=np.asarray(ior, np.float64),
                       emit=np.asarray(emit, np.float64))
