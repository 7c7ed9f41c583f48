"""Randomized-scene golden test + self-intersection property.

Irregular geometry exercises traversal + shading integration beyond the
axis-aligned Cornell walls of the other golden tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rtjax import Camera, RenderConfig, SceneBuilder
from rtjax.core.geometry import Triangles, intersect_triangle
from rtjax.core.sampling import offset_ray_origin
from rtjax.render import render_frame
from rtjax.utils.compare import mse

from conftest import random_triangles
from oracle import oracle_scene_from_builder, render_oracle_image


def test_random_soup_matches_oracle(rng):
    n_tris = 40
    p0, p1, p2 = random_triangles(rng, n_tris, lo=-0.8, hi=0.8, size=0.5)
    albedo = rng.uniform(0.2, 0.8, (n_tris, 3))

    b = SceneBuilder()
    o_p0, o_p1, o_p2, o_alb, o_mt, o_ior, o_emit = [], [], [], [], [], [], []
    for i in range(n_tris):
        m = b.make_matte(tuple(albedo[i]))
        b.add_triangles(p0[i], p1[i], p2[i], m)
        o_p0.append(p0[i]); o_p1.append(p1[i]); o_p2.append(p2[i])
        o_alb.append(albedo[i]); o_mt.append(0); o_ior.append(1.0)
        o_emit.append((0, 0, 0))
    # big overhead light
    lt = ((-2, 2.5, 2), (2, 2.5, 2), (0, 2.5, -2))
    w = b.make_matte((0.5, 0.5, 0.5))
    b.add_area_light(*lt, (6.0, 6.0, 6.0), w)
    o_p0.append(lt[0]); o_p1.append(lt[1]); o_p2.append(lt[2])
    o_alb.append((0.5, 0.5, 0.5)); o_mt.append(0); o_ior.append(1.0)
    o_emit.append((6.0, 6.0, 6.0))
    scene = b.build()
    osc = oracle_scene_from_builder(o_p0, o_p1, o_p2, o_alb, o_mt, o_ior,
                                    o_emit)

    cam = Camera.make((0, 0.6, 3.2), (0, 0, 0), (0, 1, 0), 45, 1.0)
    w_px = h_px = 24
    img_o = render_oracle_image(osc, cam, w_px, h_px, 700, 3, seed=9)
    cfg = RenderConfig(width=w_px, height=h_px, num_samples=96, max_bounces=3,
                       num_working_paths=4096)
    fb, stats = render_frame(scene, cam, cfg, jax.random.key(7))
    img_r = np.asarray(fb).reshape(h_px, w_px, 3)

    assert abs(img_o.mean() - img_r.mean()) < 0.02
    assert mse(img_o, img_r) < 0.006
    assert 0.0 < float(np.asarray(stats["avg_occupancy"])) <= 1.0


def test_offset_ray_never_self_hits(rng):
    # spawn rays FROM random triangle surfaces with the Wachter-Binder
    # offset: the source triangle must never be re-hit at its own surface
    p0, p1, p2 = random_triangles(rng, 200, lo=-50, hi=50, size=20)
    tris = Triangles.from_vertices(p0, p1, p2)
    u = rng.uniform(0.05, 0.6, 200).astype(np.float32)
    v = (rng.uniform(0.05, 0.9, 200) * (1 - u)).astype(np.float32)
    p = tris.point(jnp.asarray(u), jnp.asarray(v))
    n_unit = tris.n / jnp.linalg.norm(tris.n, axis=-1, keepdims=True)
    d = rng.standard_normal((200, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # direction on the same side as the (flipped-to-match) normal
    side = np.sign(np.sum(d * np.asarray(n_unit), -1, keepdims=True))
    n_out = jnp.asarray(np.asarray(n_unit) * side)
    o = offset_ray_origin(p, n_out)
    hit, t, _, _ = intersect_triangle(o, jnp.asarray(d), jnp.inf,
                                      tris.p0, tris.e1, tris.e2, tris.n)
    assert not bool(np.asarray(hit).any()), "self-intersection not prevented"
