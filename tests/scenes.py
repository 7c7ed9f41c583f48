"""Shared test scenes: matched (rtjax Scene, OracleScene) pairs."""

from __future__ import annotations

import numpy as np

from rtjax import Camera, SceneBuilder
from oracle import oracle_scene_from_builder

# Cornell-box walls from main.cu:88-107 (10 triangles): left red, right
# green, floor/ceiling/back white.
WALLS = [
    (((0, 0, 0), (0, 0, -1), (0, 1, -1)), "red"),
    (((0, 0, 0), (0, 1, 0), (0, 1, -1)), "red"),
    (((1, 0, 0), (1, 0, -1), (1, 1, -1)), "green"),
    (((1, 0, 0), (1, 1, 0), (1, 1, -1)), "green"),
    (((0, 0, 0), (1, 0, 0), (1, 0, -1)), "white"),
    (((0, 0, 0), (0, 0, -1), (1, 0, -1)), "white"),
    (((0, 1, 0), (1, 1, 0), (1, 1, -1)), "white"),
    (((0, 1, 0), (0, 1, -1), (1, 1, -1)), "white"),
    (((0, 0, -1), (1, 0, -1), (1, 1, -1)), "white"),
    (((0, 0, -1), (0, 1, -1), (1, 1, -1)), "white"),
]

COLORS = {
    "red": (0.65, 0.05, 0.05),
    "green": (0.12, 0.45, 0.15),
    "white": (0.73, 0.73, 0.73),
    "brown": (0.62, 0.57, 0.54),
}


def default_camera(aspect=1.0):
    """The reference demo camera (main.cu:162-166)."""
    return Camera.make((0.5, 0.5, 1.5), (0.5, 0.5, 0.0), (0, 1, 0), 37.8,
                       aspect)


def cornell(light_size=0.3, light_l=(8.0, 8.0, 8.0), extra=None,
            max_leaf_size=4):
    """Cornell box + square ceiling light (+ optional extra triangles).

    ``extra``: list of ((p0, p1, p2), material_name_or_("glass", ior)).
    Returns (Scene, OracleScene).
    """
    b = SceneBuilder()
    mats = {name: b.make_matte(c) for name, c in COLORS.items()}
    mats["mirror"] = b.make_mirror((0.9, 0.9, 0.9))

    o_p0, o_p1, o_p2, o_alb, o_mt, o_ior, o_emit = [], [], [], [], [], [], []

    def track(p0, p1, p2, albedo, mtype, ior, emit):
        o_p0.append(p0); o_p1.append(p1); o_p2.append(p2)
        o_alb.append(albedo); o_mt.append(mtype); o_ior.append(ior)
        o_emit.append(emit)

    for (p0, p1, p2), mat in WALLS:
        b.add_triangles(p0, p1, p2, mats[mat])
        track(p0, p1, p2, COLORS[mat], 0, 1.0, (0, 0, 0))

    for (p0, p1, p2), mat in (extra or []):
        if isinstance(mat, tuple) and mat[0] == "glass":
            mid = b.make_glass(mat[1])
            b.add_triangles(p0, p1, p2, mid)
            track(p0, p1, p2, (0, 0, 0), 2, mat[1], (0, 0, 0))
        elif mat == "mirror":
            b.add_triangles(p0, p1, p2, mats["mirror"])
            track(p0, p1, p2, (0.9, 0.9, 0.9), 1, 1.0, (0, 0, 0))
        else:
            b.add_triangles(p0, p1, p2, mats[mat])
            track(p0, p1, p2, COLORS[mat], 0, 1.0, (0, 0, 0))

    # square ceiling light (two tris around (0.5, 0.999, -0.5))
    h = light_size / 2
    lt1 = ((0.5 - h, 0.999, -0.5 + h), (0.5 + h, 0.999, -0.5 + h),
           (0.5 + h, 0.999, -0.5 - h))
    lt2 = ((0.5 - h, 0.999, -0.5 + h), (0.5 - h, 0.999, -0.5 - h),
           (0.5 + h, 0.999, -0.5 - h))
    for lt in (lt1, lt2):
        b.add_area_light(*lt, light_l, mats["white"])
        track(*lt, COLORS["white"], 0, 1.0, light_l)

    scene = b.build(max_leaf_size=max_leaf_size)
    osc = oracle_scene_from_builder(o_p0, o_p1, o_p2, o_alb, o_mt, o_ior,
                                    o_emit)
    return scene, osc


def two_tri_box_scene(total_spp=8):
    """Tiny standalone (scene, camera, cfg) for multi-process tests: a
    floor + area light, fast enough to render in seconds per CPU device."""
    from rtjax import RenderConfig

    b = SceneBuilder()
    white = b.make_matte(COLORS["white"])
    b.add_triangles([(-2, 0, -2), (2, 0, -2)], [(2, 0, -2), (2, 0, 2)],
                    [(-2, 0, 2), (-2, 0, 2)], white)
    b.add_area_light((-0.5, 1.5, -0.5), (0.5, 1.5, -0.5), (0, 1.5, 0.5),
                     (8.0, 8.0, 8.0), white)
    scene = b.build()
    cam = Camera.make((0, 1.2, 3), (0, 0.2, 0), (0, 1, 0), 45.0, 1.0)
    cfg = RenderConfig(width=24, height=24, num_samples=total_spp,
                       max_bounces=3, num_working_paths=1 << 11)
    return scene, cam, cfg
