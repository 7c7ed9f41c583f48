"""Lights: SoA table + batched NEE sampling and pdf evaluation.

TPU-native equivalent of /root/reference/light.cuh.  The tagged-union struct
with a device triangle pointer becomes a SoA table whose area lights reference
scene triangles by (BVH-permuted) index; ``sample_Li`` / ``pdf_Li`` are
batched masked-select functions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import INVALID_INDEX
from ..core import vec
from ..core.geometry import Triangles, intersect_triangle
from ..core.sampling import sample_triangle_barycentric

POINT_LIGHT = 0
AREA_LIGHT = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LightTable:
    """SoA light parameters (light.cuh:20-26).

    ``emit`` holds I (point: radiant intensity) or L (area: radiance), the
    two union members.  ``tri`` is the global triangle index of an area
    light's emitter (INVALID_INDEX for point lights).
    """

    ltype: jax.Array  # [L] int32
    pos: jax.Array    # [L, 3] float32 (point)
    emit: jax.Array   # [L, 3] float32 (I or L)
    tri: jax.Array    # [L] int32 (area)

    @property
    def num(self) -> int:
        return self.ltype.shape[0]


def make_light_table(ltype, pos, emit, tri) -> LightTable:
    n = max(len(ltype), 1)
    a_type = np.zeros(n, np.int32)
    a_pos = np.zeros((n, 3), np.float32)
    a_emit = np.zeros((n, 3), np.float32)
    a_tri = np.full(n, INVALID_INDEX, np.int32)
    if len(ltype):
        a_type[:len(ltype)] = ltype
        a_pos[:len(ltype)] = pos
        a_emit[:len(ltype)] = emit
        a_tri[:len(ltype)] = tri
    return LightTable(ltype=jnp.asarray(a_type), pos=jnp.asarray(a_pos),
                      emit=jnp.asarray(a_emit), tri=jnp.asarray(a_tri))


def is_delta(ltype):
    """Point lights are delta lights (light.cuh:15)."""
    return ltype == POINT_LIGHT


def sample_li(lights: LightTable, tris: Triangles, pick, isect_p, u1, u2):
    """Batched ``Light::sample_Li`` (light.cuh:29-48).

    Args:
      pick: per-ray picked light index ``[N] int32``.
      isect_p: shading points ``[N, 3]``.
      u1, u2: uniforms for the area-light triangle sample.

    Returns ``(unit_wi, Li, t, pdf, ltri)`` where ``ltri`` is the area
    light's triangle index (INVALID_INDEX for point lights).  The reference
    always returns true for both light types, so there is no valid mask.
    """
    ltype = lights.ltype[pick]
    pos = lights.pos[pick]
    emit = lights.emit[pick]
    ltri = lights.tri[pick]

    # point light (light.cuh:31-37)
    to_l = pos - isect_p
    t_pt = vec.length(to_l)
    wi_pt = to_l / t_pt[..., None]
    li_pt = emit / (t_pt * t_pt)[..., None]
    pdf_pt = jnp.ones_like(t_pt)

    # area light (light.cuh:38-47)
    tri = tris.gather(jnp.maximum(ltri, 0))
    su, sv = sample_triangle_barycentric(u1, u2)
    tri_p = tri.point(su, sv)
    pdf_area = 1.0 / (0.5 * vec.length(tri.n))  # 1/area (triangle.cuh:78-79)
    to_a = tri_p - isect_p
    dist_sq = vec.length_squared(to_a)
    t_ar = jnp.sqrt(dist_sq)
    wi_ar = to_a / t_ar[..., None]
    # area->solid-angle pdf conversion with |cos| (double-sided emitter)
    pdf_ar = pdf_area * dist_sq / vec.abs_dot(vec.normalize(tri.n), wi_ar)

    is_pt = ltype == POINT_LIGHT
    unit_wi = jnp.where(is_pt[..., None], wi_pt, wi_ar)
    li = jnp.where(is_pt[..., None], li_pt, emit)
    t = jnp.where(is_pt, t_pt, t_ar)
    pdf = jnp.where(is_pt, pdf_pt, pdf_ar)
    return unit_wi, li, t, pdf, ltri


def pdf_li(lights: LightTable, tris: Triangles, pick, isect_p, unit_wi):
    """Batched ``Light::pdf_Li`` for BSDF-sampling MIS (light.cuh:50-64).

    Intersects the area light's triangle with the (infinite-tmax) ray from
    ``isect_p`` along ``unit_wi``; returns 0 for point lights and misses.
    """
    ltype = lights.ltype[pick]
    ltri = lights.tri[pick]
    tri = tris.gather(jnp.maximum(ltri, 0))
    hit, _, hu, hv = intersect_triangle(
        isect_p, unit_wi, jnp.inf, tri.p0, tri.e1, tri.e2, tri.n)
    lp = tri.point(hu, hv)
    area = 0.5 * vec.length(tri.n)
    pdf = vec.length_squared(lp - isect_p) / (
        area * vec.abs_dot(vec.normalize(tri.n), unit_wi))
    valid = (ltype == AREA_LIGHT) & hit
    return jnp.where(valid, pdf, 0.0)
