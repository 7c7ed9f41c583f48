"""Materials: SoA table + branchless batched BSDF sampling/evaluation.

TPU-native equivalent of /root/reference/material.cuh.  The reference's
tagged-union struct with per-thread branches becomes a SoA table
(:class:`MaterialTable`) and two batched pure functions (:func:`sample_f`,
:func:`get_f`) that compute every material branch on the VPU and combine them
with ``jnp.where`` selects — the wavefront analog of SIMT divergence-free
shading.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import INV_PI
from ..core import vec
from ..core.sampling import same_hemisphere, uniform_sample_sphere

MATTE = 0
MIRROR = 1
GLASS = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """SoA material parameters (material.cuh:20-22)."""

    mtype: jax.Array   # [M] int32 (MATTE/MIRROR/GLASS)
    albedo: jax.Array  # [M, 3] float32 (matte, mirror)
    ior: jax.Array     # [M] float32 (glass)

    def gather(self, idx):
        """Per-ray material params: ``(mtype, albedo, ior)``.

        Material tables are small, so this is a vector select chain rather
        than an HBM gather (see core.tables).
        """
        from ..core.tables import take_rows
        return (take_rows(self.mtype, idx), take_rows(self.albedo, idx),
                take_rows(self.ior, idx))


class MaterialBuilder:
    """Host-side material registry with the reference factory API
    (material.cuh:25-44)."""

    def __init__(self):
        self._mtype: list[int] = []
        self._albedo: list[tuple] = []
        self._ior: list[float] = []

    def _add(self, mtype, albedo, ior) -> int:
        self._mtype.append(mtype)
        self._albedo.append(albedo)
        self._ior.append(ior)
        return len(self._mtype) - 1

    def make_matte(self, albedo) -> int:
        return self._add(MATTE, tuple(albedo), 1.0)

    def make_mirror(self, albedo) -> int:
        return self._add(MIRROR, tuple(albedo), 1.0)

    def make_glass(self, index_of_refraction: float) -> int:
        return self._add(GLASS, (0.0, 0.0, 0.0), float(index_of_refraction))

    def build(self) -> MaterialTable:
        n = max(len(self._mtype), 1)
        mtype = np.zeros(n, np.int32)
        albedo = np.zeros((n, 3), np.float32)
        ior = np.ones(n, np.float32)
        if self._mtype:
            mtype[:] = self._mtype
            albedo[:] = self._albedo
            ior[:] = self._ior
        return MaterialTable(mtype=jnp.asarray(mtype), albedo=jnp.asarray(albedo),
                             ior=jnp.asarray(ior))


def is_specular(mtype):
    """MIRROR or GLASS (material.cuh:14)."""
    return (mtype == MIRROR) | (mtype == GLASS)


def get_f(mtype, albedo, unit_wo, unit_wi, unit_n):
    """BSDF evaluation for light-sampling MIS (material.cuh:47-57).

    Matte only; returns ``(valid, f[...,3], pdf)``.  ``valid`` is False for
    specular materials or when wo/wi are on the same side (the reference's
    ``return false``), in which case f/pdf contents are unspecified.
    """
    valid = (mtype == MATTE) & same_hemisphere(unit_wo, unit_wi, unit_n)
    f = albedo * INV_PI
    pdf = vec.dot(unit_wi, unit_n) * INV_PI
    return valid, f, pdf


def sample_f(mtype, albedo, ior, unit_wo, unit_n, u1, u2, u3):
    """Branchless batched BSDF sampling (material.cuh:60-108).

    Args:
      mtype/albedo/ior: per-ray gathered material params.
      unit_wo: incoming ray direction (points INTO the surface).
      unit_n: geometric unit normal.
      u1, u2: uniforms for the matte cosine sample.
      u3: uniform for the glass reflect/refract choice.

    Returns ``(f[...,3], unit_wi, pdf, n_out)`` where ``n_out`` is the
    possibly-flipped shading normal the reference writes back by reference
    (used for the offset-ray spawn and the beta cosine).
    """
    # --- matte / mirror share the flip-to-oppose-wo normal (material.cuh:63)
    n_opp = jnp.where(vec.dot(unit_wo, unit_n)[..., None] > 0.0, -unit_n, unit_n)

    # matte: cosine-weighted via normalize(n + uniform_sphere) (material.cuh:64-67)
    wi_matte = vec.normalize(n_opp + uniform_sample_sphere(u1, u2))
    pdf_matte = vec.dot(wi_matte, n_opp) * INV_PI
    f_matte = albedo * INV_PI

    # mirror (material.cuh:68-72)
    wi_mirror = vec.reflect(unit_wo, n_opp)
    pdf_mirror = jnp.ones_like(pdf_matte)
    f_mirror = albedo / vec.dot(wi_mirror, n_opp)[..., None]

    # glass (material.cuh:73-107)
    cos_theta = vec.dot(unit_wo, unit_n)
    front = cos_theta < 0.0
    cos_theta = jnp.abs(cos_theta)
    inv_cos = 1.0 / cos_theta
    eta_ratio = jnp.where(front, 1.0 / ior, ior)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = eta_ratio * sin_theta > 1.0
    r0 = (1.0 - ior) / (1.0 + ior)
    r0 = r0 * r0
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    do_reflect = cannot_refract | (u3 < reflectance)

    n_front = jnp.where(front[..., None], unit_n, -unit_n)  # faces the incomer
    wi_refl = vec.reflect(unit_wo, n_front)
    pdf_refl = jnp.where(cannot_refract, 1.0, reflectance)
    f_refl = jnp.where(cannot_refract, inv_cos, reflectance * inv_cos)

    wi_refr = vec.refract(unit_wo, n_front, eta_ratio, cos_theta)
    pdf_refr = 1.0 - reflectance
    n_refr = -n_front  # flipped to the transmission side (material.cuh:104)
    # NOTE: the reference divides by dot(wi, n) with the ALREADY-FLIPPED
    # normal (material.cuh:104-106), i.e. the *transmitted* cosine.
    f_refr = pdf_refr * eta_ratio * eta_ratio / vec.dot(wi_refr, n_refr)

    wi_glass = jnp.where(do_reflect[..., None], wi_refl, wi_refr)
    pdf_glass = jnp.where(do_reflect, pdf_refl, pdf_refr)
    f_glass_s = jnp.where(do_reflect, f_refl, f_refr)
    f_glass = jnp.broadcast_to(f_glass_s[..., None], albedo.shape)
    n_glass = jnp.where(do_reflect[..., None], n_front, n_refr)

    # --- combine by material type
    is_matte = (mtype == MATTE)[..., None]
    is_mirror = (mtype == MIRROR)[..., None]
    wi = jnp.where(is_matte, wi_matte, jnp.where(is_mirror, wi_mirror, wi_glass))
    f = jnp.where(is_matte, f_matte, jnp.where(is_mirror, f_mirror, f_glass))
    pdf = jnp.where(mtype == MATTE, pdf_matte,
                    jnp.where(mtype == MIRROR, pdf_mirror, pdf_glass))
    n_out = jnp.where((mtype == GLASS)[..., None], n_glass, n_opp)
    return f, wi, pdf, n_out
