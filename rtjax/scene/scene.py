"""Scene aggregate and host-side scene builder.

TPU-native equivalent of /root/reference/scene.cuh, primitive.cuh, and the
hand-rolled scene assembly in main.cu:39-156.  The reference's
pointer-based ``Primitive{Triangle*, Material*, Light*}`` binding records
(primitive.cuh:4-12) become two int32 index arrays over a single global
triangle index space (the BVH leaf order); null light pointers become
INVALID_INDEX.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BVH_MAX_DEPTH, INVALID_INDEX
from ..core.geometry import Triangles
from ..accel.bvh import BvhArrays
from .material import MaterialBuilder, MaterialTable
from .light import AREA_LIGHT, POINT_LIGHT, LightTable, make_light_table
from .transform import Transform


@partial(jax.tree_util.register_dataclass,
         data_fields=["tris", "bvh", "materials", "lights",
                      "prim_material", "prim_light", "tables",
                      "env_radiance", "instances", "blas", "inst_tables"],
         meta_fields=["num_lights", "leaf_hbm", "meta_vmem", "mat_runs"])
@dataclasses.dataclass(frozen=True)
class Scene:
    """Device-resident scene: a pytree of dense arrays (scene.cuh:4-8).

    Triangles, prim tables and area-light triangle indices are all in BVH
    leaf (permuted) order, so a leaf's primitives are contiguous and the
    "same triangle" identity tests of the wavefront engine are plain int32
    compares (replacing the reference's pointer identity, render.cuh:321,
    bvh.cuh:243).
    """

    tris: Triangles
    bvh: BvhArrays
    materials: MaterialTable
    lights: LightTable
    prim_material: jax.Array  # [P] int32
    prim_light: jax.Array     # [P] int32 (INVALID_INDEX if not emissive)
    tables: object            # WideTables for the Pallas packet kernels, or
                              # None when max_leaf_size > 8 / tables > VMEM
    env_radiance: jax.Array   # [3] constant environment radiance (the
                              # reference stubs this: light.cuh:66-68 and
                              # the TODOs at render.cuh:105,243,325)
    instances: object         # InstanceTable for two-level traversal, or None
    blas: tuple               # tuple[MeshBlas] shared bottom-level structures
    inst_tables: object       # kernels.pallas_wide.InstancedTables: combined
                              # base+BLAS tables for the single-launch
                              # two-level Pallas path, or None (falls back to
                              # the per-instance host loop in render/trace.py)
    num_lights: int           # static
    leaf_hbm: bool = False    # static: base-scene leaf table stays in HBM
                              # and the packet kernel streams rows by DMA —
                              # scenes whose tables exceed VMEM keep the
                              # Pallas path instead of the XLA fallback
    meta_vmem: bool = False   # static: node meta too big for SMEM — the
                              # kernel reads it from the bounds-row mirror
                              # lanes instead (pallas_wide._vmem_meta)
    mat_runs: tuple | None = None  # static: the prim->material map as runs
                              # ((start, mat), ...) over LEAF-ORDER prim ids,
                              # when it has few runs (real scenes assign
                              # materials per mesh, so the permuted map stays
                              # piecewise-constant).  Lets the engine replace
                              # the pool-width [P] material gather (~2.4 ms
                              # at 2^18 on v5e) with <= MAT_RUN_LIMIT vector
                              # compares (~20 us each) — same diet as the
                              # emitter-id compares in render/wavefront.py.


# packet-kernel residency budgets (bytes); module-level so tests can
# shrink them to exercise the big-scene tiers on small scenes
NODE_VMEM_BUDGET = 60 << 20   # node rows resident in VMEM
TABLE_VMEM_BUDGET = 100 << 20  # nodes + leaves resident in VMEM

# prim->material run-compare chain: above this many runs the where-chain
# (~20 us/run at 2^18 lanes) stops beating the ~2.4 ms pool-width gather
# by a comfortable margin and the engine falls back to prim_material[prim]
MAT_RUN_LIMIT = 32


def _material_runs(pm: np.ndarray) -> tuple | None:
    """Compress a leaf-order prim->material index map into ``((start, mat),
    ...)`` runs, or None when it has more than MAT_RUN_LIMIT runs."""
    if len(pm) == 0:
        return None
    starts = np.flatnonzero(np.diff(pm)) + 1
    if len(starts) + 1 > MAT_RUN_LIMIT:
        return None
    return tuple((int(s), int(pm[s])) for s in (0, *starts.tolist()))


class SceneBuilder:
    """Host-side scene assembly with the reference factory API.

    Mirrors main.cu's flow: register materials, add triangles/meshes, add
    lights, then :meth:`build` (which runs the sweep-SAH builder and permutes
    everything into leaf order, like Bvh::Bvh at bvh.cuh:30-219).
    """

    def __init__(self):
        self.materials = MaterialBuilder()
        self._p0: list[np.ndarray] = []
        self._p1: list[np.ndarray] = []
        self._p2: list[np.ndarray] = []
        self._mat: list[np.ndarray] = []
        self._num_tris = 0
        # lights
        self._ltype: list[int] = []
        self._lpos: list[tuple] = []
        self._lemit: list[tuple] = []
        self._ltri: list[int] = []
        self._env = (0.0, 0.0, 0.0)
        # instancing: unique meshes + placements
        self._blas_meshes: list[tuple] = []       # (vertices, faces)
        self._instances: list[tuple] = []         # (mesh_idx, matrix, material)
        self._inst_cache = None                   # BLAS build memo

    # -- materials (delegate to MaterialBuilder, material.cuh:25-44) --------
    def make_matte(self, albedo) -> int:
        return self.materials.make_matte(albedo)

    def make_mirror(self, albedo) -> int:
        return self.materials.make_mirror(albedo)

    def make_glass(self, index_of_refraction: float) -> int:
        return self.materials.make_glass(index_of_refraction)

    # -- geometry -----------------------------------------------------------
    def add_triangles(self, p0, p1, p2, material: int) -> np.ndarray:
        """Add a batch of triangles; returns their global indices."""
        p0 = np.atleast_2d(np.asarray(p0, np.float32))
        p1 = np.atleast_2d(np.asarray(p1, np.float32))
        p2 = np.atleast_2d(np.asarray(p2, np.float32))
        n = len(p0)
        self._p0.append(p0)
        self._p1.append(p1)
        self._p2.append(p2)
        self._mat.append(np.full(n, material, np.int32))
        idx = np.arange(self._num_tris, self._num_tris + n)
        self._num_tris += n
        return idx

    def add_mesh(self, vertices, faces, material: int,
                 transform: Transform | None = None) -> np.ndarray:
        """Add a triangle mesh (vertex positions + [F,3] indices).

        Mirrors main.cu:67-84: optional transform applied on the host, then
        faces expanded to triangles.
        """
        v = np.asarray(vertices, np.float64)
        if transform is not None:
            v = transform.apply(v)
        f = np.asarray(faces, np.int64)
        return self.add_triangles(v[f[:, 0]], v[f[:, 1]], v[f[:, 2]], material)

    # -- lights (light.cuh:70-84) -------------------------------------------
    def add_point_light(self, pos, intensity) -> int:
        self._ltype.append(POINT_LIGHT)
        self._lpos.append(tuple(pos))
        self._lemit.append(tuple(intensity))
        self._ltri.append(INVALID_INDEX)
        return len(self._ltype) - 1

    def register_mesh(self, vertices, faces) -> int:
        """Register a unique mesh for instancing; returns its mesh id."""
        self._blas_meshes.append((np.asarray(vertices, np.float64),
                                  np.asarray(faces, np.int64)))
        self._inst_cache = None  # content changed: invalidate the BLAS memo
        return len(self._blas_meshes) - 1

    def add_instance(self, mesh_id: int, material: int,
                     transform: Transform | np.ndarray | None = None) -> int:
        """Place an instance of a registered mesh (two-level BVH).

        Unlike :meth:`add_mesh` (which bakes the transform into world-space
        triangles like main.cu:67-84), instances share one bottom-level BVH;
        memory scales with unique meshes, not placements.
        """
        m = np.eye(4)
        if transform is not None:
            m = transform.matrix if isinstance(transform, Transform) \
                else np.asarray(transform, np.float64)
        # copy: a caller mutating its Transform after add_instance must not
        # retroactively move the placed instance (ADVICE r2 #3)
        self._instances.append((mesh_id, np.array(m, np.float64), material))
        self._inst_cache = None  # content changed: invalidate the BLAS memo
        return len(self._instances) - 1

    def set_environment(self, radiance) -> None:
        """Constant environment radiance added on ray miss (completes the
        reference's unimplemented environment light, render.cuh:105)."""
        self._env = tuple(radiance)

    def add_area_light(self, p0, p1, p2, radiance, material: int) -> int:
        """Add an emissive triangle (main.cu:110-116: geometry + light)."""
        tri_idx = int(self.add_triangles(p0, p1, p2, material)[0])
        self._ltype.append(AREA_LIGHT)
        self._lpos.append((0.0, 0.0, 0.0))
        self._lemit.append(tuple(radiance))
        self._ltri.append(tri_idx)
        return len(self._ltype) - 1

    # -- build ---------------------------------------------------------------
    def build(self, max_depth: int = BVH_MAX_DEPTH,
              max_leaf_size: int | None = 8,
              min_leaf_size: int | None = None,
              builder: str = "auto",
              verbose: bool = False) -> Scene:
        """Assemble the device scene (BVH build + leaf-order permutation).

        ``min_leaf_size`` defaults to ``max_leaf_size`` (filled leaf rows for
        the packet kernel); pass 1 for reference-exact splitting.
        """
        from ..accel import build_bvh_best

        if min_leaf_size is None:
            min_leaf_size = max_leaf_size if max_leaf_size else 1

        assert self._num_tris > 0, "scene has no geometry"
        p0 = np.concatenate(self._p0)
        p1 = np.concatenate(self._p1)
        p2 = np.concatenate(self._p2)
        mat_idx = np.concatenate(self._mat)

        # per-triangle bounds + vertex-mean centers (triangle.cuh:11,22-37)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        centers = (p0 + p1 + p2) / 3.0

        res = build_bvh_best(bmin, bmax, centers, max_depth=max_depth,
                             max_leaf_size=max_leaf_size,
                             min_leaf_size=min_leaf_size, which=builder)
        if verbose:
            # same stats the reference prints (bvh.cuh:63-69,203-204)
            from ..utils.log import logger
            lo, hi = bmin.min(0), bmax.max(0)
            logger.info(f"Global bounding box: ({lo[0]:.6g}, {lo[1]:.6g}, "
                        f"{lo[2]:.6g}) ({hi[0]:.6g}, {hi[1]:.6g}, "
                        f"{hi[2]:.6g})")
            logger.info(f"BVH has {res.num_nodes} nodes and "
                        f"{self._num_tris} primitives, with max_depth = "
                        f"{res.max_depth}")

        perm = res.perm
        inv_perm = np.empty_like(perm)
        inv_perm[perm] = np.arange(len(perm))

        prim_light = np.full(self._num_tris, INVALID_INDEX, np.int32)
        ltri = list(self._ltri)
        for li, ti in enumerate(self._ltri):
            if ti != INVALID_INDEX:
                prim_light[ti] = li
                ltri[li] = int(inv_perm[ti])  # light -> permuted triangle idx

        tris = Triangles.from_vertices(p0[perm], p1[perm], p2[perm])
        # host-side twin for build-time consumers (make_light_table): keeps
        # scene build free of device->host fetches, which cost minutes per
        # array through a remote-TPU tunnel
        import types
        _hp0 = p0[perm].astype(np.float32)
        _he1 = (_hp0 - p1[perm]).astype(np.float32)
        _he2 = (p2[perm] - _hp0).astype(np.float32)
        tris_host = types.SimpleNamespace(p0=_hp0, e1=_he1, e2=_he2,
                                          n=np.cross(_he1, _he2))

        tables = None
        leaf_hbm = False
        meta_vmem = False
        # packet-kernel residency tiers, decided from the ACTUAL table
        # shapes after the wide collapse:
        #   1. everything VMEM/SMEM-resident (fast path)
        #   2. leaf table > VMEM budget -> leaf rows stream from HBM
        #      (leaf_hbm); node meta > SMEM budget -> meta moves to mirror
        #      lanes of the VMEM bounds rows (meta_vmem)
        #   3. node rows alone > VMEM budget -> TWO nodes per bounds row
        #      (packed_nodes; the kernel selects the half with a dynamic
        #      lane roll), doubling the ceiling to ~4M tris
        #   4. packed node rows still > VMEM budget -> XLA traversal
        #      fallback
        est_node_rows = res.num_nodes // 8 + 16
        nodes_fit = est_node_rows * 512 < 2 * NODE_VMEM_BUDGET
        if max_leaf_size is not None and max_leaf_size <= 8 and nodes_fit:
            from ..kernels.pallas_wide import (MAX_NODES16, SMEM_META_CAP,
                                               build_wide_tables,
                                               pack_node_rows)
            pp0, pp1, pp2 = p0[perm], p1[perm], p2[perm]
            te1 = pp0 - pp1
            te2 = pp2 - pp0
            # node width: 16-wide when the collapsed tree fits the 2^14
            # stack-entry node cap (one 16-child step costs 1.34x an
            # 8-child one for ~half the steps — micro_kernel
            # slab_wide16_fused).  Instanced scenes use 16-wide too when
            # the CONCATENATED (base + BLAS) node count fits the cap —
            # verified after the BLAS builds below, with an 8-wide rebuild
            # if the estimate was wrong.  Packed node rows stay 8-wide.
            # RTJAX_WIDTH=8|16 forces either for A/B runs.
            import os as _os
            _w = int(_os.environ.get("RTJAX_WIDTH", "0"))
            if _w not in (8, 16):
                _w = 16 if res.num_nodes < 14 * MAX_NODES16 else 8
            tables = build_wide_tables(res, pp0, te1, te2,
                                       np.cross(te1, te2), as_numpy=True,
                                       width=_w)
            node_bytes = tables.num_wide_nodes * 512
            leaf_bytes = tables.num_leaf_rows * 512
            smem_bytes = (tables.child_meta.size
                          + tables.node_info.size) * 4
            if node_bytes >= NODE_VMEM_BUDGET:
                # packed rows are an 8-wide layout; a 16-wide tree that
                # outgrows the node budget rebuilds 8-wide first (in
                # practice 16-wide trees are capped at 8 MB of rows, so
                # this fires only under shrunken test budgets)
                if tables.width != 8:
                    tables = build_wide_tables(res, pp0, te1, te2,
                                               np.cross(te1, te2),
                                               as_numpy=True, width=8)
                    node_bytes = tables.num_wide_nodes * 512
                    leaf_bytes = tables.num_leaf_rows * 512
                    smem_bytes = (tables.child_meta.size
                                  + tables.node_info.size) * 4
                tables = pack_node_rows(tables)
                node_bytes //= 2
            if node_bytes >= NODE_VMEM_BUDGET:
                tables = None
            else:
                leaf_hbm = node_bytes + leaf_bytes >= TABLE_VMEM_BUDGET
                meta_vmem = smem_bytes >= SMEM_META_CAP

        w_inst = tables.width if tables is not None else 8
        instances, blas, blas_np = self._build_instances(
            max_depth, max_leaf_size, min_leaf_size, builder, w_inst)
        inst_tables = None
        if instances is not None and tables is not None and not leaf_hbm \
                and not tables.packed_nodes:
            from ..kernels.pallas_wide import build_instanced_tables
            if tables.width != 8 and all(t is not None for t in blas_np) \
                    and (tables.num_wide_nodes
                         + sum(t.num_wide_nodes for t in blas_np)
                         >= MAX_NODES16):
                # the concatenated 16-wide node table would overflow the
                # stack-entry node field (2^14): rebuild base + BLAS 8-wide
                # (8-wide entries address 2^22 nodes)
                tables = build_wide_tables(res, pp0, te1, te2,
                                           np.cross(te1, te2),
                                           as_numpy=True, width=8)
                meta_vmem = (tables.child_meta.size
                             + tables.node_info.size) * 4 >= SMEM_META_CAP
                instances, blas, blas_np = self._build_instances(
                    max_depth, max_leaf_size, min_leaf_size, builder, 8)
            inst_tables = build_instanced_tables(
                tables, bmin.min(0), bmax.max(0), blas_np, instances)
        if tables is not None:
            tables = tables.device()

        return Scene(
            tris=tris,
            bvh=res.to_device(),
            tables=tables,
            inst_tables=inst_tables,
            materials=self.materials.build(),
            lights=make_light_table(self._ltype, self._lpos, self._lemit,
                                    ltri, tris_host),
            prim_material=jnp.asarray(mat_idx[perm]),
            mat_runs=_material_runs(mat_idx[perm]),
            prim_light=jnp.asarray(prim_light[perm]),
            env_radiance=jnp.asarray(self._env, jnp.float32),
            instances=instances,
            blas=blas,
            num_lights=len(self._ltype),
            leaf_hbm=leaf_hbm,
            meta_vmem=meta_vmem,
        )

    def _build_instances(self, max_depth, max_leaf_size, min_leaf_size,
                         builder, width=8):
        """Build shared BLAS + instance table (memoized per build params)."""
        if not self._instances:
            return None, (), ()
        # memoized per build params; any add_instance/register_mesh call
        # invalidates (_inst_cache = None), and per-instance content rides
        # in the key so content edits with unchanged counts cannot return
        # stale tables (ADVICE r2 #3)
        content = tuple((mid, m.tobytes(), mat)
                        for mid, m, mat in self._instances)
        cache_key = (max_depth, max_leaf_size, min_leaf_size, builder,
                     len(self._blas_meshes), content, width)
        cached = getattr(self, "_inst_cache", None)
        if cached is not None and cached[0] == cache_key:
            return cached[1]
        from ..accel import build_bvh_best
        from ..accel.instancing import (InstanceTable, MeshBlas,
                                        instance_world_aabb)
        from ..kernels.pallas_wide import build_wide_tables

        blas = []
        blas_np = []
        local_bounds = []
        for verts, faces in self._blas_meshes:
            p0 = verts[faces[:, 0]].astype(np.float32)
            p1 = verts[faces[:, 1]].astype(np.float32)
            p2 = verts[faces[:, 2]].astype(np.float32)
            bmin = np.minimum(np.minimum(p0, p1), p2)
            bmax = np.maximum(np.maximum(p0, p1), p2)
            res = build_bvh_best(bmin, bmax, (p0 + p1 + p2) / 3.0,
                                 max_depth=max_depth,
                                 max_leaf_size=max_leaf_size,
                                 min_leaf_size=min_leaf_size or 1,
                                 which=builder)
            perm = res.perm
            tris = Triangles.from_vertices(p0[perm], p1[perm], p2[perm])
            tables = None
            # same VMEM-fit guard as the top-level tables (ADVICE r1): an
            # oversized BLAS falls back to the XLA traversal instead of
            # faulting at kernel launch
            est_rows = res.num_nodes // 2 + res.num_nodes // 8 + 16
            fits_vmem = est_rows * 512 < TABLE_VMEM_BUDGET
            if (max_leaf_size is not None and max_leaf_size <= 8
                    and fits_vmem):
                pp0, pp1, pp2 = p0[perm], p1[perm], p2[perm]
                te1, te2 = pp0 - pp1, pp2 - pp0
                tables = build_wide_tables(res, pp0, te1, te2,
                                           np.cross(te1, te2), as_numpy=True,
                                           width=width)
            blas_np.append(tables)
            blas.append(MeshBlas(tris=tris, bvh=res.to_device(),
                                 tables=None if tables is None
                                 else tables.device()))
            local_bounds.append((bmin.min(0), bmax.max(0)))

        n_inst = len(self._instances)
        fwd = np.zeros((n_inst, 3, 4), np.float32)
        inv = np.zeros((n_inst, 3, 4), np.float32)
        nrm = np.zeros((n_inst, 3, 3), np.float32)
        lo = np.zeros((n_inst, 3), np.float32)
        hi = np.zeros((n_inst, 3), np.float32)
        mats = np.zeros(n_inst, np.int32)
        mesh_ids = []
        for i, (mid, m, mat) in enumerate(self._instances):
            mesh_ids.append(mid)
            m64 = np.asarray(m, np.float64)
            fwd[i] = m64[:3, :4]
            inv[i] = np.linalg.inv(m64)[:3, :4]
            # cofactor: maps local cross(e1,e2) to world cross(Me1, Me2)
            m3 = m64[:3, :3]
            nrm[i] = np.linalg.det(m3) * np.linalg.inv(m3).T
            lo[i], hi[i] = instance_world_aabb(*local_bounds[mid], m)
            mats[i] = mat
        table = InstanceTable(fwd=jnp.asarray(fwd), inv=jnp.asarray(inv),
                              nrm=jnp.asarray(nrm),
                              aabb_lo=jnp.asarray(lo), aabb_hi=jnp.asarray(hi),
                              material=jnp.asarray(mats),
                              mesh_id=tuple(mesh_ids))
        self._inst_cache = (cache_key, (table, tuple(blas),
                                        tuple(blas_np)))
        return self._inst_cache[1]
