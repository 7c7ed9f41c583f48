"""Repass (multi-pass re-dispatch) two-level anatomy on the config-4
scene: how many passes actually run, their per-pass live-ray occupancy,
and the time split between the BLAS launches and the repass bookkeeping
(entry tables, picks, local transforms).

Replicates render/trace.py::_repass_closest's loop with an unrolled pass
counter so each pass's occupancy is visible (the production while_loop
hides them), on a frozen mid-frame-like ray population.

Usage: python benchmarks/repass_anatomy.py [pool_log2=17]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/rtjax-jit-cache-tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from rtjax import Camera, RenderConfig, SceneBuilder
    from rtjax.core import v3
    from rtjax.render.trace import (_backend, _direct_max, _mesh_groups,
                                    _repass_local_rays, _repass_setup,
                                    _tables_meta_vmem, trace_closest)
    from rtjax.scene.transform import Transform, rotate, scale, translate
    from rtjax.scene.mesh import load_ply

    mesh = load_ply(os.path.join(os.path.dirname(__file__), os.pardir,
                                 "assets", "bun_zipper.ply"))
    b = SceneBuilder()
    white = b.make_matte((0.73, 0.73, 0.73))
    red = b.make_matte((0.65, 0.05, 0.05))
    brown = b.make_matte((0.62, 0.57, 0.54))
    s = 8.0
    b.add_triangles((-s, 0, -s), (s, 0, -s), (s, 0, s), white)
    b.add_triangles((-s, 0, -s), (s, 0, s), (-s, 0, s), white)
    b.add_area_light((-1, 3.0, -1), (1, 3.0, -1), (1, 3.0, 1),
                     (40, 40, 40), white)
    mid = b.register_mesh(mesh.vertices, mesh.faces)
    rng = np.random.default_rng(3)
    for i in range(16):
        t = Transform(translate(0.0946899, -0.0329874, -0.0587997))
        t.composite(scale(4.0, 4.0, 4.0))
        t.composite(rotate([0, 1, 0], rng.uniform(0, 6.28)))
        t.composite(translate((i % 4) * 1.6 - 2.4, 0.0,
                              (i // 4) * 1.6 - 2.4))
        b.add_instance(mid, brown if i % 2 else red, t)
    scene = b.build()
    cam = Camera.make((0, 4.5, 7.5), (0, 0.6, 0), (0, 1, 0), 40, 1.0)
    inst = scene.instances
    cfg = RenderConfig()

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log2

    # camera rays (bounce-0 population) + surface bounce-like rays
    side = int(np.sqrt(n))
    ys, xs = np.divmod(np.arange(n) % (side * side), side)
    u = ((xs + 0.5) / side).astype(np.float32)
    v = ((ys + 0.5) / side).astype(np.float32)
    oc, dc = cam.get_rays(jnp.asarray(u), jnp.asarray(v))
    o = v3.from_array(jnp.asarray(np.asarray(oc, np.float32)))
    d = v3.from_array(jnp.asarray(np.asarray(dc, np.float32)))
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)

    BIG = jnp.float32(3.0e38)
    interp = jax.default_backend() != "tpu"

    # ---- per-pass occupancy (unrolled static passes) ----
    @jax.jit
    def pass_stats(o, d, tmax, active):
        groups = _mesh_groups(inst)
        outs = []
        for mesh_id, ks in groups.items():
            G = len(ks)
            ent, ok = _repass_setup(inst, ks, o, d)
            g_iota = jnp.arange(G, dtype=jnp.int32)[:, None]
            walked = jnp.zeros((G, n), bool)
            t = tmax
            occ = []
            for _ in range(G):
                cand = ok & ~walked & (ent < t[None]) & active[None]
                pend = jnp.any(cand, axis=0)
                occ.append(jnp.sum(pend))
                pick = jnp.argmin(jnp.where(cand, ent, BIG), axis=0
                                  ).astype(jnp.int32)
                walked = walked | ((g_iota == pick[None]) & pend[None])
                # no BLAS walk here: this bounds occupancy WITHOUT tmax
                # feedback (production passes shrink t, so real pass
                # counts are <= these)
            outs.append(jnp.stack(occ))
        return outs

    occs = jax.block_until_ready(pass_stats(o, d, tmax, active))
    for g, occ in enumerate(occs):
        occ = np.asarray(occ)
        print(f"mesh group {g}: per-pass pending rays (no tmax feedback): "
              f"{[int(x) for x in occ]} "
              f"(of {n}; mean candidates/ray "
              f"{occ.sum() / n:.2f})", flush=True)

    # ---- time split: full repass vs single-instance-equivalent walks ----
    f_two = jax.jit(lambda o, d, tm, a: trace_closest(
        scene, cfg, "pallas", interp, o, d, tm, a)[1])

    blas = scene.blas[0]
    c_k, _ = _backend("pallas", interp, blas.tables, blas.bvh, blas.tris,
                      cfg.stack_size, False,
                      meta_vmem=_tables_meta_vmem(blas.tables),
                      walker="auto")
    f_one = jax.jit(lambda o, d, tm, a: c_k(o, d, tm, a)[1])

    for name, f in (("repass two-level", f_two), ("one bunny walk", f_one)):
        r = f(o, d, tmax, active)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(5):
            r = f(o, d, tmax, active)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 5
        print(f"{name:18s} {dt*1e3:8.2f} ms  ({n/dt/1e6:6.2f} Mrays/s)",
              flush=True)


if __name__ == "__main__":
    main()
