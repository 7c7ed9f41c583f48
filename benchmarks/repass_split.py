"""Split the repass two-level cost (config-4 class scene) into parts:

- dense walk: full-width all-active BLAS launch (reference point)
- masked walk: full-width launch with only the pass-1 pending mask live
- empty walk: full-width launch, zero live lanes (fixed launch cost)
- bookkeeping: setup + 2 passes of cand/pick/walked/local-transform math
  with the BLAS walk replaced by a no-op

Usage: python benchmarks/repass_split.py [pool_log2=17]
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
    from rtjax.render.trace import (_backend, _mesh_groups,
                                    _repass_local_rays, _repass_setup,
                                    _tables_meta_vmem)
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
    side = int(np.sqrt(n))
    ys, xs = np.divmod(np.arange(n) % (side * side), side)
    u = ((xs + 0.5) / side).astype(np.float32)
    v = ((ys + 0.5) / side).astype(np.float32)
    oc, dc = cam.get_rays(jnp.asarray(u), jnp.asarray(v))
    o = v3.from_array(jnp.asarray(np.asarray(oc, np.float32)))
    d = v3.from_array(jnp.asarray(np.asarray(dc, np.float32)))
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)
    dead = jnp.zeros(n, bool)

    interp = jax.default_backend() != "tpu"
    blas = scene.blas[0]
    c_k, _ = _backend("pallas", interp, blas.tables, blas.bvh, blas.tris,
                      cfg.stack_size, False,
                      meta_vmem=_tables_meta_vmem(blas.tables),
                      walker="auto")

    ks = list(range(16))
    BIG = jnp.float32(3.0e38)

    @jax.jit
    def pend1_of(o, d, tmax, active):
        ent, ok = _repass_setup(inst, ks, o, d)
        cand = ok & (ent < tmax[None]) & active[None]
        pend = jnp.any(cand, axis=0)
        pick = jnp.argmin(jnp.where(cand, ent, BIG), axis=0).astype(jnp.int32)
        inv_flat = jnp.stack([inst.inv[k].reshape(12) for k in ks])
        o_l, d_l = _repass_local_rays(inv_flat, pick, o, d)
        return pend, o_l, d_l

    pend1, o_l, d_l = jax.block_until_ready(pend1_of(o, d, tmax, active))
    print(f"pass-1 pending: {int(jnp.sum(pend1))} of {n}", flush=True)

    @jax.jit
    def book2(o, d, tmax, active):
        """setup + 2 bookkeeping passes, walks replaced by no-ops."""
        ent, ok = _repass_setup(inst, ks, o, d)
        inv_flat = jnp.stack([inst.inv[k].reshape(12) for k in ks])
        g_iota = jnp.arange(16, dtype=jnp.int32)[:, None]
        walked = jnp.zeros((16, n), bool)
        t = tmax
        acc = jnp.float32(0)
        for _ in range(2):
            cand = ok & ~walked & (ent < t[None]) & active[None]
            pend = jnp.any(cand, axis=0)
            pick = jnp.argmin(jnp.where(cand, ent, BIG), axis=0
                              ).astype(jnp.int32)
            walked = walked | ((g_iota == pick[None]) & pend[None])
            o2, d2 = _repass_local_rays(inv_flat, pick, o, d)
            acc = acc + jnp.sum(o2[0]) + jnp.sum(d2[0])  # keep alive
        return acc

    cases = [
        ("dense walk", jax.jit(lambda: c_k(o_l, d_l, tmax, active)[1])),
        ("masked walk (25%)", jax.jit(lambda: c_k(o_l, d_l, tmax, pend1)[1])),
        ("empty walk", jax.jit(lambda: c_k(o_l, d_l, tmax, dead)[1])),
        ("bookkeeping x2", jax.jit(lambda: book2(o, d, tmax, active))),
    ]
    for name, f in cases:
        r = jax.block_until_ready(f())
        t0 = time.time()
        for _ in range(10):
            r = f()
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 10
        print(f"{name:20s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
