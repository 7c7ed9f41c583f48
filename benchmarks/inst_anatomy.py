"""Config-4 (instanced) anatomy: per-launch rounds/visits of the two-level
single-launch kernel vs the one-level bunny at the same ray sets, plus a
frame run with detailed stats.  Drives the decision between hierarchical
TLAS culling and distance-ordered instance visiting.

Usage: python benchmarks/inst_anatomy.py
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
    from rtjax.render import render_frame
    from rtjax.kernels.pallas_wide import wide_traverse_closest_inst
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
    assert scene.inst_tables is not None
    cam = Camera.make((0, 4.5, 7.5), (0, 0.6, 0), (0, 1, 0), 40, 1.0)

    # frame with detailed stats
    cfg = RenderConfig(width=256, height=256, num_samples=8, max_bounces=5,
                       detailed_stats=True)
    t0 = time.time()
    fb, st = render_frame(scene, cam, cfg, jax.random.key(1))
    jax.block_until_ready(fb)
    print(f"compile+first {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    fb, st = render_frame(scene, cam, cfg, jax.random.key(1))
    m = float(np.asarray(fb).mean())
    dt = time.time() - t0
    it = int(st["iterations"])
    rays = float(st["rays_traced"])
    print(f"frame {dt:.2f}s {rays/dt/1e6:.2f} Mrays/s  {it} iters  "
          f"node_steps {int(st['node_steps'])} "
          f"leaf_visits {int(st['leaf_visits'])}  mean {m:.4f}", flush=True)

    # standalone launch: camera rays through the instanced kernel
    n = 1 << 17
    ci = (jnp.arange(n) % (256 * 256)) % 256
    cj = (jnp.arange(n) % (256 * 256)) // 256
    o, d = cam.get_rays_v3((ci.astype(jnp.float32) + 0.5) / 256,
                           (cj.astype(jnp.float32) + 0.5) / 256)
    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)
    f = jax.jit(lambda o, d: wide_traverse_closest_inst(
        scene.inst_tables, o, d, tmax, act, with_stats=True))
    res = f(o, d)
    jax.block_until_ready(res)
    t0 = time.time()
    for _ in range(20):
        res = f(o, d)
    jax.block_until_ready(res)
    dt = (time.time() - t0) / 20
    rounds = int(np.asarray(res[-1][0]))
    visits = int(np.asarray(res[-1][1]))
    print(f"inst closest (camera): {dt*1e3:.3f} ms  {rounds} rounds + "
          f"{visits} visits over 64 tiles", flush=True)


if __name__ == "__main__":
    main()
