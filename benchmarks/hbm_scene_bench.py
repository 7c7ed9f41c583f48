"""VMEM-cliff demonstration: a non-instanced mesh too big for VMEM-resident
tables must stay on the Pallas path (leaf_hbm mode) at a rate within 2-3x
of a VMEM-resident scene — not fall to the ~400x slower XLA gather path.

Bakes a grid of bunnies into ONE triangle soup (no instancing):
  - small grid  -> tables fit VMEM (baseline rate)
  - large grid  -> leaf table exceeds VMEM -> auto leaf_hbm

Usage: python benchmarks/hbm_scene_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def build_baked(n_inst):
    import numpy as np
    from rtjax import Camera, SceneBuilder, Transform
    from rtjax.scene.mesh import load_ply
    from rtjax.scene.transform import rotate, scale, translate
    from rtjax.scenes import BUNNY_PLY

    mesh = load_ply(BUNNY_PLY)
    b = SceneBuilder()
    white = b.make_matte((0.73, 0.73, 0.73))
    brown = b.make_matte((0.62, 0.57, 0.54))
    b.add_triangles([-6, 0, 6], [6, 0, 6], [6, 0, -6], white)
    b.add_triangles([-6, 0, 6], [-6, 0, -6], [6, 0, -6], white)
    b.add_area_light((-1, 4.0, -1), (1, 4.0, -1), (1, 4.0, 1),
                     (40, 40, 40), white)
    side = int(np.ceil(np.sqrt(n_inst)))
    rng = np.random.default_rng(3)
    for i in range(n_inst):
        t = Transform(translate(0.0946899, -0.0329874, -0.0587997))
        t.composite(scale(4.0, 4.0, 4.0))
        t.composite(rotate([0, 1, 0], rng.uniform(0, 6.28)))
        t.composite(translate((i % side) * 1.5 - 0.75 * (side - 1), 0.0,
                              (i // side) * 1.5 - 0.75 * (side - 1)))
        b.add_mesh(mesh.vertices, mesh.faces, brown, t)  # BAKED, no BLAS
    t0 = time.time()
    scene = b.build()
    cam = Camera.make((0, 5.5, 9.0), (0, 0.6, 0), (0, 1, 0), 40, 1.0)
    print(f"  {scene.tris.num} tris, leaf_hbm={scene.leaf_hbm}, "
          f"build {time.time()-t0:.1f}s")
    return scene, cam


def run(name, n_inst):
    import jax
    import numpy as np
    from rtjax import RenderConfig
    from rtjax.render import render_frame

    print(f"{name} ({n_inst} baked bunnies):")
    scene, cam = build_baked(n_inst)
    cfg = RenderConfig(width=256, height=256, num_samples=4, max_bounces=5)
    key = jax.random.key(1)
    fb, stats = render_frame(scene, cam, cfg, key)
    _ = float(np.asarray(fb).mean())
    dt = float("inf")
    for _i in range(2):
        t0 = time.time()
        fb, stats = render_frame(scene, cam, cfg, key)
        mean = float(np.asarray(fb).mean())
        dt = min(dt, time.time() - t0)
    rays = float(np.asarray(stats["rays_traced"]))
    print(f"  {dt:.2f}s {rays:.3g} rays -> {rays/dt/1e6:.2f} Mrays/s "
          f"(mean {mean:.4f})")
    return rays / dt / 1e6


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/rtjax-jit-cache-tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    small = run("VMEM-resident", 8)        # ~560k tris, fits VMEM
    big = run("HBM-streamed", 16)          # ~1.1M tris, leaf table > VMEM
    print(f"ratio (VMEM/HBM rate): {small/big:.2f}x "
          f"(target: within 2-3x despite 2x more triangles)")


if __name__ == "__main__":
    main()
