"""End-to-end proof of the big-scene tier (round-3 verdict item 7): a
4M-triangle heightfield builds into packed node rows + HBM leaf streaming
+ mirror-lane meta and renders on the Pallas path (the old ceiling was
~2M triangles; beyond it scenes fell to the ~400x slower XLA path).

Measured on one v5e: build 619 s (one-core host), 93k packed rows
(47 MB VMEM), compile+first frame 309 s, then 0.31 s/frame at
128x128@4spp.  Run: python benchmarks/bigscene_proof.py
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rtjax-jit-cache-tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from rtjax import Camera, RenderConfig, SceneBuilder
from rtjax.render import render_frame

t0 = time.time()
# 4M-triangle heightfield: 1415^2 grid, two tris per cell
G = 1415
xs = np.linspace(-2, 2, G, dtype=np.float64)
X, Z = np.meshgrid(xs, xs)
Y = 0.25 * np.sin(3 * X) * np.cos(3 * Z)
V = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
i = np.arange(G - 1)
ii, jj = np.meshgrid(i, i, indexing="ij")
a = (ii * G + jj).ravel(); b_ = a + 1; c = a + G; d = c + 1
F = np.concatenate([np.stack([a, b_, c], 1), np.stack([b_, d, c], 1)])
print(f"tris = {len(F)}", flush=True)

b = SceneBuilder()
b.add_mesh(V, F, b.make_matte((0.6, 0.6, 0.6)))
b.add_area_light((-1, 3, -1), (1, 3, -1), (0, 3, 1), (12., 12., 12.),
                 b.make_matte((0., 0., 0.)))
scene = b.build()
print(f"build {time.time()-t0:.1f}s  tables={scene.tables is not None} "
      f"packed={getattr(scene.tables, 'packed_nodes', None)} "
      f"leaf_hbm={scene.leaf_hbm} meta_vmem={scene.meta_vmem} "
      f"node_rows={scene.tables.node_bounds.shape[0] if scene.tables is not None else 0}",
      flush=True)
assert scene.tables is not None and scene.tables.packed_nodes

cam = Camera.make((0, 2.5, 4.5), (0, 0, 0), (0, 1, 0), 45, 1.0)
cfg = RenderConfig(width=128, height=128, num_samples=4, max_bounces=4)
t0 = time.time()
fb, stats = render_frame(scene, cam, cfg, jax.random.key(1))
m = float(np.asarray(fb).mean())
print(f"compile+first frame {time.time()-t0:.1f}s  fb mean {m:.4f}", flush=True)
t0 = time.time()
fb, stats = render_frame(scene, cam, cfg, jax.random.key(2))
m = float(np.asarray(fb).mean())
rays = float(stats["rays_traced"])
dt = time.time() - t0
print(f"frame {dt:.2f}s  {rays/dt/1e6:.2f} Mrays/s  fb mean {m:.4f}", flush=True)
assert np.isfinite(np.asarray(fb)).all() and m > 0
print("4M-TRI PALLAS PATH OK", flush=True)
