"""Measure the HBM-streamed leaf path vs VMEM-resident on the bunny, and
the detailed-stats counters on config 1 (node rounds / leaf visits per ray).

Usage: python benchmarks/hbm_leaf_bench.py
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
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from rtjax import RenderConfig
    from rtjax.kernels.pallas_wide import (wide_traverse_closest)
    from rtjax.render import render_frame
    from rtjax.scenes import cornell_bunny

    scene, cam = cornell_bunny()
    tables = scene.tables
    interp = jax.default_backend() != "tpu"

    # coherent camera-like rays at the bunny
    n = 1 << 17
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0.0, 1.0, 4.0]], np.float32), (n, 1))
    tgt = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    tgt[:, 1] = tgt[:, 1] * 0.8 + 1.0
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)

    for leaf_hbm in (False, True):
        f = jax.jit(lambda o, d: wide_traverse_closest(
            tables, o, d, tmax, act, interpret=interp, leaf_hbm=leaf_hbm))
        res = f(o, d)
        base = np.asarray(res[0])
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            res = f(o, d)
            _ = np.asarray(res[0])
            dt = min(dt, time.time() - t0)
        print(f"leaf_hbm={leaf_hbm}: {n} coherent rays in {dt*1e3:.2f} ms "
              f"-> {n/dt/1e6:.1f} Mrays/s, hits {int(base.sum())}")

    # counters on config 1
    key = jax.random.key(1)
    cfg = RenderConfig(width=256, height=256, num_samples=16, max_bounces=10,
                       detailed_stats=True)
    fb, st = render_frame(scene, cam, cfg, key)
    fb.block_until_ready()
    t0 = time.time()
    fb, st = render_frame(scene, cam, cfg, key)
    mean = float(np.asarray(fb).mean())
    dt = time.time() - t0
    rays = float(np.asarray(st["rays_traced"]))
    rounds = int(np.asarray(st["node_steps"]))
    leafs = int(np.asarray(st["leaf_visits"]))
    hist = np.asarray(st["bounce_histogram"]).tolist()
    print(f"config1 detailed: {dt:.2f}s {rays:.3g} rays "
          f"({rays/dt/1e6:.2f} Mrays/s incl. stats overhead), mean {mean:.4f}")
    print(f"  walk rounds {rounds} ({rounds*3/rays:.2f} node-steps/ray), "
          f"leaf visits {leafs} ({leafs/rays:.2f}/ray)")
    print(f"  bounce histogram: {hist}")
    # rough time anatomy: a walk round is ~NUM_WALKS scalar steps
    print(f"  if rounds cost ~250ns: {rounds*250e-9:.2f}s of walk; "
          f"if leaf visits ~350ns/tile-visit: {leafs*350e-9:.2f}s of drain")


if __name__ == "__main__":
    main()
