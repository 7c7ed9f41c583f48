"""Config-2 floor sweep: sort_every x pool, one process (shared cache).

The k=3 loss recorded pre-direct-mode (92.49 vs 97.75, RESULTS.md
2026-08-19) may have flipped now that traversal is fused XLA and the
floor is sort-block-dominated.  Usage: python benchmarks/c2_sweep.py
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
    import numpy as np
    from rtjax import RenderConfig
    from rtjax.render import render_frame
    from rtjax.scenes import cornell_planes

    scene, cam = cornell_planes()
    key = jax.random.key(1)
    for pool_log2, k in [(19, 2), (19, 3), (19, 4), (20, 2), (20, 3)]:
        cfg = RenderConfig(width=512, height=512, num_samples=64,
                           max_bounces=10, num_working_paths=1 << pool_log2,
                           sort_every=k)
        fb, stats = render_frame(scene, cam, cfg, key)
        fb.block_until_ready()
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            fb, stats = render_frame(scene, cam, cfg, key)
            _ = float(np.asarray(fb).mean())
            dt = min(dt, time.time() - t0)
        rays = float(np.asarray(stats["rays_traced"]))
        print(f"pool 2^{pool_log2} k={k}: {dt:.3f}s "
              f"{rays / dt / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
