"""Verdict-r2 #5 evidence: node visits per ray, bounce vs camera rays.

Runs config-1 (bunny) with max_bounces=0 (pure camera rays) and with the
full bounce budget, both with detailed stats; the bounce-ray share is the
difference.  Bar: bounce visits/ray within 2x of camera visits/ray.

Usage: python benchmarks/bounce_visits.py [sort_key ...]
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
    from rtjax.scenes import cornell_bunny

    keys = sys.argv[1:] or ["morton_pos"]
    scene, cam = cornell_bunny()
    jkey = jax.random.key(1)

    for sk in keys:
        out = {}
        for name, bounces in (("camera", 0), ("full", 10)):
            cfg = RenderConfig(width=256, height=256, num_samples=16,
                               max_bounces=bounces, detailed_stats=True,
                               sort_key=sk,
                               walker=os.environ.get("BENCH_WALKER", "auto"))
            fb, st = render_frame(scene, cam, cfg, jkey)
            jax.block_until_ready(fb)
            t0 = time.time()
            fb, st = render_frame(scene, cam, cfg, jkey)
            rays = float(np.asarray(st["rays_traced"]))
            dt = time.time() - t0
            steps = int(np.asarray(st["node_steps"]))
            visits = int(np.asarray(st["leaf_visits"]))
            out[name] = (rays, steps, visits, dt)
            print(f"[{sk}] {name:6s} rays {rays:.3e}  rounds {steps}  "
                  f"leaf visits {visits}  {dt:.2f}s "
                  f"({rays/dt/1e6:.2f} Mrays/s)", flush=True)
        (rc, sc_, vc, _), (rf, sf, vf, _) = out["camera"], out["full"]
        rb, sb, vb = rf - rc, sf - sc_, vf - vc
        print(f"[{sk}] per-1k-ray: camera rounds {sc_/rc*1e3:.2f} visits "
              f"{vc/rc*1e3:.2f} | bounce rounds {sb/max(rb,1)*1e3:.2f} "
              f"visits {vb/max(rb,1)*1e3:.2f} | ratio rounds "
              f"{(sb/max(rb,1))/(sc_/rc):.2f}x visits "
              f"{(vb/max(rb,1))/(vc/rc):.2f}x", flush=True)


if __name__ == "__main__":
    main()
