"""Per-iteration cost of the REAL wavefront step on the config-2 scene
(cornell planes, trivial traversal) — the engine-floor workload.

Times ``render_frame`` at ``max_iterations=1`` vs ``max_iterations=1+R``
and differences: per-iteration cost with the actual state distribution,
actual traced trip counts, and no tunnel-dispatch pollution (the whole
frame is one jit).  Ablations toggle one engine feature each, so the
deltas rank the floor's components on hardware.

Usage: python benchmarks/step_anatomy.py [R=64] [pool_log2=17]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
LOG2 = int(sys.argv[2]) if len(sys.argv) > 2 else 17


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

    def timed(name, **kw):
        """median-of-5 per-iteration ms via the (1+R) - (1) difference.
        (min-of-diffs is NOT stall-robust: one tunnel hiccup inside the
        1-iteration window makes a diff negative and the min keeps it.)"""
        base = dict(width=512, height=512, num_samples=64, max_bounces=10,
                    num_working_paths=1 << LOG2)
        base.update(kw)
        c1 = RenderConfig(max_iterations=1, **base)
        cR = RenderConfig(max_iterations=1 + R, **base)
        # compile both programs
        for c in (c1, cR):
            fb, _ = render_frame(scene, cam, c, key)
            fb.block_until_ready()
        diffs = []
        for _ in range(5):
            t0 = time.time()
            fb, _ = render_frame(scene, cam, c1, key)
            _ = float(np.asarray(fb).mean())
            t1 = time.time()
            fb, _ = render_frame(scene, cam, cR, key)
            _ = float(np.asarray(fb).mean())
            t2 = time.time()
            diffs.append(((t2 - t1) - (t1 - t0)) / R)
        med = sorted(diffs)[len(diffs) // 2]
        print(f"{name:40s} {med*1e3:7.3f} ms/iter", flush=True)
        return med

    print(f"config2 scene, pool 2^{LOG2}, R={R}")
    full = timed("default")
    timed("sort_rays=False", sort_rays=False)
    timed("one_sample_mis=True (N anyhit)", one_sample_mis=True)
    timed("shade_chunks=1 (whole-pool shade)", shade_chunks=1)
    timed("camera_order=scan", camera_order="scan")
    timed("max_bounces=0 (gen+cam+trace only)", max_bounces=0)
    print(f"\nfull default per-iteration: {full*1e3:.3f} ms "
          f"(~{(1 << LOG2) / full / 1e6:.1f} Mrays/s ceiling at occupancy 1 "
          "counting path rays only)")


if __name__ == "__main__":
    main()
