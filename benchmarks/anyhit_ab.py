"""Any-hit walk schedule A/B: persistent per-sublane walkers vs the
packet kernel, standalone launches AND whole-frame renders.

Round 4 pinned any-hit to the packet kernel on the strength of a
TILE-BARRIER-era lane-walker measurement (benchmarks/lane_vs_packet.py);
the persistent schedule removed exactly that barrier (+12% on closest),
and its per-walker occlusion early-out composes with any-hit (a dry
walker transitions immediately).  This bench re-decides the pin on
hardware (VERDICT r4 next-step #3).

Usage: python benchmarks/anyhit_ab.py [pool_log2=17]
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
    from rtjax import RenderConfig
    from rtjax.kernels.pallas_lane_persist import persist_traverse_anyhit
    from rtjax.kernels.pallas_wide import wide_traverse_anyhit
    from rtjax.render.wavefront import render_frame
    from rtjax.scenes import cornell_bunny

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log2
    scene, cam = cornell_bunny()
    tables = scene.tables
    print(f"pool = 2^{log2}, width = {tables.width}, "
          f"backend = {jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)

    # shadow-ray-like workload: origins on scene surfaces (sampled from
    # triangle midpoints), directions at the area light region — the
    # actual NEE any-hit distribution, mostly occluded or near-miss
    tri_mid = np.asarray(scene.tris.p0) \
        - 0.5 * np.asarray(scene.tris.e1) + 0.5 * np.asarray(scene.tris.e2)
    pick = rng.integers(0, tri_mid.shape[0], n)
    o_s = tri_mid[pick].astype(np.float32)
    light = np.array([0.0, 1.58, 0.0], np.float32)
    d_s = light[None, :] - o_s + rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    d_s /= np.linalg.norm(d_s, axis=1, keepdims=True)

    # incoherent isotropic rays (bounce-like)
    o_i = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o_i[:, 1] += 1.0
    d_i = rng.standard_normal((n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)

    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)
    excl = jnp.full(n, -1, jnp.int32)

    kernels = {
        "packet": lambda o, d: wide_traverse_anyhit(
            tables, o, d, tmax, excl, act, with_stats=True),
        "persist": lambda o, d: persist_traverse_anyhit(
            tables, o, d, tmax, excl, act, with_stats=True),
    }
    rays = {"shadowlike": (o_s, d_s), "incoherent": (o_i, d_i)}
    ref = {}
    for kname, f in kernels.items():
        f = jax.jit(f)
        for rname, (o_np, d_np) in rays.items():
            o, d = jnp.asarray(o_np), jnp.asarray(d_np)
            res = f(o, d)
            jax.block_until_ready(res)
            reps = 10
            t0 = time.time()
            for _ in range(reps):
                res = f(o, d)
            jax.block_until_ready(res)
            dt = (time.time() - t0) / reps
            st = res[-1]
            occ = np.asarray(res[0])
            agree = "" if rname not in ref else \
                f"  occ==packet: {(occ == ref[rname]).all()}"
            ref.setdefault(rname, occ)
            print(f"{kname:8s} {rname:10s} {dt*1e3:8.3f} ms "
                  f"{n/dt/1e6:7.1f} Mrays/s  "
                  f"{int(np.asarray(st[0])):8d} rounds "
                  f"{int(np.asarray(st[1])):8d} visits{agree}", flush=True)

    # ---- whole-frame A/B: the headline bench with each any-hit walker ----
    for ah in ("packet", "persist"):
        cfg = RenderConfig(width=256, height=256, num_samples=64,
                           max_bounces=10, traversal="pallas",
                           anyhit_walker=ah)
        key = jax.random.key(1)
        t0 = time.time()
        fb, stats = render_frame(scene, cam, cfg, key)
        _ = float(np.asarray(fb).mean())
        compile_s = time.time() - t0
        best = float("inf")
        for rep in range(2):
            t0 = time.time()
            fb, stats = render_frame(scene, cam, cfg, jax.random.key(2 + rep))
            _ = float(np.asarray(fb).mean())
            best = min(best, time.time() - t0)
        rays_total = int(stats["rays_traced"])
        print(f"frame anyhit={ah:8s} {best:6.2f} s  "
              f"{rays_total/best/1e6:7.2f} Mrays/s  "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
