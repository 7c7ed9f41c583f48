"""Lane walker (per-sublane independent traversal) vs packet kernel,
standalone closest-hit/any-hit launches on coherent and incoherent rays.

The lane walker exists to beat the packet kernel on INCOHERENT (bounce)
rays, where the 2048-ray packet union costs 14.2x the walk rounds of a
camera tile (bounce_visits.py, round 3).  This bench ranks the two on
the bunny scene with both ray classes and prints work counters.

Usage: python benchmarks/lane_vs_packet.py [pool_log2=17]
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
    from rtjax.kernels.pallas_lane import (lane_traverse_anyhit,
                                           lane_traverse_closest)
    from rtjax.kernels.pallas_wide import (wide_traverse_anyhit,
                                           wide_traverse_closest)
    from rtjax.scenes import cornell_bunny

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log2
    scene, cam = cornell_bunny()
    tables = scene.tables
    print(f"pool = 2^{log2}, width = {tables.width}, "
          f"backend = {jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)

    # incoherent: random box origins + isotropic directions (the round-3
    # measurement class: packet closest = 5.01 ms at 2^17, 8-wide)
    o_i = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o_i[:, 1] += 1.0
    d_i = rng.standard_normal((n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)

    # coherent: camera rays in blocked pixel order (a frame's gen tiles)
    side = int(np.sqrt(n))
    ys, xs = np.divmod(np.arange(side * side), side)
    bk = ((ys // 16) * (side // 16) + (xs // 16)) * 256 \
        + (ys % 16) * 16 + (xs % 16)
    order = np.argsort(bk, kind="stable")
    u = ((xs[order] + 0.5) / side).astype(np.float32)
    v = ((ys[order] + 0.5) / side).astype(np.float32)
    reps = -(-n // (side * side))
    u = np.tile(u, reps)[:n]
    v = np.tile(v, reps)[:n]
    oc, dc = cam.get_rays(jnp.asarray(u), jnp.asarray(v))
    o_c = np.asarray(oc, np.float32)
    d_c = np.asarray(dc, np.float32)

    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)
    excl = jnp.full(n, -1, jnp.int32)

    kernels = {
        "packet": (
            lambda o, d: wide_traverse_closest(tables, o, d, tmax, act,
                                               with_stats=True),
            lambda o, d: wide_traverse_anyhit(tables, o, d, tmax, excl, act,
                                              with_stats=True)),
        "lane": (
            lambda o, d: lane_traverse_closest(tables, o, d, tmax, act,
                                               with_stats=True),
            lambda o, d: lane_traverse_anyhit(tables, o, d, tmax, excl, act,
                                              with_stats=True)),
    }

    rays = {"coherent": (o_c, d_c), "incoherent": (o_i, d_i)}
    ref = {}
    for kname, (fc, fa) in kernels.items():
        fc = jax.jit(fc)
        fa = jax.jit(fa)
        for rname, (o_np, d_np) in rays.items():
            o, d = jnp.asarray(o_np), jnp.asarray(d_np)
            for mode, f in (("closest", fc), ("anyhit", fa)):
                t0 = time.time()
                res = f(o, d)
                jax.block_until_ready(res)
                compile_s = time.time() - t0
                reps_t = 10
                t0 = time.time()
                for _ in range(reps_t):
                    res = f(o, d)
                jax.block_until_ready(res)
                dt = (time.time() - t0) / reps_t
                st = res[-1]
                rounds = int(np.asarray(st[0]))
                visits = int(np.asarray(st[1]))
                dr = f" {int(np.asarray(st[2])):6d} drains" \
                    if len(st) > 2 else ""
                if mode == "closest":
                    h = np.asarray(res[0])
                    key = (rname, "hits")
                    agree = "" if key not in ref else \
                        f"  hits==packet: {(h == ref[key]).all()}"
                    ref.setdefault(key, h)
                else:
                    occ = np.asarray(res[0] if not isinstance(res, tuple)
                                     or len(res) == 2 else res[0])
                    key = (rname, "occ")
                    agree = "" if key not in ref else \
                        f"  occ==packet: {(occ == ref[key]).all()}"
                    ref.setdefault(key, occ)
                print(f"{kname:6s} {rname:10s} {mode:7s} "
                      f"{dt*1e3:8.3f} ms  {n/dt/1e6:7.1f} Mrays/s  "
                      f"{rounds:8d} rounds {visits:8d} visits{dr}  "
                      f"compile {compile_s:.0f}s{agree}", flush=True)


if __name__ == "__main__":
    main()
