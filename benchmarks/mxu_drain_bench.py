"""MXU group-drain vs VPU leaf drain on the bunny scene (closest-hit).

Measures wide_traverse_closest with mxu_drain on/off for coherent
(camera-like) and incoherent (random-sphere) ray pools, and checks hit /
prim / t parity between the two drains.

Usage: python benchmarks/mxu_drain_bench.py [pool_log2=17]
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
    from rtjax.kernels.pallas_wide import wide_traverse_closest
    from rtjax.scenes import cornell_bunny

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log2
    scene, cam = cornell_bunny(mxu_tables=True)
    tables = scene.tables
    interp = jax.default_backend() != "tpu"
    print(f"pool = 2^{log2} = {n}, backend = {jax.default_backend()}")
    print(f"amat = {None if tables.leaf_amat is None else tables.leaf_amat.shape}")

    rng = np.random.default_rng(0)
    # coherent camera-like rays at the bunny
    o_c = np.tile(np.array([[0.0, 1.0, 4.0]], np.float32), (n, 1))
    tgt = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    tgt[:, 1] = tgt[:, 1] * 0.8 + 1.0
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
    # incoherent bounce-like rays: origins on the walls, random directions
    o_i = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o_i[:, 1] += 1.0
    d_i = rng.standard_normal((n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)

    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)

    results = {}
    for name, o, d in (("coherent", o_c, d_c), ("incoherent", o_i, d_i)):
        o, d = jnp.asarray(o), jnp.asarray(d)
        for mxu in (False, True):
            f = jax.jit(lambda o, d, mxu=mxu: wide_traverse_closest(
                tables, o, d, tmax, act, interpret=interp, mxu_drain=mxu,
                with_stats=True))
            t0 = time.time()
            res = f(o, d)
            jax.block_until_ready(res)
            compile_s = time.time() - t0
            reps = 3 if interp else 20
            t0 = time.time()
            for _ in range(reps):
                res = f(o, d)
            jax.block_until_ready(res)
            dt = (time.time() - t0) / reps
            results[(name, mxu)] = res
            rounds = int(np.asarray(res[-1][0]))
            visits = int(np.asarray(res[-1][1]))
            print(f"{name:10s} mxu={int(mxu)}  {dt*1e3:8.3f} ms "
                  f"({n/dt/1e6:7.1f} Mrays/s)  {rounds} rounds + "
                  f"{visits} leaf visits "
                  f"({dt/max(visits,1)*1e9:.0f} ns/visit)  "
                  f"compile {compile_s:.1f}s")

        a, m = results[(name, False)], results[(name, True)]
        ha, hm = np.asarray(a[0]), np.asarray(m[0])
        agree = (ha == hm).mean()
        msk = ha & hm
        pa, pm = np.asarray(a[2])[msk], np.asarray(m[2])[msk]
        dt_rel = np.abs(np.asarray(m[1])[msk] - np.asarray(a[1])[msk]) / \
            np.maximum(np.asarray(a[1])[msk], 1e-6)
        print(f"  parity: hit agree {agree:.6f}, prim agree "
              f"{(pa == pm).mean():.6f}, max t rel-delta {dt_rel.max():.2e}")


if __name__ == "__main__":
    main()
