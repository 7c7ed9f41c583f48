"""Per-launch floor of the wide traversal kernels: time the SAME compiled
closest-hit / any-hit programs with (a) all rays active, (b) all rays
inactive (every tile's walk exits on entry).  The delta is the actual
traversal work; the idle time is dispatch + per-tile fixed cost, which
bounds what kernel-side optimization can recover.

Usage: python benchmarks/launch_floor.py [pool_log2=17]
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
    from rtjax.kernels.pallas_wide import (wide_traverse_anyhit,
                                           wide_traverse_closest)
    from rtjax.scenes import cornell_bunny

    log2s = [int(a) for a in sys.argv[1:]] or [17]
    scene, _cam = cornell_bunny()
    tables = scene.tables
    print(f"backend = {jax.default_backend()}")

    for log2 in log2s:
        n = 1 << log2
        rng = np.random.default_rng(0)
        o_i = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        o_i[:, 1] += 1.0
        d_i = rng.standard_normal((n, 3)).astype(np.float32)
        d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
        o, d = jnp.asarray(o_i), jnp.asarray(d_i)
        tmax = jnp.full(n, jnp.inf)
        exclude = jnp.full(n, -1, jnp.int32)

        fc = jax.jit(lambda o, d, act: wide_traverse_closest(
            tables, o, d, tmax, act, with_stats=True))
        fa = jax.jit(lambda o, d, act: wide_traverse_anyhit(
            tables, o, d, tmax, exclude, act, with_stats=True))

        for name, f in (("closest", fc), ("anyhit", fa)):
            for act_name, act in (("active", jnp.ones(n, bool)),
                                  ("idle", jnp.zeros(n, bool))):
                t0 = time.time()
                res = f(o, d, act)
                jax.block_until_ready(res)
                compile_s = time.time() - t0
                reps = 30
                t0 = time.time()
                for _ in range(reps):
                    res = f(o, d, act)
                jax.block_until_ready(res)
                dt = (time.time() - t0) / reps
                rounds = int(np.asarray(res[-1][0]))
                visits = int(np.asarray(res[-1][1]))
                print(f"2^{log2} {name:8s} {act_name:7s} {dt*1e3:8.3f} ms  "
                      f"{rounds} rounds + {visits} visits  "
                      f"compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
