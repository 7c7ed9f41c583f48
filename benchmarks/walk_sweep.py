"""Sweep NUM_WALKS (interleaved walk cursors) on the production closest-hit
kernel.  The walk step is scalar-latency bound (~317 ns/step measured at
NUM_WALKS=3); more cursors overlap more latency chains until register
pressure spills.

Usage: python benchmarks/walk_sweep.py [pool_log2=17] [walks...=2 3 4 6]
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
    import rtjax.kernels.pallas_wide as pw
    from rtjax.scenes import cornell_bunny

    args = [int(a) for a in sys.argv[1:]]
    log2 = args[0] if args else 17
    walks = args[1:] or [2, 3, 4, 6]
    n = 1 << log2
    scene, _cam = cornell_bunny()
    tables = scene.tables
    print(f"pool = 2^{log2}, backend = {jax.default_backend()}")

    rng = np.random.default_rng(0)
    o_i = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o_i[:, 1] += 1.0
    d_i = rng.standard_normal((n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    o, d = jnp.asarray(o_i), jnp.asarray(d_i)
    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)

    ref = None
    for w in walks:
        pw.NUM_WALKS = w
        pw.Q_ALLOC = pw.QUEUE_CAP + w * pw.WIDTH
        jax.clear_caches()
        f = jax.jit(lambda o, d: pw.wide_traverse_closest(
            tables, o, d, tmax, act, with_stats=True))
        t0 = time.time()
        res = f(o, d)
        jax.block_until_ready(res)
        compile_s = time.time() - t0
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            res = f(o, d)
        jax.block_until_ready(res)
        dt = (time.time() - t0) / reps
        rounds = int(np.asarray(res[-1][0]))
        visits = int(np.asarray(res[-1][1]))
        h = np.asarray(res[0])
        if ref is None:
            ref = h
        print(f"walks={w}  {dt*1e3:8.3f} ms  {rounds} rounds "
              f"({rounds * w} steps) + {visits} visits  "
              f"hits match ref: {(h == ref).all()}  "
              f"compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
