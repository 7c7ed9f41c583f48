"""Decompose the per-iteration engine floor (non-traversal work at pool
width) into stage costs, robustly against the remote-TPU tunnel.

Each stage runs R times inside ONE jit via lax.fori_loop with a data
dependency between reps; per-rep cost = (time(R) - time(1)) / (R - 1).
That removes the 1.2-3 ms per-dispatch tunnel overhead that makes
standalone sub-ms timings unrankable (docs/PERF_NOTES.md measurement
rules).  Every timed fn reduces to a scalar in-jit (non-scalar fetches
poison timings at ~100 ms/MB).

Usage: python benchmarks/floor_bench.py [pool_log2=18]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

R = 32


def bench(name, build):
    """build(reps) -> (jitted_fn, args); prints per-rep ms."""
    import numpy as np
    f1, a1 = build(1)
    fR, aR = build(R)
    _ = float(np.asarray(f1(*a1)))   # compile
    _ = float(np.asarray(fR(*aR)))
    best = 1e9
    for _i in range(3):
        t0 = time.time()
        _ = float(np.asarray(f1(*a1)))
        t1 = time.time()
        _ = float(np.asarray(fR(*aR)))
        t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / (R - 1)
        best = min(best, per)
    print(f"{name:44s} {best*1e3:7.3f} ms/iter", flush=True)
    return best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/rtjax-jit-cache-tpu"))
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from rtjax.core import rng as rtrng
    from rtjax.render.sorting import (ray_sort_keys_pos_v3,
                                      sort_pytree_by_key)
    from rtjax.render.wavefront import NUM_RNG_WORDS

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log2
    print(f"pool = 2^{log2} = {n}, reps = {R}")
    key = jax.random.key(0)
    u = jax.random.uniform(key, (8, n))
    o3 = tuple(u[k] for k in range(3))
    d3 = tuple(u[3 + k] - 0.5 for k in range(3))
    mask = u[6] > 0.4
    pix = (u[7] * 65535).astype(jnp.int32)

    # --- the engine's actual sort: keys + 21 f32-ish columns -------------
    def build_sort(reps):
        cols = tuple(u[k % 8] + k for k in range(21))

        @jax.jit
        def f(o3, d3, mask, cols):
            def body(i, c):
                keys = ray_sort_keys_pos_v3(
                    o3, d3, jnp.zeros(3), jnp.ones(3), mask)
                keys = keys ^ i  # rep-dependent, defeats CSE
                out = sort_pytree_by_key(keys, c)
                return out
            out = jax.lax.fori_loop(0, reps, body, cols)
            return sum(jnp.sum(c) for c in out)

        return f, (o3, d3, mask, cols)

    # --- RNG: the iteration's one threefry sweep --------------------------
    def build_rng(reps):
        @jax.jit
        def f(key):
            def body(i, acc):
                return acc + jnp.sum(rtrng.u01(
                    rtrng.bits_block(key, i, NUM_RNG_WORDS, n)))
            return jax.lax.fori_loop(0, reps, body, 0.0)
        return f, (key,)

    # --- framebuffer flush: 4-chunk masked scatter-add ---------------------
    def build_flush(reps):
        fb = jnp.zeros((256 * 256, 3))
        vals = jnp.stack([u[0], u[1], u[2]], axis=-1)

        @jax.jit
        def f(fb, pix, vals):
            def body(i, fb):
                return fb.at[pix ^ i].add(vals, mode="drop")
            return jnp.sum(jax.lax.fori_loop(0, reps, body, fb))
        return f, (fb, pix, vals)

    # --- one pool-width gather (the unit everything is priced in) ---------
    def build_gather(reps):
        tbl = jax.random.uniform(key, (1 << 16, 4))

        @jax.jit
        def f(tbl, pix):
            def body(i, acc):
                return acc + jnp.sum(tbl[(pix ^ i) & 0xFFFF])
            return jax.lax.fori_loop(0, reps, body, 0.0)
        return f, (tbl, pix)

    # --- gen-stage arithmetic (camera rays + ranks + merges) --------------
    def build_gen(reps):
        @jax.jit
        def f(o3, mask):
            def body(i, acc):
                num_mat = jnp.sum(mask).astype(jnp.int32) + i
                rank = jnp.maximum(
                    jnp.arange(n, dtype=jnp.int32) - num_mat, 0)
                cam = rank.astype(jnp.float32) * 1e-6
                out = tuple(jnp.where(mask, c, cam) for c in o3)
                return acc + sum(jnp.sum(c) for c in out)
            return jax.lax.fori_loop(0, reps, body, 0.0)
        return f, (o3, mask)

    bench("sort keys+21 cols", build_sort)
    bench(f"rng bits_block {NUM_RNG_WORDS} words", build_rng)
    bench("fb flush scatter (full width)", build_flush)
    bench("pool-width 4-col gather", build_gather)
    bench("gen arithmetic + 3 selects", build_gen)


if __name__ == "__main__":
    main()
