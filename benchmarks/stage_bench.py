"""Per-stage cost microbenchmarks for the wavefront engine's non-traversal
work at pool width: the multi-payload sort, the RNG sweep, the framebuffer
scatter, and a fused shading-math stand-in.  Run on the TPU to see where
the per-iteration engine floor (total frame time minus kernel time) goes.

Usage: python benchmarks/stage_bench.py [pool_log2=17]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def timeit(name, f, *args, reps=20):
    """Times a jitted fn that returns a SCALAR.  Fetching any non-scalar
    output through the remote-TPU tunnel costs ~100 ms/MB and poisons the
    timing, so every benched fn below reduces to a scalar in-jit."""
    import numpy as np
    out = f(*args)
    _ = float(np.asarray(out))
    t0 = time.time()
    for _i in range(reps):
        out = f(*args)
    _ = float(np.asarray(out))
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1e3:7.3f} ms", flush=True)
    return dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/rtjax-jit-cache-tpu"))
    import jax.numpy as jnp
    import numpy as np
    from rtjax.core import rng as rtrng
    from rtjax.render.sorting import ray_sort_keys, sort_pytree_by_key

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log2
    print(f"pool = 2^{log2} = {n}")
    key = jax.random.key(0)
    r = jax.random.uniform(key, (n,))
    o = jax.random.uniform(key, (n, 3))
    d = jax.random.normal(key, (n, 3))
    pix = jnp.arange(n, dtype=jnp.int32) % (256 * 256)
    fb = jnp.zeros((256 * 256, 3))
    mask = r > 0.5

    # the iteration's one sort: keys + 11-payload variadic sort
    bundle = (pix, o, d, r, d, pix, pix, pix, o, o, mask)

    @jax.jit
    def full_sort(o, d, mask, bundle):
        keys = ray_sort_keys(o, d, jnp.zeros(3), jnp.ones(3), mask)
        out = sort_pytree_by_key(keys, bundle)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    @jax.jit
    def keys_only(o, d, mask):
        return jnp.sum(ray_sort_keys(o, d, jnp.zeros(3), jnp.ones(3),
                                     mask).astype(jnp.float32))

    @jax.jit
    def rng_sweep(key):
        return jnp.sum(rtrng.uniform_block(key, 3, 16, n))

    @jax.jit
    def fb_scatter(fb, pix, o, mask):
        return jnp.sum(
            fb.at[pix].add(jnp.where(mask[:, None], o, 0.0), mode="drop"))

    @jax.jit
    def cumsum_rank(mask):
        return jnp.sum(jnp.cumsum(mask) - mask)

    @jax.jit
    def shading_standin(o, d, r):
        # ~40 fused elementwise vector ops at pool width, a stand-in for the
        # mat-stage BSDF/NEE math
        x = o
        for _ in range(10):
            x = x * d + r[:, None]
            x = jnp.where(r[:, None] > 0.5, x, -x)
        return jnp.sum(x)

    timeit("multi-payload sort (keys+11 col)", full_sort, o, d, mask, bundle)

    # sort cost scaling in operand count (the engine sorts ~21 columns)
    for ncols in (2, 6, 21):
        cols = tuple(r + i for i in range(ncols))

        @jax.jit
        def sort_n(o, d, mask, cols):
            keys = ray_sort_keys(o, d, jnp.zeros(3), jnp.ones(3), mask)
            out = jax.lax.sort((keys,) + cols, num_keys=1, is_stable=True)
            return sum(jnp.sum(c) for c in out[1:])

        timeit(f"sort keys+{ncols} f32 cols", sort_n, o, d, mask, cols)
    timeit("sort keys only", keys_only, o, d, mask)
    timeit("rng uniform_block 16 sites", rng_sweep, key)
    timeit("fb scatter-add", fb_scatter, fb, pix, o, mask)
    timeit("cumsum rank", cumsum_rank, mask)
    timeit("40-op fused elementwise", shading_standin, o, d, r)

    # dispatch overhead probe: a minimal pallas launch through the tunnel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def nop_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    x = jnp.zeros((16, 128), jnp.float32)

    @jax.jit
    def nop_launch(x):
        return jnp.sum(pl.pallas_call(
            nop_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        )(x))

    timeit("no-op pallas launch", nop_launch, x)


if __name__ == "__main__":
    main()
