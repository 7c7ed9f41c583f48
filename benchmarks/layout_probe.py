"""Probe: does the TPU lane-pad [N,3] arrays to [N,128]?

Times identical elementwise chains over (a) one [N,3] array, (b) three [N]
arrays, (c) one [3,N] array.  If (a) is ~40x slower per element, every
[..., 3] vector array in the engine pays a 128/3 memory bloat and the
engine's SoA should be scalar-per-component.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtjax-jit-cache-tpu")
    import jax.numpy as jnp
    import numpy as np

    n = 1 << 17
    REPS = 100
    key = jax.random.key(0)
    a3 = jax.random.uniform(key, (n, 3))
    a3t = a3.T.copy()
    ax, ay, az = a3[:, 0].copy(), a3[:, 1].copy(), a3[:, 2].copy()
    r = jax.random.uniform(key, (n,))

    def chain(x, rr):
        for _ in range(10):
            x = x * 1.0001 + rr
            x = jnp.where(rr > 0.5, x, -x)
        return x

    @jax.jit
    def f_n3(a, r):
        def body(i, a):
            return chain(a, r[:, None])
        return jax.lax.fori_loop(0, REPS, body, a)

    @jax.jit
    def f_3n(a, r):
        def body(i, a):
            return chain(a, r[None, :])
        return jax.lax.fori_loop(0, REPS, body, a)

    @jax.jit
    def f_soa(x, y, z, r):
        def body(i, c):
            x, y, z = c
            return chain(x, r), chain(y, r), chain(z, r)
        return jax.lax.fori_loop(0, REPS, body, (x, y, z))

    def timeit(name, f, *args):
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.time() - t0) / REPS
        print(f"{name:18s} {dt*1e6:9.1f} us/iter (40 elementwise ops on "
              f"{n}x3)")

    timeit("[N,3] layout", f_n3, a3, r)
    timeit("[3,N] layout", f_3n, a3t, r)
    timeit("3x [N] arrays", f_soa, ax, ay, az, r)

    # and the sort: [N,3] payload vs 3 scalar payloads
    from rtjax.render.sorting import sort_pytree_by_key
    keys = jax.random.randint(key, (n,), 0, 1 << 30)

    @jax.jit
    def s_n3(keys, a):
        def body(i, c):
            k, a = c
            out = sort_pytree_by_key(k, (a,))
            return k, out[0]
        return jax.lax.fori_loop(0, 20, body, (keys, a))

    @jax.jit
    def s_soa(keys, x, y, z):
        def body(i, c):
            k, x, y, z = c
            x, y, z = sort_pytree_by_key(k, (x, y, z))
            return k, x, y, z
        return jax.lax.fori_loop(0, 20, body, (keys, x, y, z))

    def timeit2(name, f, *args):
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        print(f"{name:18s} {(time.time()-t0)/20*1e3:7.3f} ms/sort")

    timeit2("sort [N,3] payload", s_n3, keys, a3)
    timeit2("sort 3x[N] payload", s_soa, keys, ax, ay, az)


if __name__ == "__main__":
    main()
