"""Union-narrowing probe: would walkers narrower than 128 rays help?

The persist walker locksteps 128 rays per cursor and pays their UNION of
node visits.  Before building a sub-row (64-lane) walker, measure the
narrowing factor directly: run the SAME sorted ray population at full
row occupancy (128 rays/walker-row) and at half occupancy (64 live +
64 dead lanes per row, twice the rows).  With R_full / R_half lockstep
rounds, a hypothetical half-lane walker (two walkers per row advancing
in one round) would spend ~R_half/2 round-equivalents: its speedup
ceiling on the walk phase is 2 * R_full / R_half.  R_half == R_full
means perfectly disjoint halves (ceiling 2x); R_half == 2 * R_full
means no narrowing at all (ceiling 1x).

Usage: python benchmarks/narrow_probe.py [pool_log2=17]
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
    from rtjax.kernels.pallas_lane_persist import persist_traverse_closest
    from rtjax.render.sorting import ray_sort_keys_pos_v3
    from rtjax.scenes import cornell_bunny

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log2
    scene, _ = cornell_bunny()
    tables = scene.tables
    print(f"pool = 2^{log2}, width = {tables.width}, "
          f"backend = {jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    # bounce-like rays: origins on the scene's surfaces, cosine-ish dirs
    tri_mid = np.asarray(scene.tris.p0) \
        - 0.5 * np.asarray(scene.tris.e1) + 0.5 * np.asarray(scene.tris.e2)
    pick = rng.integers(0, tri_mid.shape[0], n)
    o = tri_mid[pick].astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    # sort by the engine's production key (morton_pos)
    lo, hi = np.asarray(scene.bvh.bmin[0]), np.asarray(scene.bvh.bmax[0])
    ov = tuple(jnp.asarray(o[:, k]) for k in range(3))
    dv = tuple(jnp.asarray(d[:, k]) for k in range(3))
    keys = ray_sort_keys_pos_v3(ov, dv, jnp.asarray(lo), jnp.asarray(hi),
                                jnp.ones(n, bool))
    order = np.asarray(jnp.argsort(keys))
    o, d = o[order], d[order]

    tm = jnp.full(n, jnp.inf)

    def run(o_j, d_j, act, label):
        f = jax.jit(lambda o_, d_, a_: persist_traverse_closest(
            tables, o_, d_, jnp.full(o_.shape[0], jnp.inf), a_,
            with_stats=True))
        res = f(o_j, d_j, act)
        jax.block_until_ready(res)
        t0 = time.time()
        for _ in range(10):
            res = f(o_j, d_j, act)
        jax.block_until_ready(res)
        dt = (time.time() - t0) / 10
        st = res[-1]
        rounds = int(np.asarray(st[0]))
        visits = int(np.asarray(st[1]))
        print(f"{label:18s} {dt*1e3:8.3f} ms  rounds {rounds:8d}  "
              f"visits {visits:8d}", flush=True)
        return rounds, visits, dt

    # full occupancy
    r_full, v_full, _ = run(jnp.asarray(o), jnp.asarray(d),
                            jnp.ones(n, bool), "full (128/row)")

    def spread(width_live):
        """Rows of `width_live` live rays + dead padding to 128."""
        rows = n // width_live
        o2 = np.zeros((rows, 128, 3), np.float32)
        d2 = np.ones((rows, 128, 3), np.float32)
        a2 = np.zeros((rows, 128), bool)
        o2[:, :width_live] = o.reshape(rows, width_live, 3)
        d2[:, :width_live] = d.reshape(rows, width_live, 3)
        a2[:, :width_live] = True
        return (jnp.asarray(o2.reshape(-1, 3)), jnp.asarray(d2.reshape(-1, 3)),
                jnp.asarray(a2.reshape(-1)))

    for w in (64, 32):
        o_h, d_h, a_h = spread(w)
        r_h, v_h, _ = run(o_h, d_h, a_h, f"spread ({w}/row)")
        k = 128 // w
        print(f"  -> narrowing R_{w} / R_full = {r_h / r_full:.3f}; "
              f"{w}-lane walker walk-phase ceiling ~= "
              f"{k * r_full / r_h:.2f}x", flush=True)


if __name__ == "__main__":
    main()
