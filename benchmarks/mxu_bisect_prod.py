"""Bisect the production MXU drain cost IN CONTEXT (inside the real wide
closest-hit kernel), by monkeypatching _mxu_drain_loop with pieces
disabled.  The standalone microbenches (micro_kernel.py mxu_hbm_*) say a
group should cost ~1.2 us; in the production kernel it measures ~6x that —
this finds where the extra time goes.

Variants (timing-only; 'nowait'/'nomm' produce garbage hits by design):
  full     current production drain
  noext    matmul + waits, extraction replaced by 2 vector mins
  nomm     waits + extraction on a broadcast stand-in (no MXU pass)
  nowait   matmul + extraction, semaphore waits skipped
  empty    drain loop returns immediately (walk + enqueue-DMA cost only)
  off      VPU drain baseline (mxu_drain=False)

Usage: python benchmarks/mxu_bisect_prod.py [pool_log2=17] [variants...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def make_variant(pw, jnp, jax, pl, *, extract=True, matmul=True, wait=True,
                 empty=False):
    G = pw.MXU_GROUP
    AM_ROWS, TILE, BIG, SUBLANES = pw.AM_ROWS, pw.TILE, pw.BIG, pw.SUBLANES
    MAX_LEAF = pw.MAX_LEAF

    def _mxu_drain_loop(q_ref, am_hbm, F96, gbuf, sems):
        def loop(qn, tmax, ds):
            if empty:
                return tmax, ds
            ng = (qn + G - 1) // G

            def body(c2):
                gi, (best_t, best_hid) = c2
                if wait:
                    for j in range(G):
                        @pl.when(gi * G + j < qn)
                        def _(j=j):
                            pw._mxu_dma(q_ref, am_hbm, gbuf, sems,
                                        gi * G + j).wait()
                A = gbuf[pl.ds(gi * G * AM_ROWS, G * AM_ROWS), :]
                if matmul:
                    out = jnp.dot(A, F96,
                                  preferred_element_type=jnp.float32)
                else:
                    out = jnp.broadcast_to(A[:, :1].astype(jnp.float32),
                                           (G * AM_ROWS, TILE))
                if extract:
                    o4 = out.reshape(G, 4, MAX_LEAF, TILE)
                    det, tn, un, vn = o4[:, 0], o4[:, 1], o4[:, 2], o4[:, 3]
                    s = jnp.where(det < 0.0, -1.0, 1.0)
                    adet = det * s
                    at_ = tn * s
                    au = un * s
                    av = vn * s
                    bt = jnp.broadcast_to(best_t.reshape(1, 1, TILE),
                                          det.shape)
                    h = (au >= 0.0) & (av >= 0.0) & (au + av <= adet) & \
                        (at_ > 0.0) & (at_ <= bt * adet)
                    live = jax.lax.broadcasted_iota(
                        jnp.int32, h.shape, 0) < (qn - gi * G)
                    h = h & live
                    tg = jnp.where(h, at_ / adet,
                                   BIG).reshape(G * MAX_LEAF, TILE)
                    visit_t = jnp.min(tg, axis=0, keepdims=True)
                    rows_i = jax.lax.broadcasted_iota(jnp.int32, tg.shape, 0)
                    sgl = jnp.min(jnp.where(tg <= visit_t, rows_i,
                                            G * MAX_LEAF),
                                  axis=0, keepdims=True)
                    hid = jnp.zeros_like(sgl)
                    for j in range(G):
                        qi = jnp.minimum(gi * G + j, qn - 1)
                        row = q_ref[qi] >> 4
                        hid = jnp.where(sgl >> 3 == j,
                                        row * MAX_LEAF + (sgl - j * MAX_LEAF),
                                        hid)
                    improved = visit_t < best_t
                    best_t = jnp.where(improved, visit_t, best_t)
                    best_hid = jnp.where(improved, hid, best_hid)
                else:
                    best_t = jnp.minimum(best_t, out[:1] + BIG)
                    best_t = jnp.minimum(best_t, out[1:2] + BIG)
                return gi + 1, (best_t, best_hid)

            _, ds = jax.lax.while_loop(lambda c2: c2[0] < ng, body,
                                       (jnp.int32(0), ds))
            tmax = jnp.where(ng > 0, ds[0].reshape(SUBLANES, 128), tmax)
            return tmax, ds

        return loop

    return _mxu_drain_loop


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/rtjax-jit-cache-tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    import rtjax.kernels.pallas_wide as pw
    from rtjax.scenes import cornell_bunny

    args = sys.argv[1:]
    log2 = int(args[0]) if args and args[0].isdigit() else 17
    names = [a for a in args if not a.isdigit()] or \
        ["off", "empty", "nowait", "nomm", "noext", "full"]
    n = 1 << log2
    scene, _cam = cornell_bunny(mxu_tables=True)
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

    variants = {
        "full": dict(),
        "noext": dict(extract=False),
        "nomm": dict(matmul=False),
        "nowait": dict(wait=False),
        "empty": dict(empty=True),
    }

    # 'nowait'/'empty' skip semaphore waits, so they must not START DMAs
    # either (an unawaited DMA at kernel end aborts the TPU backend)
    class _NoDma:
        def start(self):
            pass

        def wait(self):
            pass

    orig = pw._mxu_drain_loop
    orig_dma = pw._mxu_dma
    for name in names:
        mxu = name != "off"
        pw._mxu_dma = orig_dma
        if mxu:
            if not variants[name].get("wait", True) or \
                    variants[name].get("empty", False):
                pw._mxu_dma = lambda *a, **k: _NoDma()
            pw._mxu_drain_loop = make_variant(pw, jnp, jax, pl,
                                              **variants[name])
        jax.clear_caches()
        f = jax.jit(lambda o, d: pw.wide_traverse_closest(
            tables, o, d, tmax, act, mxu_drain=mxu, with_stats=True))
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
        print(f"{name:7s} {dt*1e3:8.3f} ms  {rounds} rounds + {visits} "
              f"visits  compile {compile_s:.0f}s", flush=True)
        pw._mxu_drain_loop = orig
        pw._mxu_dma = orig_dma


if __name__ == "__main__":
    main()
