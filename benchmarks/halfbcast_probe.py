"""Half-lane broadcast microbench: the cost gate for a sub-row walker.

A 64-lane walker needs per-HALF lane broadcasts (lanes 0-63 read lane k,
lanes 64-127 read lane 64+k of a combined two-node row).  Three candidate
lowerings, timed as walk-round analogs (6 bound values + slab math per
child, 8 children):

  const    — today's full-row broadcast (baseline, serves 1 node/row)
  halfidx  — take_along_axis with the 2-valued index k + 64*(lane>=64)
  2bcast   — two constant broadcasts + one half-mask select per value

If halfidx ~= const, a 64-lane walker's walk round costs ~the same as
today's while serving 2x walkers (narrow_probe measured the round ceiling
at 1.58x).  If only 2bcast works, the round cost grows ~1.6x and the
narrowing win mostly evaporates.

Usage: python benchmarks/halfbcast_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/rtjax-jit-cache-tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SUBLANES = 16
WIDTH = 8


def _slab(b, inv, sc, tmax):
    e0 = b[0] * inv[0] + sc[0]
    e1 = b[1] * inv[1] + sc[1]
    e2 = b[2] * inv[2] + sc[2]
    x0 = b[3] * inv[0] + sc[0]
    x1 = b[4] * inv[1] + sc[1]
    x2 = b[5] * inv[2] + sc[2]
    entry = jnp.maximum(jnp.maximum(jnp.minimum(e0, x0), jnp.minimum(e1, x1)),
                        jnp.minimum(e2, x2))
    exit_ = jnp.minimum(jnp.minimum(jnp.maximum(e0, x0), jnp.maximum(e1, x1)),
                        jnp.maximum(e2, x2))
    return jnp.maximum(entry, 0.0) <= jnp.minimum(exit_, tmax)


def make_kernel(variant, iters):
    def kernel(row_ref, o_ref, out_ref):
        row = row_ref[:, :]
        inv = (o_ref[0:SUBLANES], o_ref[SUBLANES:2 * SUBLANES],
               o_ref[2 * SUBLANES:3 * SUBLANES])
        sc = inv
        tmax = o_ref[0:SUBLANES]
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, 128), 1)
        half64 = jnp.where(lane >= 64, 64, 0)

        def body(i, acc):
            r = row + acc * 1e-30  # data dependence defeats loop hoisting
            total = None
            for c in range(WIDTH):
                vals = []
                for k in range(6 * c, 6 * c + 6):
                    if variant == "const":
                        idx = jnp.full((SUBLANES, 128), k, jnp.int32)
                        v = jnp.take_along_axis(r, idx, axis=1)
                    elif variant == "halfidx":
                        idx = half64 + k
                        v = jnp.take_along_axis(r, idx, axis=1)
                    else:  # 2bcast
                        ia = jnp.full((SUBLANES, 128), k, jnp.int32)
                        ib = jnp.full((SUBLANES, 128), 64 + k, jnp.int32)
                        va = jnp.take_along_axis(r, ia, axis=1)
                        vb = jnp.take_along_axis(r, ib, axis=1)
                        v = jnp.where(lane >= 64, vb, va)
                    vals.append(v)
                h = _slab(vals, inv, sc, tmax)
                total = h.astype(jnp.float32) if total is None \
                    else total + h.astype(jnp.float32)
            return acc + jnp.sum(total)

        out_ref[0] = jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return kernel


def run(variant, iters):
    row = jnp.asarray(np.random.default_rng(0).random((SUBLANES, 128)),
                      jnp.float32)
    o = jnp.asarray(np.random.default_rng(1).random((3 * SUBLANES, 128)),
                    jnp.float32)
    f = jax.jit(lambda r_, o_: pl.pallas_call(
        make_kernel(variant, iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
    )(r_, o_))
    out = f(row, o)
    _ = np.asarray(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(f(row, o))
        dt = min(dt, time.time() - t0)
    return dt


def main():
    print(f"backend = {jax.default_backend()}", flush=True)
    n1, n2 = 20_000, 80_000
    for variant in ("const", "halfidx", "2bcast"):
        try:
            t1 = run(variant, n1)
            t2 = run(variant, n2)
            ns = (t2 - t1) / (n2 - n1) * 1e9
            print(f"{variant:8s} {ns:8.1f} ns/round (8-child walk analog)",
                  flush=True)
        except Exception as e:
            print(f"{variant:8s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
