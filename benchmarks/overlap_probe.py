"""Can Mosaic overlap an MXU drain matmul with VPU walk work?

Premise test for a software-pipelined traversal loop (walk chunk N+1's
VPU slab work co-issued with drain chunk N's MXU group matmul): three
kernels loop the same trip count with

  walk   — a 16-child slab step (the width-16 walk round's vector body),
  drain  — one drain-group matmul [256, 128]bf16 @ [128, 2048]bf16 plus
           the light accept math that follows it,
  fused  — both per iteration, data-independent chains.

If slope(fused) ~= max(walk, drain) the MXU work hides under the VPU
work and the pipelined rewrite pays; if slope(fused) ~= walk + drain the
units serialize and the rewrite is pointless.  Numbers are two-point
slopes (dispatch/compile noise cancels; see micro_kernel.py).

Usage: python benchmarks/overlap_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/rtjax-jit-cache-tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SUBLANES = 16
BIG = 3.4e38
N_CHILDREN = 16
AM_ROWS = 256   # one MXU_GROUP of 8 leaves x 32 rows
AM_K = 128


def _bcast(row_b, k):
    return jnp.take_along_axis(row_b, jnp.full(row_b.shape, k, jnp.int32),
                               axis=1)


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


def _walk_body(pb_ref, inv, sc, tmax, i):
    """One width-16 slab round: 96 lane gathers + 16 slab tests + packed
    reductions (mirrors pallas_wide._walk_step's vector body)."""
    row = pb_ref[pl.ds((i * 89) % 1024, 1), :]
    row_b = jnp.broadcast_to(row, (SUBLANES, 128))
    b = tuple(_bcast(row_b, k) for k in range(6 * N_CHILDREN))
    hits = [_slab(b[6 * c:6 * c + 6], inv, sc, tmax)
            for c in range(N_CHILDREN)]
    mask = jnp.int32(0)
    for j in range(N_CHILDREN // 2):
        s = jnp.sum(hits[2 * j].astype(jnp.int32) * 32768
                    + hits[2 * j + 1].astype(jnp.int32))
        mask = mask | ((s >= 32768).astype(jnp.int32) << (2 * j)) \
                    | (((s & 32767) > 0).astype(jnp.int32) << (2 * j + 1))
    return mask


def _drain_body(am_ref, F, best, i):
    """One drain group: matmul + sign-flip accept + running best (mirrors
    the round-3 MXU drain (deleted round 4; PERF_NOTES post-mortem)'s per-group work)."""
    A = am_ref[pl.ds((i % 64) * AM_ROWS, AM_ROWS), :]
    out = jnp.dot(A, F, preferred_element_type=jnp.float32)
    o4 = out.reshape(8, 4, 8, 2048)
    det, tn, un, vn = o4[:, 0], o4[:, 1], o4[:, 2], o4[:, 3]
    s = jnp.where(det < 0.0, -1.0, 1.0)
    adet = det * s
    at_ = tn * s
    au = un * s
    av = vn * s
    bt = jnp.broadcast_to(best.reshape(1, 1, 2048), det.shape)
    h = (au >= 0.0) & (av >= 0.0) & (au + av <= adet) & \
        (at_ > 0.0) & (at_ <= bt * adet)
    tg = jnp.where(h, at_ / adet, BIG).reshape(64, 2048)
    return jnp.minimum(best, jnp.min(tg, axis=0, keepdims=True))


def _call(kernel, *operands):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((2,), jnp.float32),
    )(*operands)


def _operands():
    rng = np.random.default_rng(0)
    pb = jnp.asarray(rng.random((1024, 128)), jnp.float32)
    o = jnp.asarray(rng.random((7, SUBLANES, 128)), jnp.float32)
    am = jnp.asarray(rng.random((64 * AM_ROWS, AM_K)), jnp.bfloat16)
    fm = jnp.asarray(rng.random((AM_K, 2048)), jnp.bfloat16)
    return pb, o, am, fm


def make_walk(n_iters):
    def kernel(pb_ref, o_ref, am_ref, f_ref, out_ref):
        inv = tuple(o_ref[k] for k in range(3))
        sc = tuple(o_ref[k + 3] for k in range(3))
        tmax = o_ref[6]

        def body(c):
            acc, i = c
            return acc + _walk_body(pb_ref, inv, sc, tmax, i), i + 1

        acc, _ = jax.lax.while_loop(lambda c: c[1] < n_iters, body,
                                    (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = acc.astype(jnp.float32)
        out_ref[1] = 0.0

    f = jax.jit(lambda *a: _call(kernel, *a))
    return f, _operands()


def make_drain(n_iters):
    def kernel(pb_ref, o_ref, am_ref, f_ref, out_ref):
        F = f_ref[:]

        def body(c):
            best, i = c
            return _drain_body(am_ref, F, best, i), i + 1

        best, _ = jax.lax.while_loop(
            lambda c: c[1] < n_iters, body,
            (jnp.full((1, 2048), BIG, jnp.float32), jnp.int32(0)))
        out_ref[0] = jnp.min(best)
        out_ref[1] = 0.0

    f = jax.jit(lambda *a: _call(kernel, *a))
    return f, _operands()


def make_fused(n_iters):
    def kernel(pb_ref, o_ref, am_ref, f_ref, out_ref):
        inv = tuple(o_ref[k] for k in range(3))
        sc = tuple(o_ref[k + 3] for k in range(3))
        tmax = o_ref[6]
        F = f_ref[:]

        def body(c):
            acc, best, i = c
            m = _walk_body(pb_ref, inv, sc, tmax, i)
            best = _drain_body(am_ref, F, best, i)
            return acc + m, best, i + 1

        acc, best, _ = jax.lax.while_loop(
            lambda c: c[2] < n_iters, body,
            (jnp.int32(0), jnp.full((1, 2048), BIG, jnp.float32),
             jnp.int32(0)))
        out_ref[0] = acc.astype(jnp.float32)
        out_ref[1] = jnp.min(best)

    f = jax.jit(lambda *a: _call(kernel, *a))
    return f, _operands()


def main():
    from micro_kernel import bench_slope
    for name, mk in (("walk16 round", make_walk),
                     ("drain group (matmul+accept)", make_drain),
                     ("fused (independent chains)", make_fused)):
        ns = bench_slope(mk, n1=8_000)
        print(f"{name:32s} {ns:8.1f} ns/iter", flush=True)


if __name__ == "__main__":
    main()
