#!/usr/bin/env python
"""Micro-benchmarks for the relay TPU: gathers, scatters, sorts, scans.

Calibrates the primitive costs that dominate the AprilTag middle pipeline so
perf work targets the real bottlenecks. Queued-N-calls timing (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

B = int(os.environ.get("MB_B", "4"))
K = int(os.environ.get("MB_K", "131072"))
N = 256000  # decimated pixels 640x400


def timeit(name, fn, *args, iters=20):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    l_last = jax.tree_util.tree_leaves(outs[-1])[0]
    l_first = jax.tree_util.tree_leaves(outs[0])[0]
    _ = np.asarray(l_last).ravel()[0]
    _ = np.asarray(l_first).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:48s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"B={B} K={K}")
    kf = jnp.asarray(rng.random((B, K), np.float32))
    kf6 = jnp.asarray(rng.random((B, K, 6), np.float32))
    kf6m = jnp.asarray(rng.random((B, 6, K), np.float32))
    ki = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)
    ki_sorted = jnp.sort(ki, axis=1)
    k2 = jnp.asarray(rng.integers(0, 2**20, (B, K)), jnp.int32)
    nf = jnp.asarray(rng.random((B, N), np.float32))
    nidx = jnp.asarray(rng.integers(0, N, (B, K)), jnp.int32)
    seg = jnp.asarray(np.sort(rng.integers(0, 1025, (B, K)), 1), jnp.int32)

    from ros_vision_tpu.ops.scan import cumsum_mxu

    timeit("sort 1key+1payload (B,K) i32",
           lambda a, p: jax.lax.sort([a, p], dimension=1, num_keys=1,
                                     is_stable=True), k2, ki)
    timeit("sort 2key+1payload (B,K) i32",
           lambda a, b2, p: jax.lax.sort([a, b2, p], dimension=1, num_keys=2,
                                         is_stable=True), k2, k2, ki)
    timeit("sort 1key only (B,K) i32",
           lambda a: jax.lax.sort([a], dimension=1, num_keys=1,
                                  is_stable=True), k2)
    timeit("gather (B,K)f32 by (B,K) rand idx",
           lambda a, i: jnp.take_along_axis(a, i, axis=1), kf, ki)
    timeit("gather (B,K)f32 by (B,K) sorted idx",
           lambda a, i: jnp.take_along_axis(a, i, axis=1), kf, ki_sorted)
    timeit("gather (B,K,6)f32 slice-gather",
           lambda a, i: jnp.take_along_axis(a, i[..., None], axis=1),
           kf6, ki)
    timeit("gather chan-major (B,6,K) bcast idx",
           lambda a, i: jnp.take_along_axis(
               a, jnp.broadcast_to(i[:, None, :], a.shape), axis=2),
           kf6m, ki)
    timeit("gather from image (B,256k) by (B,K)",
           lambda a, i: jnp.take_along_axis(a, i, axis=1), nf, nidx)
    timeit("gather image x4 (grad stencil)",
           lambda a, i: (jnp.take_along_axis(a, i, axis=1)
                         + jnp.take_along_axis(a, i + 1, axis=1)
                         + jnp.take_along_axis(a, i + 2, axis=1)
                         + jnp.take_along_axis(a, i + 3, axis=1)), nf, nidx)
    timeit("scatter set (B,K)->(B,K+1)",
           lambda a, i: jax.vmap(lambda b_, i_, v_: b_.at[i_].set(v_))(
               jnp.zeros((B, K + 1), jnp.float32), a, i.astype(jnp.float32)),
           ki, ki)
    timeit("scatter-add segsum (B,K)->(B,1025)",
           lambda v, s: jax.ops.segment_sum(
               v.reshape(-1),
               (s + jnp.arange(B, dtype=jnp.int32)[:, None] * 1025
                ).reshape(-1), num_segments=B * 1025).reshape(B, 1025),
           kf, seg)
    timeit("scatter-add segsum6 (B,K,6)->(B,1025,6)",
           lambda v, s: jax.ops.segment_sum(
               v.reshape(-1, 6),
               (s + jnp.arange(B, dtype=jnp.int32)[:, None] * 1025
                ).reshape(-1), num_segments=B * 1025).reshape(B, 1025, 6),
           kf6, seg)
    timeit("cumsum_mxu (B,K)", cumsum_mxu, kf)
    timeit("cumsum_mxu (B,6,K)", cumsum_mxu, kf6m)
    timeit("jnp.cumsum (B,K)", lambda a: jnp.cumsum(a, axis=1), kf)
    timeit("gather small (B,1025)->(B,K) monotone seg",
           lambda t, s: jnp.take_along_axis(t, s, axis=1),
           jnp.asarray(rng.random((B, 1025), np.float32)), seg)
    # row-space ops
    R, L = 1024, 128
    rows = jnp.asarray(rng.random((B, R, L), np.float32))
    timeit("top_k k=10 over (B*R,128) rows",
           lambda a: jax.lax.top_k(a.reshape(B * R, L), 10), rows)
    timeit("rows cumsum (B,R,L) last axis",
           lambda a: jnp.cumsum(a, axis=-1), rows)
    timeit("argmin over (B,1025,210)",
           lambda a: jnp.argmin(a, axis=2),
           jnp.asarray(rng.random((B, 1025, 210), np.float32)))


if __name__ == "__main__":
    main()
