#!/usr/bin/env python
"""Marginal in-jit op costs: chain N dependent ops inside one jit and
difference against a 1-op chain — removes per-call relay dispatch overhead."""
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

B = int(os.environ.get("MB_B", "1"))
K = int(os.environ.get("MB_K", "131072"))


def timecall(jf, *args, iters=20):
    out = jf(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[0])[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def marginal(name, mk, *args, n1=1, n2=21):
    t1 = timecall(jax.jit(mk(n1)), *args)
    t2 = timecall(jax.jit(mk(n2)), *args)
    print(f"{name:44s} {(t2 - t1) / (n2 - n1):8.4f} ms/op   "
          f"(1op={t1:.2f}ms {n2}op={t2:.2f}ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"B={B} K={K}")
    kf = jnp.asarray(rng.random((B, K), np.float32))
    ki = jnp.asarray(rng.integers(1, K - 1, (B, K)), jnp.int32)
    kf6 = jnp.asarray(rng.random((B, K, 6), np.float32))
    k2 = jnp.asarray(rng.integers(0, 2 ** 20, (B, K)), jnp.int32)
    seg = jnp.asarray(np.sort(rng.integers(0, 1025, (B, K)), 1), jnp.int32)
    tbl = jnp.asarray(rng.random((B, 1025), np.float32))

    def mk_add(n):
        def f(a):
            for _ in range(n):
                a = a * 1.000001 + 0.5
            return a
        return f

    def mk_gather(n):
        def f(a, i):
            for _ in range(n):
                a = jnp.take_along_axis(a, i, axis=1)
            return a
        return f

    def mk_gather6(n):
        def f(a, i):
            for _ in range(n):
                a = jnp.take_along_axis(a, i[..., None], axis=1)
            return a
        return f

    def mk_cumsum(n):
        from ros_vision_tpu.ops.scan import cumsum_mxu

        def f(a):
            for _ in range(n):
                a = cumsum_mxu(a) * 1e-5
            return a
        return f

    def mk_sort(n):
        def f(a, p):
            for _ in range(n):
                a, p = jax.lax.sort([a, p], dimension=1, num_keys=1,
                                    is_stable=True)
                a = a ^ 1
            return a, p
        return f

    def mk_segsum(n):
        def f(v, s):
            acc = 0.0
            for j in range(n):
                acc = acc + jax.ops.segment_sum(
                    (v + j).reshape(-1),
                    (s + jnp.arange(B, dtype=jnp.int32)[:, None] * 1025
                     ).reshape(-1), num_segments=B * 1025)
            return acc
        return f

    def mk_tblgather(n):
        def f(t, s):
            acc = 0.0
            for j in range(n):
                acc = acc + jnp.take_along_axis(t + j, s, axis=1)
            return acc
        return f

    def mk_scatter(n):
        def f(v, i):
            acc = 0.0
            for j in range(n):
                acc = acc + jax.vmap(
                    lambda b_, i_, v_: b_.at[i_].set(v_))(
                        jnp.zeros((B, K + 1), jnp.float32), i,
                        v + j)[:, :K]
            return acc
        return f

    marginal("elementwise fma (B,K)", mk_add, kf, n2=41)
    marginal("gather (B,K) rand", mk_gather, kf, ki)
    marginal("gather (B,K,6) slice", mk_gather6, kf6, ki)
    marginal("gather (B,1025)->(B,K) monotone", mk_tblgather, tbl, seg)
    marginal("scatter set (B,K)", mk_scatter, kf, ki)
    marginal("segment_sum (B,K)->(B,1025)", mk_segsum, kf, seg)
    marginal("cumsum_mxu (B,K)", mk_cumsum, kf)
    marginal("sort 1key+payload (B,K)", mk_sort, k2, ki, n2=11)


if __name__ == "__main__":
    main()
