#!/usr/bin/env python
"""Round-2 TPU microbench: marginal in-jit costs of the MXU one-hot kernels
vs the XLA ops they replace, plus flood-vs-hybrid CCL on the bench scene."""
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
S = 1025


def timecall(jf, *args, iters=20):
    out = jf(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[0])[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def marginal(name, mk, *args, n1=1, n2=9):
    t1 = timecall(jax.jit(mk(n1)), *args)
    t2 = timecall(jax.jit(mk(n2)), *args)
    print(f"{name:40s} {(t2 - t1) / (n2 - n1):8.4f} ms/op   "
          f"(1op={t1:.2f}ms {n2}op={t2:.2f}ms)", flush=True)


def main():
    from ros_vision_tpu.ops import gather_pallas as gp
    rng = np.random.default_rng(0)
    print(f"B={B} K={K}", flush=True)
    tbl = jnp.asarray(rng.random((B, S, 4), np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, S, (B, K)), 1), jnp.int32)

    def mk_take_cm(n):
        def f(t, s):
            acc = 0.0
            for j in range(n):
                acc = acc + gp.table_take_cm(t + j, s)
            return acc
        return f

    def mk_take_xla(n):
        def f(t, s):
            acc = 0.0
            for j in range(n):
                acc = acc + jnp.moveaxis(jnp.take_along_axis(
                    t + j, s[..., None], axis=1), -1, 1)
            return acc
        return f

    def mk_hist_mxu(n):
        def f(s):
            acc = 0
            for j in range(n):
                acc = acc + gp.value_histogram(s ^ j, S)
            return acc
        return f

    def mk_hist_xla(n):
        def f(s):
            acc = 0
            for j in range(n):
                acc = acc + jax.vmap(
                    lambda v: jnp.zeros((S + 1,), jnp.int32).at[
                        jnp.clip(v, 0, S)].add(1))(s ^ j)[:, :S]
            return acc
        return f

    marginal("take_cm MXU (B,S,4)@(B,K)", mk_take_cm, tbl, seg)
    marginal("take_along_axis XLA (B,S,4)@(B,K)", mk_take_xla, tbl, seg)
    marginal("histogram MXU (B,K)->(B,S)", mk_hist_mxu, seg)
    marginal("histogram XLA scatter (B,K)->(B,S)", mk_hist_xla, seg)

    # CCL comparison on the bench scene
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, threshold as thr
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    threshim = jax.block_until_ready(thr.adaptive_threshold(
        thr.decimate2(g))[0])

    t0 = time.perf_counter()
    ph, sh, rh = jax.block_until_ready(ccl.label_components_hybrid(threshim))
    print(f"hybrid compile {time.perf_counter()-t0:.1f}s "
          f"{timecall(ccl.label_components_hybrid, threshim):8.2f} ms",
          flush=True)
    t0 = time.perf_counter()
    pf, sf, rf = jax.block_until_ready(ccl.label_components_flood(threshim))
    print(f"flood  compile {time.perf_counter()-t0:.1f}s "
          f"{timecall(ccl.label_components_flood, threshim):8.2f} ms "
          f"parity p={bool(jnp.all(pf == ph))} s={bool(jnp.all(sf == sh))} "
          f"r={bool(jnp.all(rf == rh))}", flush=True)


if __name__ == "__main__":
    main()
