#!/usr/bin/env python
"""Decompose boundary_points cost on TPU: mask/key images, stage-A compact
(the (B, N) scatter), stage-B compact, final gather."""
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


def timecall(jf, *args, iters=20):
    out = jf(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[0])[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, quadfit, segments as segs
    from ros_vision_tpu.ops import threshold as thr
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
    _, _, ranks = jax.block_until_ready(
        ccl.label_components_flood(threshim))
    cfg = quadfit.QuadFitConfig()
    jb = jax.jit(lambda t, r: quadfit.boundary_points(t, r, cfg))
    jax.block_until_ready(jb(threshim, ranks))
    print(f"boundary full: {timecall(jb, threshim, ranks):7.2f} ms",
          flush=True)

    b, h, w = threshim.shape
    n = h * w
    rng = np.random.default_rng(0)
    validf = jnp.asarray(rng.random((b, n)) < 0.05)
    pay = jnp.asarray(rng.integers(0, 1 << 20, (b, n)), jnp.int32)
    p_cap = cfg.max_boundary_pixels
    jc = jax.jit(lambda v, p: segs.compact(v, {"pm": p}, p_cap,
                                           {"pm": jnp.int32(-1)}))
    jax.block_until_ready(jc(validf, pay))
    print(f"compact (B,N)->{p_cap}: {timecall(jc, validf, pay):7.2f} ms",
          flush=True)

    from ros_vision_tpu.ops.scan import cumsum_mxu
    jcs = jax.jit(lambda v: cumsum_mxu(v.astype(jnp.float32), binary=True))
    jax.block_until_ready(jcs(validf))
    print(f"  cumsum part: {timecall(jcs, validf):7.2f} ms", flush=True)

    def scat(v, p):
        pos = cumsum_mxu(v.astype(jnp.float32),
                         binary=True).astype(jnp.int32) - 1
        idx = jnp.where(v & (pos < p_cap), pos, p_cap)
        buf = jnp.full((b, p_cap + 1), -1, jnp.int32)
        return jax.vmap(lambda bf, ix, a: bf.at[ix].set(a))(buf, idx, p)

    jsc = jax.jit(scat)
    jax.block_until_ready(jsc(validf, pay))
    print(f"  cumsum+scatter: {timecall(jsc, validf, pay):7.2f} ms",
          flush=True)

    # final key gather (B, 4N) table at (B, K) indices
    K = cfg.max_points
    tab = jnp.asarray(rng.integers(0, 1 << 22, (b, 4 * n)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 4 * n, (b, K)), jnp.int32)
    jg = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))
    jax.block_until_ready(jg(tab, idx))
    print(f"key gather (B,4N)@(B,K): {timecall(jg, tab, idx):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
