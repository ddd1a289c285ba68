#!/usr/bin/env python
"""Decompose label_components_flood cost: masks vs floods vs epilogue."""
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
    from ros_vision_tpu.ops import ccl, ccl_pallas, threshold as thr
    from ros_vision_tpu.ops.scan import cumsum_mxu
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
    b, h, w = threshim.shape
    n = h * w

    jm = jax.jit(ccl_pallas.build_ladder_masks)
    masks = jax.block_until_ready(jm(threshim))
    print(f"masks:      {timecall(jm, threshim):7.2f} ms", flush=True)

    init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                            (b, n)).reshape(b, h, w)
    init = jax.block_until_ready(init)
    jf = jax.jit(lambda t, i, m: ccl_pallas.propagate_fixpoint(t, i, m))
    p3 = jax.block_until_ready(jf(threshim, init, masks))
    print(f"flood1:     {timecall(jf, threshim, init, masks):7.2f} ms",
          flush=True)

    p = p3.reshape(b, n)
    jh = jax.jit(ccl_pallas.label_histogram)
    jax.block_until_ready(jh(p))
    print(f"histogram:  {timecall(jh, p):7.2f} ms", flush=True)

    counts = jax.block_until_ready(jh(p))
    jc = jax.jit(lambda c: cumsum_mxu((c >= 25).astype(jnp.float32)))
    jax.block_until_ready(jc(counts))
    print(f"cumsum:     {timecall(jc, counts):7.2f} ms", flush=True)

    def epilogue(p, counts):
        is_root_v = counts > 0
        is_big_v = counts >= 25
        rank_v = cumsum_mxu(is_big_v.astype(jnp.float32)).astype(jnp.int32)
        rank_v = jnp.where(is_big_v & (rank_v <= 2048), rank_v, 0)
        packed_v = jnp.where(is_root_v,
                             (rank_v << 19) | jnp.minimum(counts, (1 << 19) - 1),
                             jnp.int32(2 ** 31 - 1))
        packed = jnp.take_along_axis(packed_v, p, axis=1)
        return packed & ((1 << 19) - 1), packed >> 19

    je = jax.jit(epilogue)
    jax.block_until_ready(je(p, counts))
    print(f"epilogue:   {timecall(je, p, counts):7.2f} ms", flush=True)

    jall = jax.jit(ccl.label_components_flood)
    jax.block_until_ready(jall(threshim))
    print(f"full flood: {timecall(jall, threshim):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
