#!/usr/bin/env python
"""Chip probe for the mixed frontend: XLA flood ranks + Pallas
boundary_compact (frontend_pallas stage A/B routing kernels) vs the XLA
quadfit.boundary_points stage. Reports compile success (the Mosaic
compile helper has crashed nondeterministically on these kernels —
CLAUDE.md), on-chip parity, and marginal timing at the production shape.
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
K = int(os.environ.get("MB_K", "65536"))


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
    from ros_vision_tpu.ops import ccl, frontend_pallas as fp
    from ros_vision_tpu.ops import quadfit, threshold as thr

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
    qcfg = quadfit.QuadFitConfig(max_points=K)
    p_cap = qcfg.max_boundary_pixels

    _, _, ranks = jax.block_until_ready(
        ccl.label_components_flood(threshim))
    ranks_img = ranks.reshape(b, h, w)

    # XLA reference stage
    xla_fn = jax.jit(lambda t, r: quadfit.boundary_points(t, r, qcfg))
    pts_ref, counts_ref = jax.block_until_ready(xla_fn(threshim, ranks))
    t_xla = timecall(xla_fn, threshim, ranks)
    print(f"XLA boundary_points: {t_xla / B:.2f} ms/frame "
          f"(counts {np.asarray(counts_ref)})")

    # Pallas routing stage: compile probe first
    pal_fn = jax.jit(lambda t, r: fp.boundary_compact(t, r, p_cap, K))
    try:
        t0 = time.perf_counter()
        comp = pal_fn.lower(threshim, ranks_img).compile()
        print(f"Pallas boundary_compact COMPILED in "
              f"{time.perf_counter() - t0:.1f}s")
    except Exception as e:
        print(f"Pallas boundary_compact COMPILE FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")
        return
    key, pack2, counts = jax.block_until_ready(comp(threshim, ranks_img))
    ok_counts = np.array_equal(np.asarray(counts), np.asarray(counts_ref))
    ok_key = np.array_equal(np.asarray(key)[:, :K],
                            np.asarray(pts_ref["key"]))
    ok_pack = np.array_equal(np.asarray(pack2)[:, :K],
                             np.asarray(pts_ref["pack2"]))
    print(f"parity: counts={ok_counts} key={ok_key} pack2={ok_pack}")
    t_pal = timecall(comp, threshim, ranks_img)
    print(f"Pallas boundary_compact: {t_pal / B:.2f} ms/frame "
          f"(vs XLA {t_xla / B:.2f})")


if __name__ == "__main__":
    main()
