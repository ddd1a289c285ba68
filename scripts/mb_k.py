#!/usr/bin/env python
"""A/B the boundary-point capacity K at the production resolution.

CPU-verified invariants at K=32768 (2026-08-18): grayimage golden decodes
(585, hamming 0) with 0.260 px corner delta vs the f64 oracle (<0.5
invariant; 0.012 px at 65536) and all 4 noisy-bench tags decode. This
script measures whether halving K from the auto 65536 actually buys
throughput on chip — the middle-pipeline sorts halve, but thinning also
shifts work — before any auto-rule change.
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
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    ks = [int(x) for x in os.environ.get("MB_KS", "32768,65536").split(",")]
    bs = [int(x) for x in os.environ.get("MB_BS", "4,8").split(",")]
    for k in ks:
        det = TPUDetector(DetectorConfig(
            width=1280, height=800, fx=900.0, fy=900.0, cx=640.0,
            cy=400.0, estimate_pose=True, max_points=k))
        ids = sorted(d.tag_id for d in det.detect(img))
        print(f"K={k}: tags {ids} "
              f"({'OK' if ids == [0, 42, 100, 311] else 'REGRESSION'})")
        for b in bs:
            g = jnp.asarray(np.broadcast_to(img, (b, 800, 1280)).copy())
            intr = jnp.asarray(det.default_intrinsics(b))
            ms = timecall(det._fn, g, intr)
            print(f"  K={k} B={b}: {ms:.2f} ms/call  {ms / b:.2f} ms/frame "
                  f"({b / ms * 1e3:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
