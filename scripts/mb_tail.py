#!/usr/bin/env python
"""Tail + cluster attribution on the production path (session-4):
  - full detector vs estimate_pose=False vs refine_edges=False deltas
  - cluster_and_fit _debug_stop prefixes on the NARROW (ka) point set
Interleaved two-pass minima."""
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

B = int(os.environ.get("MB_B", "8"))


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
    import dataclasses
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import frontend_pallas as fp
    from ros_vision_tpu.ops import quadfit
    from ros_vision_tpu.ops.threshold_pallas import adaptive_threshold_fused
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    base = DetectorConfig(width=1280, height=800, fx=900.0, fy=900.0,
                          cx=640.0, cy=400.0, estimate_pose=True)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())

    variants = [
        ("full", base),
        ("no_pose", dataclasses.replace(base, estimate_pose=False)),
        ("no_refine", dataclasses.replace(base, refine_edges=False)),
    ]
    jfs = []
    for name, cfg in variants:
        det = TPUDetector(cfg)
        intr = jnp.asarray(det.default_intrinsics(B))
        t0 = time.perf_counter()
        jax.block_until_ready(det._fn(g, intr))
        comp = time.perf_counter() - t0
        jfs.append((name, det._fn, (g, intr), comp))

    # cluster internals on the narrow point set
    det = TPUDetector(base)
    qcfg_n = det._qcfg_narrow
    ka = det._active_points

    @jax.jit
    def setup(g):
        decim, t = adaptive_threshold_fused(g)
        pts, _c = fp.frontend(t, det.config.max_points,
                              det._qcfg.max_boundary_pixels)
        return decim, {k: v[:, :ka] for k, v in pts.items()}

    decim, ptsn = jax.block_until_ready(setup(g))
    for stop in ("tables", "theta", "errs", "peaks", None):
        jf = jax.jit(lambda p, d, s=stop: quadfit.cluster_and_fit(
            p, d, qcfg_n, _debug_stop=s))
        t0 = time.perf_counter()
        jax.block_until_ready(jf(ptsn, decim))
        comp = time.perf_counter() - t0
        jfs.append((f"cl_{stop}", jf, (ptsn, decim), comp))

    best = [float("inf")] * len(jfs)
    for _ in range(2):
        for i, (name, jf, args, _c) in enumerate(jfs):
            best[i] = min(best[i], timecall(jf, *args))
    for (name, _jf, _a, comp), t in zip(jfs, best):
        print(f"{name:12s} {t:8.2f} ms ({t/B:5.2f}/fr) compile {comp:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
