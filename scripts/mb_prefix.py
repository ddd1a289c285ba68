#!/usr/bin/env python
"""Fused prefix timing: jit pipeline prefixes and difference — the honest
stage budget (StageTimer jits stages separately, which breaks fusion and
skips the active-quad narrowing)."""
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
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, quadfit, threshold as thr
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    det = TPUDetector(DetectorConfig(
        width=1280, height=800, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
        estimate_pose=True))
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    intr = jnp.asarray(det.default_intrinsics(B))
    qcfg = det._qcfg

    def p_thresh(g):
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        return t

    def p_ccl(g):
        t = p_thresh(g)
        return ccl.label_components_flood(t)

    def p_boundary(g):
        t = p_thresh(g)
        _, _, ranks = ccl.label_components_flood(t)
        return quadfit.boundary_points(t, ranks, qcfg)

    def p_cluster(g):
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        _, _, ranks = ccl.label_components_flood(t)
        pts, _ = quadfit.boundary_points(t, ranks, qcfg)
        out = quadfit.cluster_and_fit(pts, decim, qcfg)
        return out["corners"], out["quad_valid"]

    def p_screen(g):
        """+ the decode-gated-refine screen: unrefined pre-decode over all
        quad slots + top_k (detector.py _cluster_and_tail's gate)."""
        from ros_vision_tpu.ops import decode as dec
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        _, _, ranks = ccl.label_components_flood(t)
        pts, _ = quadfit.boundary_points(t, ranks, qcfg)
        out = quadfit.cluster_and_fit(pts, decim, qcfg)
        corners = dec.adjust_pixel_centers(out["corners"])
        pre = dec.decode_quads(g, corners, out["quad_valid"], det.family,
                               det._code_matrix)
        screen = out["quad_valid"] & (pre["hamming"] <= 4)
        prio = jnp.where(screen, pre["margin"], -jnp.inf)
        return jax.lax.top_k(prio, det.config.max_active_quads)

    prev = 0.0
    for name, fn in [("threshold", p_thresh), ("+ccl", p_ccl),
                     ("+boundary", p_boundary), ("+cluster", p_cluster),
                     ("+screen", p_screen)]:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(g))
        comp = time.perf_counter() - t0
        t = timecall(jf, g)
        print(f"{name:10s} {t:8.2f} ms  (delta {t - prev:+7.2f}, "
              f"compile {comp:.0f}s)", flush=True)
        prev = t

    jfull = det._fn
    t0 = time.perf_counter()
    jax.block_until_ready(jfull(g, intr))
    comp = time.perf_counter() - t0
    t = timecall(jfull, g, intr)
    print(f"{'full':10s} {t:8.2f} ms  (delta {t - prev:+7.2f}, "
          f"compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
