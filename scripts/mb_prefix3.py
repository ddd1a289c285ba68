#!/usr/bin/env python
"""Production-path fused prefix budget (session-4): Pallas threshold +
fused frontend + narrow cluster + screen + tail, matching detector._fn
stage by stage. Interleaved two-pass minima (first-config-on-fresh-relay
runs 3-4x slow)."""
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
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import decode as dec
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
    det = TPUDetector(DetectorConfig(
        width=1280, height=800, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
        estimate_pose=True))
    cfg = det.config
    qcfg = det._qcfg
    qcfg_n = det._qcfg_narrow
    ka = det._active_points
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    intr = jnp.asarray(det.default_intrinsics(B))
    print(f"fused={det._use_fused} pthresh={det._use_pallas_threshold} "
          f"ka={ka} max_points={cfg.max_points}", flush=True)

    def p_thresh(g):
        return adaptive_threshold_fused(g)

    def p_frontend(g):
        _, t = adaptive_threshold_fused(g)
        return fp.frontend(t, cfg.max_points, qcfg.max_boundary_pixels)

    def p_cluster(g):
        decim, t = adaptive_threshold_fused(g)
        pts, counts = fp.frontend(t, cfg.max_points,
                                  qcfg.max_boundary_pixels)
        k_full = pts["key"].shape[1]

        def pad_k(x):
            if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == ka:
                widths = [(0, 0)] * x.ndim
                widths[1] = (0, k_full - ka)
                return jnp.pad(x, widths)
            return x

        def narrow():
            ptsn = {kk: v[:, :ka] for kk, v in pts.items()}
            out = quadfit.cluster_and_fit(ptsn, decim, qcfg_n)
            return {kk: pad_k(v) for kk, v in out.items()}

        qf = jax.lax.cond(counts.max() <= ka, narrow,
                          lambda: quadfit.cluster_and_fit(pts, decim, qcfg))
        return qf["corners"], qf["quad_valid"]

    def p_screen(g):
        corners, qvalid = p_cluster(g)
        corners = dec.adjust_pixel_centers(corners)
        pre = dec.decode_quads(g, corners, qvalid, det.family,
                               det._code_matrix)
        screen = qvalid & (pre["hamming"] <= cfg.screen_hamming)
        prio = jnp.where(screen, pre["margin"], -jnp.inf)
        return jax.lax.top_k(prio, cfg.max_active_quads)

    jobs = [("thresh", p_thresh), ("+frontend", p_frontend),
            ("+cluster", p_cluster), ("+screen", p_screen),
            ("full", None)]
    jfs = []
    for name, fn in jobs:
        jf = det._fn if fn is None else jax.jit(fn)
        args = (g, intr) if fn is None else (g,)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(*args))
        comp = time.perf_counter() - t0
        jfs.append((name, jf, args, comp))
    best = [float("inf")] * len(jfs)
    for _ in range(2):
        for i, (name, jf, args, _c) in enumerate(jfs):
            best[i] = min(best[i], timecall(jf, *args))
    prev = 0.0
    for (name, _jf, _a, comp), t in zip(jfs, best):
        print(f"{name:10s} {t:8.2f} ms ({t/B:5.2f}/fr) "
              f"delta {(t-prev)/B:+6.2f}/fr  compile {comp:.0f}s",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
