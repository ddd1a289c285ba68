#!/usr/bin/env python
"""Round-5 cluster budget at the PRODUCTION narrow branch (ka slots,
qcfg_narrow) — the branch the bench scene actually executes at B=8 —
via the _debug_stop cut points. MB_B to set batch."""
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


def timecall(jf, *args, iters=30):
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
    from ros_vision_tpu.ops import quadfit
    from ros_vision_tpu.ops import frontend_pallas as fp
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
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    cfg = det.config
    qcfg_n = det._qcfg_narrow
    ka = det._active_points
    print(f"ka={ka} max_points={cfg.max_points}", flush=True)

    @jax.jit
    def setup(g):
        decim, t = adaptive_threshold_fused(g)
        pts, counts = fp.frontend(t, cfg.max_points,
                                  det._qcfg.max_boundary_pixels)
        ptsn = {kk: v[:, :ka] for kk, v in pts.items()}
        return decim, ptsn, counts

    decim, pts, counts = jax.block_until_ready(setup(g))
    print("counts max:", int(np.asarray(counts).max()), flush=True)

    stops = ["sort1", "tables", "theta", "moments", "errs", "smooth",
             "peaks", "combos", None]
    if os.environ.get("MB_STOPS"):
        stops = [None if s in ("none", "None") else s
                 for s in os.environ["MB_STOPS"].split(",")]
    jfs = []
    for stop in stops:
        jf = jax.jit(lambda p, d, s=stop: quadfit.cluster_and_fit(
            p, d, qcfg_n, _debug_stop=s))
        t0 = time.perf_counter()
        jax.block_until_ready(jf(pts, decim))
        comp = time.perf_counter() - t0
        jfs.append((stop, jf, comp))
    best = [float("inf")] * len(jfs)
    for _ in range(2):
        for i, (_s, jf, _c) in enumerate(jfs):
            best[i] = min(best[i], timecall(jf, pts, decim))
    prev = 0.0
    for (stop, _jf, comp), ms in zip(jfs, best):
        print(f"{str(stop):8s} {ms:8.2f} ms total, {ms / B:6.2f}/frame "
              f"(delta {(ms - prev) / B:+6.2f}/frame, compile {comp:.0f}s)",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
