#!/usr/bin/env python
"""TPU microbench: fused Pallas frontend vs the unfused XLA path, plus the
full detector with/without the fused frontend."""
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
    qcfg = quadfit.QuadFitConfig()

    def old_path(t):
        _, _, ranks = ccl.label_components_flood(t)
        return quadfit.boundary_points(t, ranks, qcfg)

    def new_path(t):
        return fp.frontend(t, qcfg.max_points, qcfg.max_boundary_pixels)

    for name, fn in [("old ccl+boundary", old_path),
                     ("fused frontend", new_path),
                     ("rank_image only", fp.rank_image)]:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(jf(threshim))
        comp = time.perf_counter() - t0
        t = timecall(jf, threshim)
        print(f"{name:20s} {t:8.2f} ms total  {t/B:6.2f}/frame "
              f"(compile {comp:.0f}s)", flush=True)

    # sanity: same points out
    pts_o, cnt_o = jax.jit(old_path)(threshim)
    pts_n, cnt_n = jax.jit(new_path)(threshim)
    k = qcfg.max_points
    same_cnt = np.array_equal(np.asarray(cnt_o), np.asarray(cnt_n))
    same_key = np.array_equal(np.asarray(pts_o["key"]),
                              np.asarray(pts_n["key"])[:, :k])
    same_p2 = np.array_equal(np.asarray(pts_o["pack2"]),
                             np.asarray(pts_n["pack2"])[:, :k])
    print(f"parity: counts={same_cnt} key={same_key} pack2={same_p2}",
          flush=True)

    intr = None
    for fused in (False, True):
        det = TPUDetector(DetectorConfig(
            width=1280, height=800, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
            estimate_pose=True, use_fused_frontend=fused))
        if intr is None:
            intr = jnp.asarray(det.default_intrinsics(B))
        t0 = time.perf_counter()
        jax.block_until_ready(det._fn(g, intr))
        comp = time.perf_counter() - t0
        t = timecall(det._fn, g, intr)
        res = det.detect(img)
        ids = sorted(d.tag_id for d in res)
        print(f"detector fused={fused}: {t:8.2f} ms total  {t/B:6.2f}/frame"
              f"  ids={ids} (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
