#!/usr/bin/env python
"""A/B the giant-segment errs stable branch cost in the FULL production
detector at B=8: ERRS_STABLE_MIN_SZ patched huge (fast path always) vs
stock (stable fires on the bench scene's 2437-pt screened segment).
Measures the prize for a cheaper stable path / tighter gate."""
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
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    results = {}
    for label, gate in [("stock", None), ("fast-forced", 1 << 30)]:
        old = quadfit.ERRS_STABLE_MIN_SZ
        if gate is not None:
            quadfit.ERRS_STABLE_MIN_SZ = gate
        try:
            det = TPUDetector(DetectorConfig(
                width=1280, height=800, fx=900.0, fy=900.0, cx=640.0,
                cy=400.0, estimate_pose=True))
            intr = jnp.asarray(det.default_intrinsics(B))
            t0 = time.perf_counter()
            jax.block_until_ready(det._fn(g, intr))
            comp = time.perf_counter() - t0
            best = min(timecall(det._fn, g, intr) for _ in range(2))
            ids = sorted(d.tag_id for d in det.detect(img))
            results[label] = (best, ids)
            print(f"{label:12s} {best:8.2f} ms/call {best/B:6.2f}/fr "
                  f"tags={ids} compile {comp:.0f}s", flush=True)
        finally:
            quadfit.ERRS_STABLE_MIN_SZ = old
    return 0


if __name__ == "__main__":
    sys.exit(main())
