#!/usr/bin/env python
"""B=1 fixed-overhead breakdown on the relay (VERDICT round-2 item 9).

Measures, at B=1 vs B=4:
  - a 1-op elementwise baseline (pure dispatch+readback floor),
  - the same with the detector's OUTPUT TREE size faked (many small
    outputs) to see if output-tree fan-out multiplies dispatch cost,
  - the full detector,
so the fixed ~9 ms B=1 overhead can be attributed (relay RTT vs
executable launches vs output marshalling)."""
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
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)

    for B in (1, 4):
        g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
        one = jax.jit(lambda x: (x.astype(jnp.float32) * 2 + 1).sum())
        print(f"B={B} 1-op baseline: {timecall(one, g):.2f} ms",
              flush=True)
        many = jax.jit(lambda x: tuple(
            (x.astype(jnp.float32) + i).sum() for i in range(12)))
        print(f"B={B} 12-output baseline: {timecall(many, g):.2f} ms",
              flush=True)

    det = TPUDetector(DetectorConfig(
        width=1280, height=800, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
        estimate_pose=True))
    for B in (1, 4):
        g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
        intr = jnp.asarray(det.default_intrinsics(B))
        t = timecall(det._fn, g, intr)
        print(f"B={B} detector: {t:.2f} ms ({t/B:.2f}/frame)", flush=True)


if __name__ == "__main__":
    main()
