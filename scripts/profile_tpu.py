#!/usr/bin/env python
"""TPU profiling harness: batch sweep + per-stage timing for the detector.

Usage:
  python scripts/profile_tpu.py sweep 1 4 8     # full-pipeline fps at each B
  python scripts/profile_tpu.py stages 4        # per-stage budget at B
Measured with the queued-N-calls recipe (CLAUDE.md): per-call sync on the
relay measures RTT (~46 ms), not compute.
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

from ros_vision_tpu.apriltag.detector import TPUDetector, DetectorConfig
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners


def scene():
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    return img


def make_det(**kw):
    return TPUDetector(DetectorConfig(
        width=1280, height=800, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
        estimate_pose=True, **kw))


def time_fn(fn, args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    last = jax.tree_util.tree_leaves(outs[-1])[0]
    first = jax.tree_util.tree_leaves(outs[0])[0]
    _ = np.asarray(last).ravel()[0]
    _ = np.asarray(first).ravel()[0]
    return (time.time() - t0) / iters


def sweep(batches, iters=30, **kw):
    img = scene()
    det = make_det(**kw)
    for b in batches:
        g = jnp.asarray(np.broadcast_to(img, (b, 800, 1280)).copy())
        intr = jnp.asarray(det.default_intrinsics(b))
        t0 = time.time()
        dt = time_fn(det._fn, (g, intr), iters)
        res = det.detect(np.asarray(g[:1]))
        ids = sorted(d.tag_id for d in res[0])
        print(f"B={b:3d}: {dt*1e3:8.2f} ms/call  {b/dt:8.2f} fps  "
              f"(first-call incl compile {time.time()-t0:.0f}s) ids={ids}",
              flush=True)


def stages(b, iters=20, **kw):
    from ros_vision_tpu.utils.tracing import StageTimer
    img = scene()
    det = make_det(**kw)
    g = jnp.asarray(np.broadcast_to(img, (b, 800, 1280)).copy())
    st = StageTimer(det)
    for name, ms in st.measure(g, reps=iters).items():
        print(f"  {name:12s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    args = [int(a) for a in sys.argv[2:]] or [1, 4, 8]
    if mode == "sweep":
        sweep(args)
    else:
        stages(args[0])
