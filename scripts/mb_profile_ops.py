#!/usr/bin/env python
"""Capture a jax.profiler trace of the production detector call and print
the top HLO ops by self time (tensorboard_plugin_profile xplane parse) —
op-level ground truth that prefix-diff microbenches can't give (output
materialization pollutes their deltas; see mb_errs.py round-4 finding)."""
import glob
import json
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
TOP = int(os.environ.get("MB_TOP", "40"))


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
    det = TPUDetector(DetectorConfig(
        width=1280, height=800, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
        estimate_pose=True))
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    intr = jnp.asarray(det.default_intrinsics(B))
    out = det._fn_packed(g, intr)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[0]

    tdir = f"/tmp/rvt_prof_b{B}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        outs = [det._fn_packed(g, intr) for _ in range(6)]
        _ = np.asarray(outs[-1]).ravel()[0]
        _ = np.asarray(outs[0]).ravel()[0]

    xplanes = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xplanes, flush=True)
    # parse in a subprocess: mb_parse_xplane uses the TF-bundled XSpace
    # schema with pure-python protobuf (the tensorboard_plugin_profile
    # converter is incompatible with the installed TF)
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "mb_parse_xplane.py"),
         tdir, "6", str(B)],
        env={**os.environ, "MB_TOP": str(TOP),
             "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION": "python"})


if __name__ == "__main__":
    main()
