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
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ctype = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # rows: list of dicts or a gviz table; handle both
    if isinstance(rows, dict) and "rows" in rows:
        cols = [c["label"] for c in rows["cols"]]
        recs = [{cols[i]: c["v"] for i, c in enumerate(r["c"])}
                for r in rows["rows"]]
    else:
        recs = rows
    keyname = None
    for cand in ("Total self time (us)", "total_self_time_us",
                 "selfTimeUs", "self_time_us"):
        if recs and cand in recs[0]:
            keyname = cand
            break
    if keyname is None:
        print("columns:", list(recs[0].keys()) if recs else "none")
        keyname = sorted(recs[0].keys())[0]
    recs.sort(key=lambda r: -float(r.get(keyname, 0) or 0))
    tot = sum(float(r.get(keyname, 0) or 0) for r in recs)
    print(f"total self time: {tot/1e3:.2f} ms over 6 calls "
          f"=> {tot/6e3:.2f} ms/call, {tot/6e3/B:.3f} ms/frame")
    for r in recs[:TOP]:
        t = float(r.get(keyname, 0) or 0)
        name = (r.get("HLO op expression") or r.get("expression")
                or r.get("HLO op name") or r.get("name") or "?")
        cat = r.get("HLO op category") or r.get("category") or "?"
        print(f"{t/6e3:8.3f} ms/call {100*t/max(tot,1):5.1f}% "
              f"{cat:28s} {str(name)[:150]}")


if __name__ == "__main__":
    main()
