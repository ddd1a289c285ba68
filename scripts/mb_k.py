#!/usr/bin/env python
"""Point-capacity sweep: detector timing + recall + golden corner parity
at reduced max_points. The middle pipeline's sorts/gathers scale ~linearly
with K, and the noisy bench scene saturates every cap, so K is a direct
throughput knob — IF recall and corner accuracy hold under the heavier
uniform thinning."""
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
KS = [int(x) for x in os.environ.get("MB_KS", "131072,98304,65536").split(",")]


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
    img, truths = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())

    # golden photo at production resolution (1280x800)
    import cv2
    gold = cv2.imread(
        "/root/reference/src/apriltags_cuda/test/data/grayimage.jpg",
        cv2.IMREAD_GRAYSCALE)
    have_gold = gold is not None and gold.shape == (800, 1280)

    # 1080p golden (saturates the caps hardest) — corners vs f64 oracle
    g1080 = cv2.imread(
        "/root/reference/src/apriltags_cuda/test/data/colorimage.jpg")
    have_1080 = g1080 is not None and g1080.shape[:2] == (1080, 1920)
    oracle_1080 = None
    if have_1080 and os.environ.get("MB_1080", "1") == "1":
        from ros_vision_tpu.apriltag.oracle import OracleDetector
        g1080 = cv2.cvtColor(g1080, cv2.COLOR_BGR2GRAY)
        o = OracleDetector(fx=905.495617, fy=907.909470,
                           cx=609.916016, cy=352.682645).detect(g1080)
        oracle_1080 = {d.tag_id: np.asarray(d.corners) for d in o.detections}

    base_corners = None
    for k in KS:
        det = TPUDetector(DetectorConfig(
            width=1280, height=800, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
            estimate_pose=True, max_points=k))
        intr = jnp.asarray(det.default_intrinsics(B))
        ms = timecall(det._fn_packed, g, intr)
        res = det.detect(img)
        ids = sorted(d.tag_id for d in res)
        line = (f"K={k:6d}: {ms:7.2f} ms/call ({ms/B:5.2f}/frame) "
                f"ids={ids} ")
        if have_gold:
            gres = det.detect(gold)
            gids = sorted(d.tag_id for d in gres)
            c = {d.tag_id: np.sort(d.corners, axis=0) for d in gres}
            if base_corners is None:
                base_corners = c
                line += f"gold_ids={gids}"
            else:
                errs = [float(np.abs(c[t] - base_corners[t]).max())
                        for t in base_corners if t in c]
                line += (f"gold_ids={gids} gold_dcorner_max="
                         f"{max(errs) if errs else float('nan'):.3f}px")
        if oracle_1080 is not None:
            from ros_vision_tpu.apriltag.detector import (DetectorConfig,
                                                          TPUDetector)
            d1080 = TPUDetector(DetectorConfig(
                width=1920, height=1080, fx=905.495617, fy=907.909470,
                cx=609.916016, cy=352.682645, max_points=k))
            t = d1080.detect(g1080)
            errs = [float(np.abs(np.asarray(d.corners)
                                 - oracle_1080[d.tag_id]).max())
                    for d in t if d.tag_id in oracle_1080]
            line += (f" 1080_ids={sorted(d.tag_id for d in t)}"
                     f" 1080_dcorner_vs_oracle="
                     f"{max(errs) if errs else float('nan'):.3f}px")
        print(line, flush=True)


if __name__ == "__main__":
    main()
