#!/usr/bin/env python
"""Headline benchmark: 1280x800 36h11 AprilTag detection throughput.

Measures the full jitted TPU pipeline (gray -> detections+poses) in steady
state: N queued invocations on device arrays with one final readback —
the deployment pattern of a streaming vision pipeline (the reference
equivalently overlaps its CUDA stream work, apriltag_gpu.cu:725-1097).
Sweeps batch sizes (the camera axis) and reports the best per-chip
operating point plus its per-call latency.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": x, ...}

Baseline reference point: the reference repo publishes no AprilTag pipeline
FPS; its documented perf example is the YOLOv11 TensorRT detector at 285.63
FPS on Jetson Orin (src/game_piece_detection/README.md:195) and the camera
target of 100 fps @ 1280x800 (system_config.json). We report detection fps
vs the 100 fps camera-rate target as vs_baseline.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from ros_vision_tpu.apriltag.detector import TPUDetector, DetectorConfig
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners

CAMERA_TARGET_FPS = 100.0  # 1280x800@100fps MJPG target (system_config.json)


def main():
    batches = [int(x) for x in
               os.environ.get("BENCH_BATCHES", "1,4,8").split(",")]
    iters = int(os.environ.get("BENCH_ITERS", "30"))
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

    import jax.numpy as jnp

    # correctness gate: all 4 tags must decode; report the outcome in the
    # JSON rather than crashing the bench harness
    res = det.detect(img)
    ids = sorted(d.tag_id for d in res)
    tags_ok = ids == [0, 42, 100, 311]
    if not tags_ok:
        print(f"WARNING: detection regression: {ids}", file=sys.stderr)

    best = None
    points = {}
    for batch in batches:
        g = jnp.asarray(np.broadcast_to(img, (batch, 800, 1280)).copy())
        intr = jnp.asarray(det.default_intrinsics(batch))
        out = det._fn(g, intr)                       # compile + warm
        np.asarray(out["ok"]).sum()

        t0 = time.time()
        outs = [det._fn(g, intr) for _ in range(iters)]
        for o in outs:
            o["ok"].block_until_ready()
        _ = np.asarray(outs[-1]["ok"]).sum()
        _ = np.asarray(outs[0]["ok"]).sum()
        dt = (time.time() - t0) / iters
        fps = batch / dt
        points[batch] = {"fps": round(fps, 2),
                         "latency_ms": round(dt * 1e3, 2)}
        if best is None or fps > best[1]:
            best = (batch, fps, dt)

    batch, fps, dt = best
    out = {
        "metric": "apriltag_1280x800_36h11_detect_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / CAMERA_TARGET_FPS, 3),
        "tags_ok": tags_ok,
        "best_batch": batch,
        "best_batch_call_ms": round(dt * 1e3, 2),
        "sweep": points,
    }
    # the latency operating point is B=1 (one camera frame end to end);
    # best-batch call time is a throughput figure, not per-frame latency
    if 1 in points:
        out["p50_latency_ms"] = points[1]["latency_ms"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
