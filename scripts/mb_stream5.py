#!/usr/bin/env python
"""Standalone streaming-bench probe (round 5): runs ONLY bench.py's
streaming_bench (compile cache warm) so the spin-loop phase split —
pull vs upload vs submit vs consume — can be iterated on without paying
the full sweep. Usage: python scripts/mb_stream5.py [duration_s]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")

import json


def main():
    import bench
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    fps, p50, p95, phases = bench.streaming_bench(img, duration_s=dur)
    print(json.dumps({"fps_per_cam": fps, "p50_ms": p50, "p95_ms": p95,
                      "phases": phases}))


if __name__ == "__main__":
    main()
