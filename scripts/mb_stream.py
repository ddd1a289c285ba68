#!/usr/bin/env python
"""Instrumented replica of VisionSystem.spin (bench.py streaming config 5):
per-iteration phase timers to locate where the streaming loop period goes.

Phases per loop iteration (mirrors launch.VisionSystem.spin):
  pull    — FramePipe.pull_batch(wait_new=True) wait for a fresh frame
  submit  — detect_raw_packed dispatch + copy_to_host_async enqueue
  unpack  — detector.unpack(pending) (device wait + D2H readback)
  publish — host-side per-camera transform + NT4 publish + CSV row

Run on the relay chip: JAX_COMPILATION_CACHE_DIR must be set; only one
TPU process at a time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")

import numpy as np


def main():
    import csv as csvmod
    import json as jsonmod
    import tempfile

    import cv2
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.config.loader import ConfigLoader
    from ros_vision_tpu.launch import VisionSystem
    from ros_vision_tpu.runtime.camera import MockCamera
    from ros_vision_tpu.runtime.nt4 import NT4TestServer

    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)

    nt_server = NT4TestServer()
    rot = [[0, 0, 1], [-1, 0, 0], [0, -1, 0]]
    cams = {f"mock{i}": {"location": loc, "format": "MJPG", "height": 800,
                         "width": 1280, "frame_rate": 100,
                         "api_preference": "ANY"}
            for i, loc in enumerate(["center_front", "left_front",
                                     "right_front", "back"])}
    cfg = {
        "camera_mounted_positions": cams,
        "extrinsics": {c["location"]: {"rotation": rot,
                                       "offset": [0.0, 0.0, 0.0]}
                       for c in cams.values()},
        "network_tables_config": {"table_address": "127.0.0.1",
                                  "table_name": "/SmartDashboard",
                                  "port": nt_server.port},
    }
    tmp = tempfile.mkdtemp()
    cfg_path = os.path.join(tmp, "system_config.json")
    with open(cfg_path, "w") as f:
        jsonmod.dump(cfg, f)
    ConfigLoader.set_config_file_path(cfg_path)
    try:
        bgr = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)

        def factory(ident, idx):
            def frames(n):
                time.sleep(0.01)
                return bgr
            return MockCamera(width=1280, height=800, frame_factory=frames)

        system = VisionSystem(
            measurement_mode=True,
            timing_csv_path=os.path.join(tmp, "timing.csv"),
            enable_viewer=False, enable_nt=True,
            camera_map={k: i for i, k in enumerate(cams)},
            camera_factory=factory,
            detector_overrides=dict(fx=900.0, fy=900.0, cx=640.0,
                                    cy=400.0, estimate_pose=True))
        system.start()
        deadline = time.time() + 600
        while time.time() < deadline:
            if any(r[0] for r in system.spin_once()):
                break

        # instrumented spin: same structure as VisionSystem.spin; the
        # unpack phase is timed by wrapping detector.unpack so the REAL
        # process_batch (incl. publishes) runs unmodified
        node, pipe = system.node, system.pipe
        unpack_times = []
        orig_unpack = node.detector.unpack

        def unpack_timed(p):
            t = time.perf_counter()
            r = orig_unpack(p)
            unpack_times.append(time.perf_counter() - t)
            return r
        node.detector.unpack = unpack_timed

        phases = {k: [] for k in ("submit", "pull", "upload", "process",
                                  "loop")}
        from collections import deque
        depth = int(os.environ.get("MB_STREAM_DEPTH", "1"))
        defer = os.environ.get("MB_STREAM_DEFER", "1") == "1"
        pend = deque()
        n_iters = int(os.environ.get("MB_STREAM_ITERS", "120"))
        lat = []
        if os.environ.get("MB_STREAM_THREADED", "0") == "1":
            # producer/consumer split: submitter thread does pull + H2D +
            # dispatch; this thread consumes at device cadence. Queue
            # depth bounds in-flight batches (backpressure, no pile-up).
            import queue
            import threading
            q = queue.Queue(maxsize=depth)
            stop_flag = [False]

            def submitter():
                while not stop_flag[0]:
                    fr, _ids, st = pipe.pull_batch(wait_new=True)
                    ts = time.perf_counter()
                    p = node.submit(fr)
                    phases["submit"].append(time.perf_counter() - ts)
                    q.put((p, fr, st))

            th = threading.Thread(target=submitter, daemon=True)
            th.start()
            for it in range(n_iters):
                t_loop = time.perf_counter()
                p, pf, ps = q.get()
                t2 = time.perf_counter()
                node.process_batch(pf, [s / 1e9 for s in ps], pending=p,
                                   defer_publish=defer)
                lat.append(time.time() - ps[0] / 1e9)
                t3 = time.perf_counter()
                phases["pull"].append(t2 - t_loop)   # queue wait
                phases["upload"].append(0.0)
                phases["process"].append(t3 - t2)
                phases["loop"].append(t3 - t_loop)
            stop_flag[0] = True
        else:
            # mirrors VisionSystem.spin (r4): submit first, then prefetch +
            # upload the next batch so H2D and wait_new ride the unpack wait
            frames, ids, stamps = pipe.pull_batch(wait_new=True)
            dev = node.upload(frames)
            for it in range(n_iters):
                t_loop = time.perf_counter()
                pend.append((node.submit(dev), frames, stamps))
                t0 = time.perf_counter()
                frames, ids, stamps = pipe.pull_batch(wait_new=True)
                t1 = time.perf_counter()
                dev = node.upload(frames)
                t2 = time.perf_counter()
                while len(pend) > depth:
                    p, pf, ps = pend.popleft()
                    node.process_batch(pf, [s / 1e9 for s in ps], pending=p,
                                       defer_publish=defer)
                    lat.append(time.time() - ps[0] / 1e9)
                t3 = time.perf_counter()
                phases["submit"].append(t0 - t_loop)
                phases["pull"].append(t1 - t0)
                phases["upload"].append(t2 - t1)
                phases["process"].append(t3 - t2)
                phases["loop"].append(t3 - t_loop)
        phases["unpack"] = unpack_times
        n = min(len(phases["process"]) - depth, len(unpack_times))
        phases["publish"] = list(np.array(phases["process"][depth:depth + n])
                                 - np.array(unpack_times[:n]))
        for k, v in phases.items():
            v = np.array(v[10:]) * 1e3
            print(f"{k:8s} p50 {np.percentile(v, 50):7.2f}  "
                  f"p95 {np.percentile(v, 95):7.2f} ms")
        loop = np.array(phases["loop"][10:])
        print(f"-> depth={depth} {1.0 / loop.mean():.2f} batches/s "
              f"({1.0 / loop.mean():.2f} fps/cam)")
        if lat:
            la = np.array(lat[10:]) * 1e3
            print(f"   capture->publish p50 {np.percentile(la, 50):.1f} "
                  f"p95 {np.percentile(la, 95):.1f} ms")
        system.stop()
    finally:
        ConfigLoader.set_config_file_path(None)
        ConfigLoader.reload_config()
        nt_server.close()


if __name__ == "__main__":
    main()
