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


def streaming_bench(img, duration_s: float = 12.0):
    """BASELINE.json config 5: four concurrent 1280x800 camera streams
    through VisionSystem.spin end-to-end — capture thread -> frame ring ->
    H2D -> detector -> unpack -> NT4 publish (in-process NT server), with
    the pipelined submit/unpack overlap under the latency-bounded adaptive
    pipeline depth. Each camera serves a DISTINCT scene (per-camera decode
    and unpack content is not artificially coherent). Mock cameras pace at
    the 100 fps camera target. Returns (per_camera_fps, p50_ms, p95_ms,
    phases): per-camera processed-frame rate (cameras outpace the
    pipeline; drop-oldest rings skip frames, the reference's QoS-depth-1
    behavior), capture->pose latency percentiles, and the spin loop's
    per-phase accounting so a latency regression is attributable from the
    bench artifact alone. NOTE the axon relay adds ~46 ms host<->device
    RTT per readback that on-board deployment would not pay."""
    import csv as csvmod
    import json as jsonmod
    import tempfile
    import threading

    import cv2
    from ros_vision_tpu.config.loader import ConfigLoader
    from ros_vision_tpu.launch import VisionSystem
    from ros_vision_tpu.runtime.camera import MockCamera
    from ros_vision_tpu.runtime.nt4 import NT4TestServer

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
    csv_path = os.path.join(tmp, "timing.csv")
    ConfigLoader.set_config_file_path(cfg_path)
    try:
        from ros_vision_tpu.apriltag.render import (render_scene,
                                                    simple_square_corners)
        scenes = [img]
        for k, (ids, specs) in enumerate([
                ([7, 19], [(350, 300, 95, 10), (900, 450, 80, -25)]),
                ([63, 200, 471], [(260, 220, 100, 0), (760, 380, 70, 40),
                                  (1050, 620, 85, -15)]),
                ([3], [(640, 400, 120, 30)])]):
            g, _ = render_scene(
                ids, [simple_square_corners(x, y, s, angle_deg=a)
                      for x, y, s, a in specs], 1280, 800,
                noise_sigma=1.0)
            scenes.append(g)
        bgrs = [cv2.cvtColor(s, cv2.COLOR_GRAY2BGR) for s in scenes]

        def factory(ident, idx):
            bgr = bgrs[idx % len(bgrs)]

            def frames(n):
                time.sleep(0.01)          # 100 fps camera pacing
                return bgr
            return MockCamera(width=1280, height=800, frame_factory=frames)

        system = VisionSystem(
            measurement_mode=True, timing_csv_path=csv_path,
            enable_viewer=False, enable_nt=True,
            camera_map={k: i for i, k in enumerate(cams)},
            camera_factory=factory,
            detector_overrides=dict(fx=900.0, fy=900.0, cx=640.0,
                                    cy=400.0, estimate_pose=True))
        system.start()
        # warm: one inline batch compiles/caches the B=4 program
        deadline = time.time() + 600
        while time.time() < deadline:
            results = system.spin_once()
            if any(r[0] for r in results):
                break
        t = threading.Thread(target=system.spin, daemon=True)
        t0 = time.time()
        t.start()
        time.sleep(duration_s)
        system._running = False
        t.join(timeout=10)
        elapsed = time.time() - t0
        system.stop()
        with open(csv_path) as f:
            rows = list(csvmod.DictReader(f))
        # steady state: skip the first quarter of rows, scale the batch
        # rate to the matching 3/4 of the run
        rows = rows[len(rows) // 4:]
        lat_us = [float(r["latency_us"]) for r in rows]
        lat_ms = np.percentile(lat_us, [50, 95]) / 1e3 if lat_us else [0, 0]
        fps = (len(rows) / len(cams)) / (elapsed * 0.75)
        phases = dict(system.spin_stats or {})
        n = max(1, phases.get("batches", 1))
        for k in ("pull_ms", "upload_ms", "submit_ms", "consume_ms"):
            if k in phases:          # totals -> per-batch means
                phases[k] = round(phases[k] / n, 2)
        phases["publish_dropped"] = system.node.publish_dropped
        phases["publish_count"] = system.node.publish_count
        return (round(fps, 2), round(float(lat_ms[0]), 1),
                round(float(lat_ms[1]), 1), phases)
    finally:
        ConfigLoader.set_config_file_path(None)
        ConfigLoader.reload_config()
        nt_server.close()


def wait_for_backend(max_wait_s: float = 1500.0, probe_timeout_s: float = 90.0):
    """Block until the JAX default backend initializes, probing in a
    SUBPROCESS so a wedged axon relay (backend init that hangs instead of
    erroring — observed on the relay tunnel) can't hang this process
    forever. Retries for up to max_wait_s, then raises with a clear
    message so the driver records an explicit failure instead of a hang."""
    import subprocess
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if r.returncode == 0:
                return r.stdout.strip()
            err = r.stderr.strip().splitlines()[-1:] or ["?"]
            msg = f"probe exit {r.returncode}: {err[0]}"
        except subprocess.TimeoutExpired:
            msg = f"backend init hung >{probe_timeout_s:.0f}s (relay down?)"
        if time.time() >= deadline:
            raise RuntimeError(
                f"JAX backend unreachable after {attempt} probes / "
                f"{max_wait_s:.0f}s: {msg}")
        print(f"WARNING: backend probe {attempt} failed ({msg}); retrying",
              file=sys.stderr)
        time.sleep(min(60.0, max(5.0, probe_timeout_s / 3)))


# partial-record holder for the global watchdog: _measure() builds its
# result dict IN here so a mid-run relay stall still leaves main() a
# partial artifact to print.
PARTIAL: dict = {}
_DONE: list = []


def _measure():
    wait_for_backend(float(os.environ.get("BENCH_BACKEND_WAIT_S", "1500")))
    batches = [int(x) for x in
               os.environ.get("BENCH_BATCHES", "1,4,8,16").split(",")]
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)

    import jax.numpy as jnp

    # The probe compiles in TPUDetector.__init__ gate the Pallas kernel
    # paths, but the Mosaic compile helper has crashed NONDETERMINISTICALLY
    # across sessions (CLAUDE.md) — a probe can pass and the full-detector
    # compile still die. Never lose the headline number to that: retry the
    # whole sweep once with the Pallas paths forced off.
    for attempt in ("auto", "conservative"):
        try:
            kw = {} if attempt == "auto" else dict(
                use_fused_frontend=False, use_pallas_sort=False)
            det = TPUDetector(DetectorConfig(
                width=1280, height=800, fx=900.0, fy=900.0, cx=640.0,
                cy=400.0, estimate_pose=True, **kw))

            # correctness gate: all 4 tags must decode; report the outcome
            # in the JSON rather than crashing the bench harness
            res = det.detect(img)
            ids = sorted(d.tag_id for d in res)
            tags_ok = ids == [0, 42, 100, 311]
            if not tags_ok:
                print(f"WARNING: detection regression: {ids}",
                      file=sys.stderr)

            best = None
            points = {}
            for batch in batches:
                g = jnp.asarray(np.broadcast_to(img,
                                                (batch, 800, 1280)).copy())
                intr = jnp.asarray(det.default_intrinsics(batch))
                out = det._fn(g, intr)                   # compile + warm
                np.asarray(out["ok"]).sum()

                # deployment-shaped consumption (exactly vision_node's
                # submit/unpack): async D2H enqueued at dispatch, host
                # read per output. block_until_ready per call costs a
                # ~25 ms relay sync ping that SERIALIZES the stream and
                # dominates any call shorter than the ping (it measured
                # B=1 at 27.5 ms when the device time is ~12.6); the
                # async-read form measures what a pipelined consumer
                # actually pays. Every output is read.
                t0 = time.time()
                outs = []
                for _ in range(iters):
                    o = det._fn(g, intr)
                    try:
                        o["ok"].copy_to_host_async()
                    except Exception:
                        pass
                    outs.append(o)
                for o in outs:
                    _ = np.asarray(o["ok"]).sum()
                dt = (time.time() - t0) / iters
                fps = batch / dt
                points[batch] = {"fps": round(fps, 2),
                                 "latency_ms": round(dt * 1e3, 2)}
                PARTIAL["sweep_partial"] = dict(points)
                if best is None or fps > best[1]:
                    best = (batch, fps, dt)
            break
        except Exception as e:
            if attempt == "conservative":
                raise
            print(f"WARNING: auto-config sweep failed ({e}); retrying "
                  "with Pallas kernel paths off", file=sys.stderr)

    batch, fps, dt = best
    PARTIAL.clear()
    out = PARTIAL            # alias: later phases mutate the holder
    out.update({
        "metric": "apriltag_1280x800_36h11_detect_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / CAMERA_TARGET_FPS, 3),
        "tags_ok": tags_ok,
        "best_batch": batch,
        "best_batch_call_ms": round(dt * 1e3, 2),
        "sweep": points,
        # resolved Pallas/kernel path selection — machine-visible so a
        # relay-side probe regression that silently flips the fleet to
        # XLA fallbacks shows up in the bench artifact, not just in
        # session notes (VERDICT r3 weak #6)
        "active_config": {
            "fused_frontend": det._use_fused,
            "pallas_threshold": det._use_pallas_threshold,
            "pallas_sort": det._qcfg.use_pallas_sort,
            "route_compaction": det._qcfg.route_compaction,
            "max_points": det.config.max_points,
            "active_points": det._active_points,
        },
    })
    # the latency operating point is B=1 (one camera frame end to end);
    # best-batch call time is a throughput figure, not per-frame latency
    if 1 in points:
        out["p50_latency_ms"] = points[1]["latency_ms"]
        # RTT-vs-compute account: per-call SYNC roundtrip (dispatch ->
        # block -> host read, no pipelining) — what a non-pipelined
        # consumer pays on the relay; ~= max(relay sync ping ~25 ms,
        # device compute). On-board deployment has no relay ping.
        try:
            g1 = jnp.asarray(img[None])
            i1 = jnp.asarray(det.default_intrinsics(1))
            np.asarray(det._fn(g1, i1)["ok"]).sum()
            lat = []
            for _ in range(iters):
                ts = time.perf_counter()
                _ = np.asarray(det._fn(g1, i1)["ok"]).sum()
                lat.append(time.perf_counter() - ts)
            out["b1_sync_roundtrip_ms"] = round(
                float(np.percentile(lat, 50)) * 1e3, 2)
        except Exception:
            pass

    # cross-resolution point: the reference's 1920x1080 golden photo
    # through a 1080p detector (exactly one tag must decode —
    # gpu_detector_test.cu:85-120 semantics)
    if os.environ.get("BENCH_1080P", "1") != "0":
        try:
            import cv2
            p = ("/root/reference/src/apriltags_cuda/test/data/"
                 "colorimage.jpg")
            if os.path.exists(p):
                gray1080 = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2GRAY)
                det1080 = TPUDetector(DetectorConfig(
                    width=1920, height=1080, fx=905.495617, fy=907.909470,
                    cx=609.916016, cy=352.682645, estimate_pose=True))
                r1080 = det1080.detect(gray1080)
                g1 = jnp.asarray(gray1080[None])
                i1 = jnp.asarray(det1080.default_intrinsics(1))
                det1080._fn(g1, i1)["ok"].block_until_ready()
                t0 = time.time()
                outs = [det1080._fn(g1, i1) for _ in range(iters)]
                _ = np.asarray(outs[-1]["ok"]).sum()
                _ = np.asarray(outs[0]["ok"]).sum()
                out["golden_1080p_ms_per_frame"] = round(
                    (time.time() - t0) / iters * 1e3, 2)
                out["golden_1080p_tags_ok"] = (
                    [d.tag_id for d in r1080] == [554])
        except Exception as e:  # never lose the primary metric
            print(f"WARNING: 1080p bench failed: {e}", file=sys.stderr)

    # BASELINE config 5: 4-camera streaming end to end (capture->pose,
    # incl. H2D, unpack, NT publish) through VisionSystem.spin. Run under
    # a WATCHDOG: the axon relay can stall a device readback for MINUTES
    # (observed mid-round-5: Array._value blocked >9 min during
    # streaming warmup), and since this JSON only prints at the end, an
    # unguarded stall would eat the whole bench record — abandon the
    # streaming phase after BENCH_STREAM_TIMEOUT_S and keep the headline.
    stream_stalled = False
    if os.environ.get("BENCH_STREAMING", "1") != "0":
        import threading

        def _run_streaming():
            try:
                sfps, p50, p95, phases = streaming_bench(img)
                out["streaming_cameras"] = 4
                out["streaming_fps_per_camera"] = sfps
                out["e2e_p50_ms"] = p50
                out["e2e_p95_ms"] = p95
                out["streaming_phases"] = phases
                out["e2e_note"] = ("axon relay adds ~46 ms host<->device "
                                   "RTT per readback vs on-board "
                                   "deployment")
            except Exception as e:  # never lose the primary metric
                print(f"WARNING: streaming bench failed: {e}",
                      file=sys.stderr)

        th = threading.Thread(target=_run_streaming, daemon=True)
        th.start()
        th.join(timeout=float(os.environ.get("BENCH_STREAM_TIMEOUT_S",
                                             "900")))
        if th.is_alive():
            stream_stalled = True
            out["streaming_error"] = ("timed out (relay readback stall); "
                                      "headline metrics unaffected")
            print("WARNING: streaming bench timed out — abandoning phase",
                  file=sys.stderr)
    print(json.dumps(out))
    sys.stdout.flush()
    _DONE.append(True)
    if stream_stalled:
        # the abandoned thread may sit forever in a stuck device readback
        # holding non-daemon resources (NT4 test server) — exit hard so
        # the driver still collects the printed record
        os._exit(0)


def main():
    """Run _measure under a GLOBAL watchdog. The axon relay can stall a
    device readback (or a compile) for an unbounded time — observed
    blocking >9 min mid-round — and this script's contract is ONE JSON
    line on stdout; a silent hang would cost the whole official record.
    On timeout the best partial record (sweep points collected so far)
    is printed with a bench_error marker."""
    import threading
    th = threading.Thread(target=_measure, daemon=True)
    th.start()
    th.join(timeout=float(os.environ.get("BENCH_TOTAL_TIMEOUT_S", "5400")))
    if _DONE:
        return
    rec = dict(PARTIAL)
    rec.setdefault("metric", "apriltag_1280x800_36h11_detect_fps_per_chip")
    rec.setdefault("value", 0.0)
    rec.setdefault("unit", "fps")
    rec.setdefault("vs_baseline", 0.0)
    rec["bench_error"] = (
        "global timeout — relay stall mid-measurement; partial record"
        if th.is_alive() else
        "measurement thread died before completing; partial record")
    print(json.dumps(rec))
    sys.stdout.flush()
    os._exit(3 if th.is_alive() else 1)


if __name__ == "__main__":
    main()
