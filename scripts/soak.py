#!/usr/bin/env python
"""Randomized oracle-parity soak: the repeatable version of the round-1
126-seed sweep (VERDICT round 1, item 10).

Each seed renders a randomized scene (1-3 tags, noise sigma 0-4, varied
background/angles/sizes) and asserts the TPU detector decodes the same ids
with the same hamming counts as the f64 oracle, corners within 1 px and
poses within 2 cm — the same property tests/test_fuzz_parity.py checks on
its in-suite seeds (seeds 0..19 there; this script scales the sweep).

Usage:
  python scripts/soak.py               # 126 seeds, ~10 min CPU
  python scripts/soak.py -n 500 -s 200 # 500 seeds starting at 200

Always run on CPU (never the TPU: concurrent chip claims wedge the relay).
Exit code 0 = clean; 1 = any mismatch (each mismatch is printed).
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--seeds", type=int, default=126)
    ap.add_argument("-s", "--start", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)

    W, H = 320, 160
    FX = FY = 300.0
    CX, CY = 160.0, 80.0
    det = TPUDetector(DetectorConfig(
        width=W, height=H, max_points=16384, max_segments=128, max_quads=16,
        fx=FX, fy=FY, cx=CX, cy=CY, estimate_pose=True))
    oracle = OracleDetector(fx=FX, fy=FY, cx=CX, cy=CY, estimate_pose=True)

    failures = []
    t0 = time.time()
    for seed in range(args.start, args.start + args.seeds):
        rng = np.random.default_rng(seed)
        n_tags = int(rng.integers(1, 4))
        ids = rng.choice(587, n_tags, replace=False).tolist()
        corners = []
        xs = np.linspace(60, W - 60, n_tags)
        for i in range(n_tags):
            corners.append(simple_square_corners(
                xs[i] + rng.uniform(-10, 10), rng.uniform(55, H - 55),
                rng.uniform(22, 34), angle_deg=rng.uniform(-45, 45)))
        img, _ = render_scene(ids, corners, W, H,
                              noise_sigma=rng.uniform(0, 4),
                              background=int(rng.uniform(120, 220)),
                              seed=int(rng.integers(1 << 30)))
        o = oracle.detect(img).detections
        t = det.detect(img)
        errs = []
        if [d.tag_id for d in t] != [d.tag_id for d in o]:
            errs.append(f"ids tpu={[d.tag_id for d in t]} "
                        f"oracle={[d.tag_id for d in o]}")
        else:
            for td, od in zip(t, o):
                if td.hamming != od.hamming:
                    errs.append(f"id {td.tag_id} hamming "
                                f"{td.hamming}!={od.hamming}")
                dc = float(np.abs(td.corners - od.corners).max())
                if dc >= 1.0:
                    errs.append(f"id {td.tag_id} corner delta {dc:.3f}")
                if td.pose_t is not None and od.pose_t is not None:
                    dp = float(np.abs(np.asarray(td.pose_t)
                                      - np.asarray(od.pose_t)).max())
                    if dp >= 0.02:
                        errs.append(f"id {td.tag_id} pose delta {dp:.4f}")
        if errs:
            failures.append((seed, errs))
            print(f"seed {seed}: MISMATCH {errs}", flush=True)
        done = seed - args.start + 1
        if done % 10 == 0:
            print(f"[{done}/{args.seeds}] {len(failures)} failures "
                  f"({time.time() - t0:.0f}s)", flush=True)

    print(f"\n{args.seeds} seeds, {len(failures)} failures, "
          f"{time.time() - t0:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
