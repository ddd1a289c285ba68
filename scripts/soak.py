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
    ap.add_argument("--profile", choices=["parity", "hard"],
                    default="parity",
                    help="parity: randomized scenes vs the f64 oracle; "
                         "hard: lens distortion + shallow tilts vs ground "
                         "truth (the regimes where f32 pose/refine math "
                         "is most stressed)")
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
    if args.profile == "hard":
        return run_hard(args, W, H, FX, FY, CX, CY)
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


def run_hard(args, W, H, FX, FY, CX, CY) -> int:
    """Distortion + shallow-tilt ground-truth recovery (the regimes of
    tests/test_fuzz_parity.py::test_distorted_end_to_end and
    test_shallow_angle_pose_ambiguity, randomized). A case counts as a
    failure if the tag decodes but the pose is off; extreme-foreshortening
    non-detections are counted separately (recall, not correctness)."""
    import jax
    from scipy.spatial.transform import Rotation
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import (project_tag_corners,
                                                render_scene)

    tag = 0.1651
    # fixed distortion palette: the detector jit-specializes on the static
    # dist config, so continuous random distortion would recompile per seed
    dist_palette = [np.zeros(5),
                    np.array([-0.25, 0.08, 0.0, 0.0, 0.0]),
                    np.array([-0.12, 0.03, 0.0, 0.0, 0.0]),
                    np.array([0.08, -0.02, 0.0, 0.0, 0.0])]
    failures, missed = [], 0
    t0 = time.time()
    det_cache = {}
    for seed in range(args.start, args.start + args.seeds):
        rng = np.random.default_rng(10_000 + seed)
        dist = dist_palette[int(rng.integers(0, len(dist_palette)))]
        use_dist = bool(np.any(dist))
        tilt = rng.uniform(0, 65)
        yaw = rng.uniform(-30, 30)
        roll = rng.uniform(-180, 180)
        rot = Rotation.from_euler(
            "xyz", [tilt, yaw, roll], degrees=True).as_matrix()
        t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.05, 0.05),
                      rng.uniform(0.6, 1.4)])
        corners = project_tag_corners(rot, t, tag, FX, FY, CX, CY,
                                      dist=dist if use_dist else None)
        if (corners < 8).any() or (corners[:, 0] > W - 8).any() \
                or (corners[:, 1] > H - 8).any():
            continue                      # partially out of frame: skip
        tag_id = int(rng.integers(0, 587))
        img, _ = render_scene([tag_id], [corners], W, H,
                              noise_sigma=rng.uniform(0, 2),
                              seed=int(rng.integers(1 << 30)))
        key = tuple(np.round(dist, 6))
        if key not in det_cache:
            det_cache[key] = TPUDetector(DetectorConfig(
                width=W, height=H, max_points=16384, max_segments=128,
                max_quads=16, fx=FX, fy=FY, cx=CX, cy=CY,
                dist=tuple(dist), estimate_pose=True)) \
                if use_dist else TPUDetector(DetectorConfig(
                    width=W, height=H, max_points=16384, max_segments=128,
                    max_quads=16, fx=FX, fy=FY, cx=CX, cy=CY,
                    estimate_pose=True))
        res = det_cache[key].detect(img)
        if not res:
            missed += 1
            continue
        errs = []
        d = res[0]
        if d.tag_id != tag_id:
            errs.append(f"id {d.tag_id} != {tag_id}")
        elif d.pose_t is not None:
            dp = float(np.linalg.norm(np.asarray(d.pose_t) - t))
            tol = 0.06 if use_dist else 0.02
            if dp >= tol:
                errs.append(f"pose err {dp:.4f} (tilt {tilt:.0f}, "
                            f"dist={use_dist})")
            dotz = float(np.asarray(d.pose_R)[:, 2] @ rot[:, 2])
            if tilt < 55 and dotz < 0.9:
                errs.append(f"normal flipped (dot {dotz:.2f}, "
                            f"tilt {tilt:.0f})")
        if errs:
            failures.append((seed, errs))
            print(f"seed {seed}: MISMATCH {errs}", flush=True)
        done = seed - args.start + 1
        if done % 20 == 0:
            print(f"[{done}/{args.seeds}] {len(failures)} failures, "
                  f"{missed} missed ({time.time() - t0:.0f}s)", flush=True)
    print(f"\nhard profile: {args.seeds} seeds, {len(failures)} failures, "
          f"{missed} non-detections, {time.time() - t0:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
