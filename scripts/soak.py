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

# --device tpu: run the DEVICE side of the soak on the real chip (the
# production flood-CCL/route/Pallas paths the CPU soak can't exercise);
# the f64 oracle always runs host-side. Must be decided before jax import.
_SOAK_TPU = any(a == "tpu" or a.endswith("=tpu") for a in sys.argv)
if not _SOAK_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _det_kw_env() -> dict:
    """SOAK_DET_KW: JSON dict of DetectorConfig overrides — lets the
    device-path A/Bs (Pallas flood vs pure XLA, route vs sort) run the
    same seed ranges without editing the harness."""
    import json
    raw = os.environ.get("SOAK_DET_KW", "")
    return json.loads(raw) if raw else {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--seeds", type=int, default=126)
    ap.add_argument("-s", "--start", type=int, default=0)
    ap.add_argument("--audit-misses", action="store_true",
                    help="hard profile: run the f64 oracle on every "
                         "non-detection and fail on TPU-specific misses")
    ap.add_argument("--profile", choices=["parity", "hard", "gate"],
                    default="parity",
                    help="parity: randomized scenes vs the f64 oracle; "
                         "hard: lens distortion + shallow tilts vs ground "
                         "truth (the regimes where f32 pose/refine math "
                         "is most stressed); gate: adversarial decode-gate "
                         "corner-perturbation sweep (screen_hamming safety "
                         "evidence)")
    ap.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                    help="backend for the detector under test (the oracle "
                         "is host-side either way); tpu exercises the "
                         "production flood/route/Pallas default paths")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)

    W, H = 320, 160
    FX = FY = 300.0
    CX, CY = 160.0, 80.0
    if args.profile == "hard":
        return run_hard(args, W, H, FX, FY, CX, CY)
    if args.profile == "gate":
        return run_gate(args)
    det = TPUDetector(DetectorConfig(
        width=W, height=H, max_points=16384, max_segments=128, max_quads=16,
        fx=FX, fy=FY, cx=CX, cy=CY, estimate_pose=True,
        **_det_kw_env()))
    oracle = OracleDetector(fx=FX, fy=FY, cx=CX, cy=CY, estimate_pose=True)

    failures = []
    junk_extras = []
    tie_divergences = []
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
        # Split each side into detections of RENDERED ids (strict parity
        # required) and extras. Extras with junk-level decision margin
        # (< 10; real tags measure 150-300) are knife-edge junk quads:
        # refine on a pure-noise quad is noise-chasing, so f32 and f64
        # legitimately walk the same junk to different places, and one
        # side's junk occasionally lands within hamming 2 of a code
        # (random-code probability ~2e-5 per junk quad — measured 1 in
        # 10,000 scenes, seed 6019, margin 2.1). Those are REPORTED but
        # not failures; a high-margin extra or any divergence on a
        # rendered tag is material.
        JUNK_MARGIN = 10.0
        rendered = set(ids)
        t_real = {d.tag_id: d for d in t if d.tag_id in rendered}
        o_real = {d.tag_id: d for d in o if d.tag_id in rendered}
        extras = [("tpu", d) for d in t if d.tag_id not in rendered] + \
                 [("oracle", d) for d in o if d.tag_id not in rendered]
        if sorted(t_real) != sorted(o_real):
            errs.append(f"rendered-id sets tpu={sorted(t_real)} "
                        f"oracle={sorted(o_real)}")
        for side, d in extras:
            if d.decision_margin >= JUNK_MARGIN:
                errs.append(f"{side} extra id {d.tag_id} margin "
                            f"{d.decision_margin:.1f}")
            else:
                junk_extras.append((seed, side, d.tag_id,
                                    d.decision_margin))
                print(f"seed {seed}: junk-margin extra ({side} id "
                      f"{d.tag_id} margin {d.decision_margin:.1f}) — "
                      "reported, not a failure", flush=True)
        for tag_id in sorted(set(t_real) & set(o_real)):
            td, od = t_real[tag_id], o_real[tag_id]
            if td.hamming != od.hamming:
                errs.append(f"id {td.tag_id} hamming "
                            f"{td.hamming}!={od.hamming}")
            dc = float(np.abs(td.corners - od.corners).max())
            dp = None
            if td.pose_t is not None and od.pose_t is not None:
                dp = float(np.abs(np.asarray(td.pose_t)
                                  - np.asarray(od.pose_t)).max())
                if dp >= 0.02:
                    errs.append(f"id {td.tag_id} pose delta {dp:.4f}")
            if dc >= 1.0:
                # peak-tie divergence: under heavy noise the top-10 peak
                # threshold sits at a near-tie, and f32 per-point moment
                # rounding can pick a different (valid) corner combo than
                # the f64 oracle — root-caused at seed 10298 (oracle peak
                # 130 ranks 11th on the TPU path; same point set, same
                # theta order; the reference's own fixed-point GPU path
                # has the same class of gap vs its f64 CPU library).
                # Accept ONLY when the operational outputs agree: same
                # id (by construction here), equal hamming, pose within
                # 1 cm. Anything else is material.
                if td.hamming == od.hamming and dp is not None \
                        and dp < 0.01:
                    tie_divergences.append((seed, tag_id, dc, dp))
                    print(f"seed {seed}: peak-tie divergence (id {tag_id}"
                          f" corners {dc:.2f} px, pose {dp * 1e3:.1f} mm)"
                          " — reported, not a failure", flush=True)
                else:
                    errs.append(f"id {td.tag_id} corner delta {dc:.3f}")
        if errs:
            failures.append((seed, errs))
            print(f"seed {seed}: MISMATCH {errs}", flush=True)
        done = seed - args.start + 1
        if done % 10 == 0:
            print(f"[{done}/{args.seeds}] {len(failures)} failures "
                  f"({time.time() - t0:.0f}s)", flush=True)

    print(f"\n{args.seeds} seeds, {len(failures)} failures, "
          f"{len(junk_extras)} junk-margin extras, "
          f"{len(tie_divergences)} peak-tie divergences, "
          f"{time.time() - t0:.0f}s")
    # knife-edge junk extras are expected at ~1e-4/seed (random-code
    # probability); a RATE well above that means a systematic regression,
    # not knife-edge noise — fail loudly rather than reclassify it away
    junk_cap = max(2, args.seeds // 200)
    if len(junk_extras) > junk_cap:
        print(f"junk-extra rate {len(junk_extras)}/{args.seeds} exceeds "
              f"the knife-edge budget ({junk_cap}) — treating as failure")
        return 1
    if len(tie_divergences) > junk_cap:
        print(f"peak-tie rate {len(tie_divergences)}/{args.seeds} exceeds "
              f"the knife-edge budget ({junk_cap}) — treating as failure")
        return 1
    return 1 if failures else 0


def run_gate(args) -> int:
    """Decode-gate adversarial sweep at scale (VERDICT round-2 item 5):
    per seed, render a tag (random size 22-80 px half-width, angle, noise
    0-2.5), take the detector's true corners, perturb by random offsets of
    0.5-3 px, and look for any case where the UNREFINED best-code hamming
    is > 4 (screened out by screen_hamming=4) while the REFINED decode
    reaches <= 2 (a real detection the gate would lose). Reports the loss
    threshold: the smallest perturbation magnitude that produced any loss.
    The gate is safe while that threshold stays far above quadfit's
    observed corner error (sub-0.5 px on suite scenes)."""
    import jax.numpy as jnp
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.families import get_family
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import decode as dec

    W, H = 640, 400
    det = TPUDetector(DetectorConfig(
        width=W, height=H, fx=600.0, fy=600.0, cx=320.0, cy=200.0,
        max_points=65536, max_segments=512, max_quads=32,
        estimate_pose=False))
    fam = get_family()
    cm = jnp.asarray(dec.make_code_matrix(fam))
    mags = tuple(float(x) for x in os.environ.get(
        "SOAK_GATE_MAGS", "0.5,1.0,1.5,2.0,2.5,3.0").split(","))
    n_pert = 64

    import jax

    @jax.jit
    def gate_fn(gray, quads):
        valid = jnp.ones(quads.shape[:2], bool)
        pre = dec.decode_quads(gray, quads, valid, fam, cm)
        refined = dec.refine_edges(gray, quads, valid, None, None)
        post = dec.decode_quads(gray, refined, valid, fam, cm)
        return pre["hamming"], post["hamming"], post["ok"]

    losses_at = {m: 0 for m in mags}
    cases = 0
    t0 = time.time()
    for seed in range(args.start, args.start + args.seeds):
        rng = np.random.default_rng(10_000 + seed)
        half = rng.uniform(22, 80)
        img, _ = render_scene(
            [int(rng.integers(0, 587))],
            [simple_square_corners(rng.uniform(150, W - 150),
                                   rng.uniform(120, H - 120), half,
                                   angle_deg=rng.uniform(-45, 45))],
            W, H, noise_sigma=rng.uniform(0, 2.5),
            seed=int(rng.integers(1 << 30)))
        dets = det.detect(img)
        if len(dets) != 1:
            continue
        base = np.asarray(dets[0].corners, np.float64)
        gray = jnp.asarray(img)[None]
        for mag in mags:
            theta = rng.uniform(0, 2 * np.pi, (n_pert, 4))
            offs = mag * np.stack([np.cos(theta), np.sin(theta)], -1)
            quads = jnp.asarray((base[None] + offs)[None], jnp.float32)
            pre_hj, post_hj, post_okj = gate_fn(gray, quads)
            pre_h = np.asarray(pre_hj)[0]
            post_h = np.asarray(post_hj)[0]
            post_ok = np.asarray(post_okj)[0]
            n_loss = int(((pre_h > 4) & (post_h <= 2) & post_ok).sum())
            losses_at[mag] += n_loss
            cases += n_pert
        done = seed - args.start + 1
        if done % 10 == 0:
            print(f"[{done}/{args.seeds}] losses={losses_at} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"\ngate profile: {args.seeds} seeds x {n_pert} perturbations x "
          f"{len(mags)} magnitudes ({cases} decode pairs), "
          f"{time.time() - t0:.0f}s")
    print(f"gate losses by perturbation magnitude: {losses_at}")
    thr = min((m for m, n in losses_at.items() if n), default=None)
    if thr is None:
        print(f"no gate loss at any magnitude <= {max(mags)} px")
    else:
        print(f"smallest magnitude with a gate loss: {thr} px "
              f"(quadfit worst observed corner error is sub-0.5 px)")
    # failure only if losses appear at quadfit-plausible magnitudes
    return 1 if any(n for m, n in losses_at.items() if m <= 1.5) else 0


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
            if args.audit_misses:
                # recall parity: a miss is only acceptable if the f64
                # oracle misses the same scene (round-2 audit found 45/45
                # oracle-missed; this automates that check)
                from ros_vision_tpu.apriltag.oracle import OracleDetector
                ok = OracleDetector(
                    fx=FX, fy=FY, cx=CX, cy=CY,
                    dist=tuple(dist) if use_dist else None).detect(
                        img).detections
                if any(d.tag_id == tag_id for d in ok):
                    failures.append((seed, ["TPU-specific miss: oracle "
                                            f"detects id {tag_id}"]))
                    print(f"seed {seed}: TPU-SPECIFIC MISS (oracle "
                          f"detects {tag_id}, tilt {tilt:.0f})",
                          flush=True)
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
