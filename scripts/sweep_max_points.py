#!/usr/bin/env python
"""Resolution-swept recall envelope for the auto max_points rule
(VERDICT r4 #5): tag recall vs boundary-point capacity K at
640x480 / 1280x800 / 1920x1080 across scene densities, pinning the
dp//8 (dp//4 past 2^18 decimated px) auto rule with data — the rule's
safety margin was previously one binary step on the bench scene alone.

Scenes: soak-style rendered layouts (1-6 tags, varied sizes/angles) at
noise sigma 0 / 2 / 3.5 — the heavy-noise tiers saturate the stream-
thinning overflow path exactly like the bench's adversarial scene.
Recall = detected-and-correct-id / rendered, aggregated per (res, K).

Run on TPU (JAX_COMPILATION_CACHE_DIR recommended) or CPU
(JAX_PLATFORMS=cpu; slower compiles). One detector compile per (res, K).
Output: one JSON line per (res, K) + a SUMMARY verdict vs the auto rule.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")

import numpy as np


def scenes_for(w, h, rng):
    """Soak-style layouts: (ids, corners, noise) tuples spanning density
    and clutter. Tag size scales with resolution."""
    from ros_vision_tpu.apriltag.render import simple_square_corners
    s = min(w, h) / 800.0
    out = []
    layouts = [
        ([0], [(0.5, 0.5, 120, 10)]),
        ([0, 42, 311, 100], [(0.23, 0.31, 90, 0), (0.63, 0.5, 110, 20),
                             (0.35, 0.75, 70, -35), (0.78, 0.75, 60, 50)]),
        ([5, 77, 200, 311, 411, 500],
         [(0.15, 0.2, 55, 5), (0.45, 0.18, 60, -20), (0.8, 0.25, 50, 40),
          (0.2, 0.6, 65, 70), (0.55, 0.65, 58, -50), (0.82, 0.72, 52, 15)]),
    ]
    for ids, specs in layouts:
        corners = [simple_square_corners(fx * w, fy * h,
                                         max(24, sz * s), angle_deg=a)
                   for fx, fy, sz, a in specs]
        for noise in (0.0, 2.0, 3.5):
            out.append((ids, corners, noise))
    return out


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import render_scene

    rng = np.random.default_rng(0)
    resolutions = [(640, 480), (1280, 800), (1920, 1080)]
    if os.environ.get("SWEEP_RES"):
        resolutions = [tuple(int(v) for v in r.split("x"))
                       for r in os.environ["SWEEP_RES"].split(",")]
    results = []
    for w, h in resolutions:
        auto_k = TPUDetector(DetectorConfig(
            width=w, height=h, fx=900.0, fy=900.0,
            cx=w / 2, cy=h / 2)).config.max_points
        ks = sorted({auto_k // 4, auto_k // 2, auto_k,
                     min(auto_k * 2, 131072)})
        scn = scenes_for(w, h, rng)
        rendered = [render_scene(ids, corners, w, h, noise_sigma=noise,
                                 seed=17 * i)
                    for i, (ids, corners, noise) in enumerate(scn)]
        for k in ks:
            det = TPUDetector(DetectorConfig(
                width=w, height=h, fx=900.0, fy=900.0, cx=w / 2, cy=h / 2,
                max_points=k))
            total = hit = 0
            worst = None
            for (ids, _c, noise), (img, placed) in zip(scn, rendered):
                got = {d.tag_id for d in det.detect(img[None])[0]}
                want = {p.tag_id for p in placed}
                total += len(want)
                hit += len(want & got)
                if want - got:
                    worst = {"noise": noise, "missed": sorted(want - got)}
            rec = {"res": f"{w}x{h}", "K": k, "auto_K": auto_k,
                   "is_auto": k == auto_k, "recall": round(hit / total, 4),
                   "hit": hit, "total": total, "worst_miss": worst}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    summary = all(r["recall"] == 1.0 for r in results if r["is_auto"])
    print(json.dumps({"SUMMARY": "auto rule holds full recall" if summary
                      else "AUTO RULE RECALL LOSS", "ok": summary}))
    return 0 if summary else 1


if __name__ == "__main__":
    sys.exit(main())
