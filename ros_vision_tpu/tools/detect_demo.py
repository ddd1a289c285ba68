#!/usr/bin/env python
"""Detection demo CLI: run the TPU detector on an image and visualize.

Role of the reference's opencv_cuda_demo / visualize tools: load an image
(or render a synthetic scene), detect, print results, write an annotated
image. Also serves the image_processor demo role (prints mean intensity,
image_processor_node.cpp).
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", help="input image (else synthetic scene)")
    ap.add_argument("--out", default="/tmp/detections.png")
    ap.add_argument("--fx", type=float, default=905.495617)
    ap.add_argument("--fy", type=float, default=907.909470)
    ap.add_argument("--cx", type=float, default=609.916016)
    ap.add_argument("--cy", type=float, default=352.682645)
    ap.add_argument("--tag-size", type=float, default=0.1651)
    ap.add_argument("--profile-dir", help="write a jax.profiler trace of "
                    "the (warm) detector call here — the XLA-level tier "
                    "of the reference's per-stage CUDA-event timing "
                    "(apriltag_gpu.cu:1118-1165); open with TensorBoard "
                    "or Perfetto")
    args = ap.parse_args(argv)

    # honor JAX_PLATFORMS even under the axon sitecustomize, which
    # re-registers the TPU plugin over the env var (CLAUDE.md): the
    # config update after import is the reliable pin — without it,
    # "JAX_PLATFORMS=cpu detect_demo" touches the relay chip (and hangs
    # whenever the relay tunnel is wedged)
    import os
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import cv2
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.runtime.vision_node import VisionNode

    if args.image:
        bgr = cv2.imread(args.image)
        gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        h, w = gray.shape
        gray = gray[: h - h % 8, : w - w % 8]
    else:
        from ros_vision_tpu.apriltag.render import (render_scene,
                                                    simple_square_corners)
        gray, _ = render_scene(
            [0, 42], [simple_square_corners(400, 300, 100),
                      simple_square_corners(900, 450, 80, angle_deg=25)],
            1280, 800)

    print(f"image {gray.shape[1]}x{gray.shape[0]}, "
          f"mean intensity {gray.mean():.1f}")
    det = TPUDetector(DetectorConfig(
        width=gray.shape[1], height=gray.shape[0],
        fx=args.fx, fy=args.fy, cx=args.cx, cy=args.cy,
        tag_size=args.tag_size, estimate_pose=True))
    dets = det.detect(gray)
    if args.profile_dir:
        import jax
        with jax.profiler.trace(args.profile_dir):
            dets = det.detect(gray)        # warm call: no compile in trace
        print(f"profiler trace -> {args.profile_dir}")
    print(f"{len(dets)} detections:")
    for d in dets:
        t = d.pose_t if d.pose_t is not None else (0, 0, 0)
        print(f"  id {d.tag_id}  hamming {d.hamming}  "
              f"margin {d.decision_margin:.1f}  "
              f"t = ({t[0]:+.3f}, {t[1]:+.3f}, {t[2]:+.3f}) m")
    cv2.imwrite(args.out, VisionNode.annotate(gray, dets))
    print(f"annotated image -> {args.out}")


if __name__ == "__main__":
    main()
