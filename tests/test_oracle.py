"""CPU oracle detector tests.

Mirrors the reference's gpu_detector_test.cu strategy: golden images with a
known tag count, plus synthetic scenes with exact ground truth (ids, corners,
poses) and an independent cross-check against OpenCV's aruco detector.
"""
import numpy as np
import pytest

from ros_vision_tpu.apriltag.oracle import OracleDetector
from ros_vision_tpu.apriltag.render import (
    render_scene, simple_square_corners, project_tag_corners)

FX, FY, CX, CY = 905.495617, 907.909470, 609.916016, 352.682645


def test_synthetic_ids_and_corners():
    ids = [0, 42, 311]
    corners = [
        simple_square_corners(300, 250, 90),
        simple_square_corners(800, 400, 110, angle_deg=20),
        simple_square_corners(450, 600, 70, angle_deg=-35),
    ]
    img, placed = render_scene(ids, corners, 1280, 800)
    res = OracleDetector().detect(img)
    assert [d.tag_id for d in res.detections] == sorted(ids)
    assert all(d.hamming == 0 for d in res.detections)
    for d in res.detections:
        want = next(p.corners for p in placed if p.tag_id == d.tag_id)
        # detection corner order is reversed-winding from render order;
        # canonical orientation means no roll is needed
        err = np.abs(d.corners[::-1] - want).max()
        assert err < 0.35, f"tag {d.tag_id}: corner err {err}"


def test_no_tags_blank():
    img = np.full((400, 640), 128, np.uint8)
    res = OracleDetector().detect(img)
    assert res.detections == []


def test_noise_robustness():
    ids = [7]
    img, _ = render_scene(ids, [simple_square_corners(320, 200, 80, 10)],
                          640, 400, noise_sigma=8.0, seed=3)
    res = OracleDetector().detect(img)
    assert [d.tag_id for d in res.detections] == [7]


def test_pose_accuracy():
    from scipy.spatial.transform import Rotation
    tag = 0.1651
    rng = np.random.default_rng(1)
    det = OracleDetector(fx=900.0, fy=900.0, cx=640.0, cy=400.0,
                         estimate_pose=True, tag_size=tag)
    for trial in range(4):
        rot = Rotation.from_euler(
            "xyz", [rng.uniform(-25, 25), rng.uniform(-25, 25),
                    rng.uniform(-180, 180)], degrees=True).as_matrix()
        t = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3),
                      rng.uniform(0.8, 2.5)])
        corners = project_tag_corners(rot, t, tag, 900.0, 900.0, 640.0, 400.0)
        img, _ = render_scene([trial * 70], [corners], 1280, 800)
        res = det.detect(img)
        assert len(res.detections) == 1
        d = res.detections[0]
        assert np.linalg.norm(d.pose_t - t) < 0.01
        rerr = np.degrees(np.arccos(np.clip(
            (np.trace(d.pose_R @ rot.T) - 1) / 2, -1, 1)))
        assert rerr < 2.0


def test_reference_golden_one_tag(reference_golden_image):
    """Reference parity: exactly one tag on the golden photo
    (gpu_detector_test.cu:85-120 asserts 1 for both CPU and GPU paths)."""
    import cv2
    gray = cv2.cvtColor(reference_golden_image, cv2.COLOR_BGR2GRAY)
    res = OracleDetector(fx=FX, fy=FY, cx=CX, cy=CY).detect(gray)
    assert len(res.detections) == 1
    assert res.detections[0].tag_id == 554
    # independent oracle: OpenCV's aruco AprilTag detector agrees
    aru = cv2.aruco.ArucoDetector(
        cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11))
    _, ids, _ = aru.detectMarkers(gray)
    assert ids is not None and ids.flatten().tolist() == [554]


def test_reference_golden_no_tags(reference_notags_image):
    import cv2
    gray = cv2.cvtColor(reference_notags_image, cv2.COLOR_BGR2GRAY)
    res = OracleDetector(fx=FX, fy=FY, cx=CX, cy=CY).detect(gray)
    assert len(res.detections) == 0


def test_distortion_roundtrip():
    from ros_vision_tpu.apriltag import geometry as geo
    dist = np.array([-0.2, 0.05, 0.001, -0.001, 0.01])
    pts = np.random.default_rng(0).uniform([100, 100], [1180, 700], (50, 2))
    d = geo.distort_points(pts, FX, FY, CX, CY, dist)
    u = geo.undistort_points(d, FX, FY, CX, CY, dist)
    # reference converges to 1e-6 in normalized coords ~ 1e-3 px
    assert np.abs(u - pts).max() < 1e-3
