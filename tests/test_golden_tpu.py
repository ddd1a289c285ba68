"""TPU-detector golden-image parity (gpu_detector_test.cu:85-120).

The oracle-side golden assertions live in tests/test_oracle.py; these run
the REAL detector pipeline (full 1280x720 production config, CPU backend in
the suite) on the stored reference photos so regressions on real-photo
statistics — point counts, segment population, decode margins — fail CI,
not just synthetic-scene parity.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def golden_det():
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    # production-shaped config (default point/segment/quad caps) at the
    # golden photos' 1920x1080; intrinsics from the reference test camera
    return TPUDetector(DetectorConfig(
        width=1920, height=1080, fx=905.495617, fy=907.909470,
        cx=609.916016, cy=352.682645))


def _gray(img):
    import cv2
    return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)


def test_tpu_golden_one_tag(reference_golden_image, golden_det):
    res = golden_det.detect(_gray(reference_golden_image))
    assert [d.tag_id for d in res] == [554]
    assert res[0].hamming == 0


def test_tpu_golden_no_tags(reference_notags_image, golden_det):
    assert golden_det.detect(_gray(reference_notags_image)) == []


def test_tpu_golden_corner_parity(reference_golden_image, golden_det):
    """Corners on the real photo must match the f64 oracle to subpixel
    tolerance (stage-parity fuzz covers synthetic scenes; this pins the
    real-photo path end to end)."""
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    gray = _gray(reference_golden_image)
    o = OracleDetector(fx=905.495617, fy=907.909470,
                       cx=609.916016, cy=352.682645).detect(gray)
    t = golden_det.detect(gray)
    assert len(o.detections) == 1 and len(t) == 1
    delta = np.abs(np.asarray(t[0].corners)
                   - np.asarray(o.detections[0].corners)).max()
    # the cluttered 1080p photo saturates the boundary caps, so the TPU
    # path fits quads from a thinned subset while the oracle keeps every
    # point. Round 2's blob-blind row striding cost ~1.4 px here
    # (tolerance was 2.0); round 3's UNIFORM stream thinning + 64-sample
    # refine_edges brings the measured delta to 0.03 px — asserted with
    # a 0.5 px margin.
    assert delta < 0.5, f"corner delta vs oracle: {delta:.3f} px"


@pytest.fixture(scope="module")
def production_det():
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    # the production 1280x800 configuration — the same shape bench.py and
    # the camera target run at
    return TPUDetector(DetectorConfig(
        width=1280, height=800, fx=905.495617, fy=907.909470,
        cx=609.916016, cy=352.682645))


def test_tpu_grayimage_production_resolution(reference_grayimage,
                                             production_det):
    """The only reference photo at the 1280x800 production resolution:
    exactly one tag (id 585, clean decode), corners matching the f64
    oracle to sub-half-pixel."""
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    t = production_det.detect(reference_grayimage)
    assert [(d.tag_id, d.hamming) for d in t] == [(585, 0)]
    o = OracleDetector(fx=905.495617, fy=907.909470,
                       cx=609.916016, cy=352.682645).detect(
                           reference_grayimage)
    assert [d.tag_id for d in o.detections] == [585]
    delta = np.abs(np.asarray(t[0].corners)
                   - np.asarray(o.detections[0].corners)).max()
    assert delta < 0.5, f"corner delta vs oracle: {delta:.3f} px"
