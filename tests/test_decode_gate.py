"""Decode-gated refine narrowing: the screened tail must be
detection-identical to the full-width tail on busy scenes.

The gate (detector.py screen_hamming) is the one round-2 change that
deliberately skips reference work (refining quads whose unrefined decode is
hopeless), so this pins its observable equivalence on a scene noisy enough
to fill every quad slot with junk candidates.
"""
import numpy as np
import pytest

from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners

W, H = 640, 400


@pytest.fixture(scope="module")
def noisy_scene():
    # sigma-3 noise: tag 42 is genuinely undetectable here (the f64 oracle
    # misses it too) — the expected set is [0, 311], and the junk clusters
    # the noise creates are exactly what the gate must screen out
    img, _ = render_scene(
        [0, 42, 311], [simple_square_corners(150, 120, 70),
                       simple_square_corners(420, 200, 80, angle_deg=20),
                       simple_square_corners(250, 300, 55, angle_deg=-35)],
        W, H, noise_sigma=3.0, seed=11)
    return img


def _det(**kw):
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    # production caps: sigma-3 noise on 640x400 overflows smaller segment
    # tables and drops real tags in EVERY branch (not a gate property)
    return TPUDetector(DetectorConfig(
        width=W, height=H, fx=600.0, fy=600.0, cx=320.0, cy=200.0,
        estimate_pose=True, max_points=131072, max_segments=1024,
        max_quads=64, **kw))


def test_screened_matches_full_width(noisy_scene):
    gated = _det(max_active_quads=16, screen_hamming=4)
    full = _det(max_active_quads=64)        # na == nq: no narrowing at all
    dg = gated.detect(noisy_scene)
    df = full.detect(noisy_scene)
    assert [d.tag_id for d in dg] == [0, 311]
    assert [d.tag_id for d in df] == [d.tag_id for d in dg]
    for a, b in zip(dg, df):
        assert a.hamming == b.hamming
        assert np.abs(np.asarray(a.corners) - np.asarray(b.corners)).max() \
            == 0.0
        if a.pose_t is not None:
            assert np.abs(np.asarray(a.pose_t)
                          - np.asarray(b.pose_t)).max() == 0.0


def test_screen_disable_flag(noisy_scene):
    """screen_hamming=None falls back to validity narrowing; detections
    unchanged."""
    plain = _det(max_active_quads=16, screen_hamming=None)
    assert [d.tag_id for d in plain.detect(noisy_scene)] == [0, 311]


def test_screen_overflow_falls_back(noisy_scene):
    """A pathological screen threshold (accept everything) overflows the
    active set, forcing the full-width lax.cond branch — results must still
    be correct."""
    loose = _det(max_active_quads=4, screen_hamming=36)
    assert [d.tag_id for d in loose.detect(noisy_scene)] == [0, 311]
