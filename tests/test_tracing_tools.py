"""Debug taps / check-mode / tools tests."""
import numpy as np
import pytest

from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners

W, H = 320, 160


@pytest.fixture(scope="module")
def det():
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    return TPUDetector(DetectorConfig(
        width=W, height=H, max_points=4096, max_segments=64, max_quads=8,
        fx=300.0, fy=300.0, cx=160.0, cy=80.0, estimate_pose=True))


def test_stage_taps_and_check(det):
    from ros_vision_tpu.utils.tracing import stage_taps
    img, _ = render_scene([3], [simple_square_corners(80, 60, 34)], W, H)
    taps = stage_taps(det, img, check=True)
    assert taps["threshim"].shape == (1, H // 2, W // 2)
    assert taps["counts"][0] > 0
    assert taps["quad_valid"][0].sum() >= 1
    assert taps["ok"][0].sum() == 1
    assert np.isfinite(taps["pose_t"][0][taps["ok"][0]]).all()


def test_robot_rotations_tool():
    from ros_vision_tpu.tools.robot_rotations import generate
    out = generate({"front": {"pitch": 0.0, "yaw": 0.0}})
    r = np.asarray(out["front"]["rotation"])
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-9)
    # camera forward (z) -> robot forward (x) at zero mount angles
    assert np.allclose(r @ [0, 0, 1], [1, 0, 0], atol=1e-9)


def test_nms_matches_reference_semantics():
    import jax.numpy as jnp
    from ros_vision_tpu.ops import nms
    # chain case: A(0.9) suppresses B(0.8); C(0.7) overlaps B but NOT A ->
    # exact greedy NMS must KEEP C (parallel-suppression approximations drop
    # it)
    raw = np.zeros((1, 5, 4), np.float32)
    raw[0, :, 0] = [100, 100, 40, 40, 0.9]
    raw[0, :, 1] = [130, 100, 40, 40, 0.8]   # IoU(A,B) ~ 0.14... make closer
    raw[0, :, 1] = [110, 100, 40, 40, 0.8]   # IoU(A,B) = 30/50 = 0.6 > 0.45
    raw[0, :, 2] = [140, 100, 40, 40, 0.7]   # IoU(B,C) = 0.6; IoU(A,C) = 0
    out = nms.parse_and_nms(jnp.asarray(raw), max_detections=4)
    kept = np.asarray(out["scores"])[0][np.asarray(out["valid"])[0]]
    assert sorted(kept.tolist(), reverse=True) == pytest.approx([0.9, 0.7])


def test_stage_timer(det):
    from ros_vision_tpu.utils.tracing import StageTimer
    img, _ = render_scene([3], [simple_square_corners(80, 60, 34)], W, H)
    timer = StageTimer(det)
    times = timer.measure(img, reps=2)
    assert set(times) == {"threshold", "ccl", "boundary", "quadfit",
                          "refine", "decode", "pose"}
    assert all(v > 0 for v in times.values())
    report = timer.report()
    assert "total" in report and "quadfit" in report
