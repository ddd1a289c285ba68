"""Calibration + launch-layer tests.

Extrinsic solver: synthetic two-camera rig with known ground-truth
extrinsics must be recovered from pairwise tag observations (the loss of
solver.py:219-260). Launch discovery: fake /dev/v4l trees exercise the
by-id / by-path / usb_port-override resolution (utils.py:198-284).
"""
import json
import os

import numpy as np
import pytest

from ros_vision_tpu.calib.extrinsic import (CameraGuess, collect_pairs,
                                            solve_extrinsics)
from ros_vision_tpu.utils import rotation_utils as ru


def _make_frameset(true_params, n_tags=40, seed=0):
    """Tags at random robot-frame positions observed by both cameras."""
    rng = np.random.default_rng(seed)
    frameset = {}
    cams = {}
    for cam_id, (angles, trans) in true_params.items():
        R = ru.compose_rotations_xyz(*angles) @ ru.camera_to_robot()
        cams[cam_id] = (R, np.asarray(trans))
    for i in range(n_tags):
        p_robot = rng.uniform([1.0, -2.0, 0.3], [4.0, 2.0, 1.5])
        recs = []
        for cam_id, (R, t) in cams.items():
            p_cam = R.T @ (p_robot - t)   # invert robot = R p_cam + t
            recs.append({"cam_id": cam_id, "translation": p_cam})
        frameset[i] = {100 + i: recs}
    return frameset


def test_extrinsic_solver_recovers_truth():
    true_params = {
        "camA": ((0.0, 0.0, 0.0), (0.0, 0.2, 0.5)),
        "camB": ((2.0, -3.0, 25.0), (0.1, -0.3, 0.4)),
    }
    frameset = _make_frameset(true_params)
    guesses = {
        "camA": CameraGuess((0.0, 0.0, 0.0), (0.0, 0.2, 0.5),
                            adjustable=False),   # anchor camera
        "camB": CameraGuess((0.0, 0.0, 15.0), (0.0, 0.0, 0.3)),
    }
    result = solve_extrinsics(frameset, guesses, num_iterations=2500,
                              learning_rate=3e-2)
    want_R = ru.compose_rotations_xyz(2.0, -3.0, 25.0) @ ru.camera_to_robot()
    got_R = np.asarray(result["camB"]["rotation"])
    ang_err = np.degrees(np.arccos(np.clip(
        (np.trace(got_R @ want_R.T) - 1) / 2, -1, 1)))
    off_err = np.abs(np.asarray(result["camB"]["offset"])
                     - [0.1, -0.3, 0.4]).max()
    assert ang_err < 1.0, ang_err
    assert off_err < 0.02, off_err


def test_collect_pairs_requires_two_views():
    frameset = {0: {5: [{"cam_id": "a", "translation": [0, 0, 1]}]}}
    with pytest.raises(ValueError):
        collect_pairs(frameset, ["a", "b"])


def _fake_v4l(tmp_path, by_id_entries, by_path_entries):
    by_id = tmp_path / "by-id"
    by_path = tmp_path / "by-path"
    dev = tmp_path / "dev"
    for d in (by_id, by_path, dev):
        d.mkdir(exist_ok=True)
    for name, idx in by_id_entries.items():
        target = dev / f"video{idx}"
        target.touch()
        (by_id / name).symlink_to(target)
    for name, idx in by_path_entries.items():
        target = dev / f"video{idx}"
        if not target.exists():
            target.touch()
        (by_path / name).symlink_to(target)
    return str(by_id), str(by_path)


def test_scan_for_cameras_by_id(tmp_path):
    from ros_vision_tpu import launch
    by_id, by_path = _fake_v4l(
        tmp_path,
        {"usb-Arducam_Camera_cam14-video-index0": 0,
         "usb-Arducam_Camera_199-video-index0": 2},
        {"pci-0000:00:14.0-usb-0:2:1.0-video-index0": 0,
         "pci-0000:00:14.0-usb-0:3:1.0-video-index0": 2})
    result = launch.scan_for_cameras(by_id, by_path)
    assert result == {"cam14": 0, "199": 2}


def test_scan_for_cameras_fallback_names(tmp_path):
    from ros_vision_tpu import launch
    by_id, by_path = _fake_v4l(
        tmp_path, {},
        {"pci-x-usb-0:2:1.0-video-index0": 4,
         "pci-x-usb-0:3:1.0-video-index0": 6})
    result = launch.scan_for_cameras(by_id, by_path)
    assert result == {"HBVCAM01": 4, "HBVCAM02": 6}


def test_scan_for_cameras_usb_override(tmp_path):
    from ros_vision_tpu import launch
    from ros_vision_tpu.config.loader import ConfigLoader
    cfg = {"camera_mounted_positions": {
        "my_cam": {"location": "center_front", "format": "MJPG",
                   "height": 400, "width": 640, "frame_rate": 30,
                   "api_preference": "ANY", "usb_port": "0:3"}}}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    ConfigLoader.set_config_file_path(str(p))
    try:
        by_id, by_path = _fake_v4l(
            tmp_path, {"usb-Foo_Camera_SN1-video-index0": 0},
            {"pci-x-usb-0:3:1.0-video-index0": 2})
        result = launch.scan_for_cameras(by_id, by_path)
        assert result["my_cam"] == 2
        assert result["SN1"] == 0
        # missing port fails fast with an actionable message
        cfg["camera_mounted_positions"]["my_cam"]["usb_port"] = "9:9.9"
        p.write_text(json.dumps(cfg))
        ConfigLoader.reload_config()
        with pytest.raises(RuntimeError, match="usb_port override"):
            launch.scan_for_cameras(by_id, by_path)
    finally:
        ConfigLoader.set_config_file_path(None)
        ConfigLoader.reload_config()


def test_scan_no_cameras_raises(tmp_path):
    from ros_vision_tpu import launch
    with pytest.raises(RuntimeError, match="No camera devices"):
        launch.scan_for_cameras(str(tmp_path / "nope1"),
                                str(tmp_path / "nope2"))


def test_load_calibration(tmp_path):
    from ros_vision_tpu.launch import load_calibration
    data = {"camera_matrix": [[900.0, 0, 640], [0, 905.0, 400], [0, 0, 1]],
            "distortion_coefficients": [[-0.1, 0.01, 0.0, 0.0, 0.001]],
            "rms": 0.3}
    (tmp_path / "calibrationmatrix_cam14.json").write_text(json.dumps(data))
    fx, fy, cx, cy, dist = load_calibration("cam14", str(tmp_path))
    assert (fx, fy, cx, cy) == (900.0, 905.0, 640.0, 400.0)
    assert dist[0] == -0.1
    assert load_calibration("missing", str(tmp_path)) is None


def test_yolo_output_contract():
    import jax.numpy as jnp
    from ros_vision_tpu.models.infer import ModelInference
    m = ModelInference(num_classes=3, scale="n", img_size=128,
                       dtype=jnp.float32)
    assert m.output_shape == (1, 7, 336)   # (4+nc, sum((128/s)^2))
    out = m.infer(np.zeros((1, 128, 128, 3), np.float32))
    assert out["boxes"].shape == (1, 100, 4)
    assert out["valid"].dtype == bool


def test_data_collector_mock(tmp_path):
    pytest.importorskip("cv2")
    from ros_vision_tpu.calib.data_collector import (collect_framesets,
                                                     load_framesets)

    class FakeCam:
        def __init__(self, val):
            self.val = val

        def read(self):
            return np.full((8, 8), self.val, np.uint8)

        def release(self):
            pass

    out = str(tmp_path / "caps")
    n = collect_framesets(out, camera_map={"a": 0, "b": 1},
                          rate_hz=100.0, duration_s=0.05,
                          camera_factory=lambda cid, dev: FakeCam(
                              50 if cid == "a" else 200))
    assert n >= 1
    sets = load_framesets(out)
    assert set(sets[0].keys()) == {"a", "b"}
    assert sets[0]["a"][0, 0] == 50


def test_replay_bag_tool(tmp_path):
    pytest.importorskip("cv2")
    from ros_vision_tpu.apriltag.render import render_scene
    from ros_vision_tpu.runtime.bags import BagWriter
    from ros_vision_tpu.tools.replay_bag import main as replay_main
    img, _ = render_scene(
        [42], [__import__("ros_vision_tpu.apriltag.render",
                          fromlist=["simple_square_corners"]
                          ).simple_square_corners(160, 80, 36)], 320, 160)
    bag = str(tmp_path / "bag")
    w = BagWriter(bag)
    w.write_image("cameras/center_front/image_raw/compressed", img,
                  jpeg_quality=98)
    w.close()
    out = str(tmp_path / "dets.jsonl")
    replay_main([bag, "--out", out, "--fx", "300", "--fy", "300"])
    rec = json.loads(open(out).readline())
    assert [d["id"] for d in rec["detections"]] == [42]


def test_calibrate_camera_cli_flow(tmp_path):
    """Drive the intrinsic-calibration CLI loop with synthetic charuco
    frames rendered from a known camera model; the recovered intrinsics
    must be close to truth (the charuco_calibrate launch flow)."""
    cv2 = pytest.importorskip("cv2")
    from ros_vision_tpu.calib.intrinsic import CharucoCalibrator
    from ros_vision_tpu.tools.calibrate_camera import run

    fx, fy, cx, cy = 600.0, 600.0, 320.0, 240.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    board = cv2.aruco.CharucoBoard(
        (11, 8), 0.02, 0.015,
        cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_100))
    board_img = board.generateImage((1100, 800))
    rng = np.random.default_rng(0)
    views = []
    corners3d = np.array([[0, 0, 0], [0.22, 0, 0], [0.22, 0.16, 0],
                          [0, 0.16, 0]], np.float32)
    for i in range(40):
        rvec = rng.uniform(-0.35, 0.35, 3)
        tvec = np.array([rng.uniform(-0.05, 0.05),
                         rng.uniform(-0.04, 0.04),
                         rng.uniform(0.35, 0.6)])
        img_pts, _ = cv2.projectPoints(corners3d, rvec, tvec, K, None)
        h = cv2.getPerspectiveTransform(
            np.array([[0, 0], [1100, 0], [1100, 800], [0, 800]], np.float32),
            img_pts.reshape(4, 2).astype(np.float32))
        view = cv2.warpPerspective(board_img, h, (640, 480),
                                   borderValue=255)
        views.append(view)

    class SeqCam:
        def __init__(self):
            self.i = 0

        def read(self):
            v = views[self.i % len(views)]
            self.i += 1
            return v

    cal = CharucoCalibrator(max_frames=3)
    path = run(SeqCam(), cal, "testcam", str(tmp_path), max_seconds=30)
    assert path is not None
    data = json.loads(open(path).read())
    m = np.asarray(data["camera_matrix"])
    assert abs(m[0, 0] - fx) / fx < 0.1
    assert abs(m[1, 2] - cy) / cy < 0.15


def test_model_checkpoint_roundtrip(tmp_path):
    """Orbax + npz persistence of detector weights (checkpoint/resume)."""
    import jax.numpy as jnp
    from ros_vision_tpu.models.infer import ModelInference
    m = ModelInference(num_classes=1, scale="n", img_size=64,
                       dtype=jnp.float32)
    import jax
    leaf0 = jax.tree_util.tree_leaves(m.variables)[0]
    # npz
    npz = str(tmp_path / "w.npz")
    m.save_params(npz)
    m2 = ModelInference(num_classes=1, scale="n", img_size=64,
                        params_path=npz, dtype=jnp.float32)
    leaf2 = jax.tree_util.tree_leaves(m2.variables)[0]
    assert np.array_equal(np.asarray(leaf0), np.asarray(leaf2))
    # orbax
    ck = str(tmp_path / "ckpt")
    m.save_checkpoint(ck)
    m3 = ModelInference(num_classes=1, scale="n", img_size=64,
                        dtype=jnp.float32)
    m3.load_checkpoint(ck)
    leaf3 = jax.tree_util.tree_leaves(m3.variables)[0]
    assert np.array_equal(np.asarray(leaf0), np.asarray(leaf3))


def test_mixed_resolution_fail_fast(tmp_path):
    """Heterogeneous camera geometries must be rejected with a clear error
    (the batch axis requires one frame shape; silent ring corruption is the
    alternative)."""
    import json
    import pytest
    from ros_vision_tpu.config.loader import ConfigLoader
    from ros_vision_tpu.launch import VisionSystem
    cfg = {
        "camera_mounted_positions": {
            "a": {"location": "left", "format": "MJPG", "height": 160,
                  "width": 320, "frame_rate": 30, "api_preference": "ANY"},
            "b": {"location": "right", "format": "MJPG", "height": 200,
                  "width": 400, "frame_rate": 30, "api_preference": "ANY"},
        },
        "extrinsics": {},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    ConfigLoader.set_config_file_path(str(p))
    try:
        with pytest.raises(RuntimeError, match="mixed resolutions"):
            VisionSystem(enable_viewer=False, enable_nt=False,
                         camera_map={"a": 0, "b": 1})
    finally:
        ConfigLoader.set_config_file_path(None)
        ConfigLoader.reload_config()
