"""ROS2 bag (rosbag2/sqlite3 + CDR) reading/writing tests.

Parity targets: bag_utils/extract_images.py:20-118 (encoding matrix,
metadata synthesis, extraction layout) and the `ros2 bag record` storage
schema, implemented from scratch in runtime/rosbag2.py.
"""
import glob
import json
import os

import numpy as np
import pytest

from ros_vision_tpu.runtime import rosbag2 as rb


def test_cdr_image_roundtrip():
    rng = np.random.default_rng(0)
    for enc, arr in [
        ("mono8", rng.integers(0, 255, (24, 32), dtype=np.uint8)),
        ("bgr8", rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)),
        ("16UC1", rng.integers(0, 65535, (8, 12), dtype=np.uint16)),
    ]:
        raw = rb.serialize_image(arr, enc, stamp_ns=1_234_567_890_123,
                                 frame_id="cam0")
        msg = rb.parse_image(raw)
        assert msg["encoding"] == enc
        assert msg["frame_id"] == "cam0"
        assert msg["stamp_sec"] == 1234 and msg["stamp_nsec"] == 567890123
        assert (msg["height"], msg["width"]) == arr.shape[:2]
        assert msg["data"] == arr.tobytes()


def test_image_to_array_encodings():
    import cv2
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 255, (10, 14), dtype=np.uint8)
    bgr = rng.integers(0, 255, (10, 14, 3), dtype=np.uint8)
    # mono8 / 8UC1 passthrough
    for enc in ("mono8", "8UC1"):
        msg = rb.parse_image(rb.serialize_image(gray, enc))
        assert np.array_equal(rb.image_to_array(msg), gray)
    # rgb8 -> BGR conversion
    msg = rb.parse_image(rb.serialize_image(bgr, "rgb8"))
    assert np.array_equal(rb.image_to_array(msg),
                          cv2.cvtColor(bgr, cv2.COLOR_RGB2BGR))
    # 16UC1 -> scaled 8-bit (extract_images.py:54-57)
    img16 = (gray.astype(np.uint16) << 8)
    msg = rb.parse_image(rb.serialize_image(img16, "16UC1"))
    assert np.array_equal(rb.image_to_array(msg), gray)
    # unsupported encoding -> None, no crash
    msg = rb.parse_image(rb.serialize_image(gray, "bayer_rggb8"))
    assert rb.image_to_array(msg) is None


def test_bag_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 255, (32, 40), dtype=np.uint8)
    # smooth image for the jpeg path: jpeg at q=90 obliterates pure noise
    yy, xx = np.mgrid[0:32, 0:40]
    bgr = np.stack([(yy * 8) % 256, (xx * 6) % 256,
                    ((yy + xx) * 4) % 256], -1).astype(np.uint8)
    bag = str(tmp_path / "mybag")
    with rb.Rosbag2Writer(bag) as w:
        w.write_image("/cam0/image_raw", gray, 1_000)
        w.write_image("/cam0/image_raw", gray + 1, 2_000)
        w.write_image("/cam1/image_raw", bgr, 1_500)
        w.write_compressed("/cam1/compressed", bgr, 3_000)
    assert os.path.exists(os.path.join(bag, "metadata.yaml"))

    r = rb.Rosbag2Reader(bag)
    assert set(r.image_topics()) == {"/cam0/image_raw", "/cam1/image_raw",
                                     "/cam1/compressed"}
    assert r.topics["/cam0/image_raw"]["type"] == rb.IMAGE_TYPE
    assert r.topics["/cam1/compressed"]["type"] == rb.COMPRESSED_TYPE

    frames = list(r.read_images("/cam0/image_raw"))
    assert [ts for ts, _ in frames] == [1_000, 2_000]
    assert np.array_equal(frames[0][1], gray)
    assert np.array_equal(frames[1][1], gray + 1)
    # timestamp-ordered merged stream
    order = [ts for _t, _y, ts, _raw in r.messages()]
    assert order == sorted(order)
    # jpeg roundtrip is lossy but close
    (_, dec), = r.read_images("/cam1/compressed")
    assert dec.shape == bgr.shape
    assert np.abs(dec.astype(int) - bgr.astype(int)).mean() < 20


def test_metadata_synthesis(tmp_path):
    """Bags that lost metadata.yaml must still open
    (extract_images.py:68-117)."""
    bag = str(tmp_path / "lost")
    with rb.Rosbag2Writer(bag) as w:
        w.write_image("/c/image_raw",
                      np.zeros((8, 8), np.uint8), 1)
    os.remove(os.path.join(bag, "metadata.yaml"))
    r = rb.Rosbag2Reader(bag)
    assert os.path.exists(os.path.join(bag, "metadata.yaml"))
    assert r.image_topics() == ["/c/image_raw"]


def test_extract_images(tmp_path):
    rng = np.random.default_rng(3)
    bag = str(tmp_path / "bag")
    with rb.Rosbag2Writer(bag) as w:
        for i in range(6):
            w.write_image("/front/image_raw",
                          rng.integers(0, 255, (16, 16), dtype=np.uint8),
                          (i + 1) * 1_000_000_000)
        for i in range(2):
            w.write_image("/other/depth",
                          rng.integers(0, 65535, (8, 8), dtype=np.uint16),
                          500 + i, encoding="16UC1")
    out = str(tmp_path / "out")
    stats = rb.extract_images(bag, out, skip_frames=2)
    assert stats["/front/image_raw"] == {"extracted": 3, "skipped": 3,
                                         "errors": 0}
    assert stats["/other/depth"]["extracted"] == 1
    assert len(glob.glob(os.path.join(out, "front_image_raw", "*.png"))) == 3
    # topic filter
    stats = rb.extract_images(bag, str(tmp_path / "out2"),
                              topic_filter="front", max_images=2)
    assert list(stats) == ["/front/image_raw"]
    assert stats["/front/image_raw"]["extracted"] == 2


def test_replay_ros2_bag_through_detector(tmp_path):
    """End-to-end: a real-format ROS2 bag replays through the TPU detector
    (the reference workflow: record with ros2 bag, reprocess offline)."""
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.tools import replay_bag

    img, _ = render_scene([42], [simple_square_corners(160, 80, 36)],
                          320, 160)
    bag = str(tmp_path / "scene_bag")
    with rb.Rosbag2Writer(bag) as w:
        w.write_image("/center/image_raw", img, 1_000_000_000)
        w.write_compressed("/center/compressed", img, 2_000_000_000)
    out = str(tmp_path / "dets.jsonl")
    replay_bag.main([bag, "--topic", "/center/image_raw", "--out", out,
                     "--fx", "300", "--fy", "300"])
    rows = [json.loads(line) for line in open(out)]
    assert len(rows) == 1
    assert [d["id"] for d in rows[0]["detections"]] == [42]


def test_malformed_message_survives(tmp_path):
    """One corrupt record must not kill extraction/replay (the reference
    counts per-message errors and continues, extract_images.py:243-245)."""
    bag = str(tmp_path / "corrupt")
    good = np.full((8, 8), 7, np.uint8)
    with rb.Rosbag2Writer(bag) as w:
        w.write_image("/c/image_raw", good, 1)
        w.add_topic("/c/image_raw", rb.IMAGE_TYPE)
        w.write("/c/image_raw", 2, b"\x00\x01\x00\x00\x01\x02")  # truncated
        w.write_image("/c/image_raw", good, 3)
    r = rb.Rosbag2Reader(bag)
    frames = list(r.read_images("/c/image_raw"))
    assert len(frames) == 3
    assert frames[1][1] is None
    assert np.array_equal(frames[0][1], good)
    assert np.array_equal(frames[2][1], good)
    stats = rb.extract_images(bag, str(tmp_path / "out"))
    assert stats["/c/image_raw"] == {"extracted": 2, "skipped": 0,
                                     "errors": 1}


def test_extract_images_cli(tmp_path):
    """The extract_images console tool (bag_utils extract_images parity)."""
    from ros_vision_tpu.tools import extract_images as cli
    bag = str(tmp_path / "clibag")
    with rb.Rosbag2Writer(bag) as w:
        for i in range(4):
            w.write_image("/cam/image_raw",
                          np.full((8, 8), i, np.uint8),
                          (i + 1) * 1_000_000_000)
    out = str(tmp_path / "out")
    rc = cli.main([bag, "-o", out, "-s", "2", "-t", "cam"])
    assert rc == 0
    assert len(glob.glob(os.path.join(out, "cam_image_raw", "*.png"))) == 2
    assert cli.main([str(tmp_path / "nope"), "-o", out]) == 1


def test_ros2_bag_recorder_adapter(tmp_path):
    """VisionSystem's bag_recording.format='ros2' path: the BagWriter-shaped
    adapter produces a real rosbag2 directory."""
    from ros_vision_tpu.launch import _Ros2BagRecorder
    d = str(tmp_path / "recbag")
    rec = _Ros2BagRecorder(d)
    img = np.full((16, 16), 90, np.uint8)
    assert rec.write_image("cameras/center/image_raw/compressed", img,
                           t=1.5)
    rec.close()
    r = rb.Rosbag2Reader(d)
    assert r.image_topics() == ["/cameras/center/image_raw/compressed"]
    (ts, dec), = r.read_images("/cameras/center/image_raw/compressed")
    assert ts == 1_500_000_000
    assert abs(int(dec.mean()) - 90) < 3


def test_bag_format_config(tmp_path):
    import json
    from ros_vision_tpu.config.loader import ConfigLoader
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "camera_mounted_positions": {},
        "bag_recording": {"output_directory": str(tmp_path),
                          "format": "ros2"}}))
    ConfigLoader.set_config_file_path(str(p))
    try:
        assert ConfigLoader.get_bag_recording_config().format == "ros2"
    finally:
        ConfigLoader.set_config_file_path(None)
        ConfigLoader.reload_config()
