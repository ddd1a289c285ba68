"""Runtime component tests.

Mirrors the reference's node-level test strategy (SURVEY.md section 4):
dependency-injected mock camera with failure injection
(test_camera_publisher.cpp + mock_camera.hpp), drop-oldest queue behavior
(publisher_queue.hpp), NT round-trip against an isolated in-process server
(apriltag_sender_test.cu), config loading with temp-file override
(test_config_loader.cpp), rotation math (test_rotation_utils.cpp),
bag record/extract (bag_utils), timing report (timing_report.py).
"""
import json
import logging
import os
import time

import numpy as np
import pytest

logging.disable(logging.CRITICAL)


# ---- publisher queue ------------------------------------------------------

def test_publisher_queue_drop_oldest():
    from ros_vision_tpu.runtime.publisher_queue import PublisherQueue
    got = []
    import threading
    gate = threading.Event()

    def pub(x):
        gate.wait(2)
        got.append(x)

    q = PublisherQueue(pub, max_queue_size=2)
    for i in range(6):
        q.enqueue(i)
        time.sleep(0.01)
    gate.set()
    q.stop()
    # oldest entries were dropped; later ones delivered in order
    assert got == sorted(got)
    assert q.dropped > 0
    assert got[-1] == 5


# ---- frame ring -----------------------------------------------------------

@pytest.mark.parametrize("force_python", [True, False])
def test_frame_ring(force_python):
    from ros_vision_tpu.runtime.frame_pipe import FrameRing
    ring = FrameRing(16, n_slots=4, force_python=force_python)
    assert ring.latest() is None
    f0 = np.arange(16, dtype=np.uint8)
    ring.push(f0, timestamp_ns=123)
    buf, fid, ts = ring.latest()
    assert fid == 0 and np.array_equal(buf, f0)
    if not force_python:
        assert ts == 123
    # newest wins; last_seen filtering works
    for i in range(1, 7):
        ring.push(np.full(16, i, np.uint8))
    buf, fid, ts = ring.latest()
    assert fid == 6 and buf[0] == 6
    assert ring.latest(last_seen_id=6) is None
    ring.close()


def test_frame_pipe_batch():
    from ros_vision_tpu.runtime.frame_pipe import FramePipe
    pipe = FramePipe(3, 4, 4)
    pipe.push(0, np.full((4, 4), 1, np.uint8))
    pipe.push(2, np.full((4, 4), 7, np.uint8))
    batch, ids, stamps = pipe.pull_batch()
    assert batch.shape == (3, 4, 4)
    assert batch[0, 0, 0] == 1 and batch[2, 0, 0] == 7
    assert batch[1].sum() == 0 and ids[1] == -1


@pytest.mark.parametrize("force_python", [True, False])
def test_frame_ring_bgr_push_matches_cv2(force_python):
    """FrameRing.push accepts BGR8 and converts in-ring, bit-exact vs
    cv2.cvtColor(COLOR_BGR2GRAY) — the capture thread no longer runs a
    separate cvtColor pass (the reference's per-frame conversion cost,
    apriltags_cuda_detector.cu:399-401)."""
    import cv2

    from ros_vision_tpu.runtime.frame_pipe import FrameRing, bgr_to_gray
    rng = np.random.default_rng(7)
    bgr = rng.integers(0, 256, (48, 64, 3), np.uint8)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    # the in-tree coefficients match OpenCV >= 5's 15-bit fixed point
    # exactly; OpenCV <= 4.x used a 14-bit variant 1 LSB off on ~0.26%
    # of triples — tolerate that delta so the suite passes either way
    atol = 0 if int(cv2.__version__.split(".")[0]) >= 5 else 1
    assert np.max(np.abs(bgr_to_gray(bgr).astype(int) - ref.astype(int))) \
        <= atol
    ring = FrameRing(48 * 64, n_slots=4, force_python=force_python)
    ring.push(bgr, timestamp_ns=55)
    latest = ring.latest()
    assert latest is not None
    buf, fid, ts = latest
    assert fid == 0
    assert np.max(np.abs(buf.reshape(48, 64).astype(int)
                         - ref.astype(int))) <= atol
    ring.close()


@pytest.mark.parametrize("force_python", [True, False])
def test_frame_ring_latest_into_out_buffer(force_python):
    """latest(out=) writes the frame in place (pull_batch's zero-alloc
    path) and pull_batch zeroes rows that saw no frame."""
    from ros_vision_tpu.runtime.frame_pipe import FramePipe, FrameRing
    ring = FrameRing(16, n_slots=4, force_python=force_python)
    f = np.arange(16, dtype=np.uint8)
    ring.push(f)
    out = np.full(16, 99, np.uint8)
    buf, fid, ts = ring.latest(out=out)
    assert np.array_equal(out, f) and buf.base is not None
    ring.close()
    pipe = FramePipe(2, 4, 4)
    pipe.push(0, np.full((4, 4), 3, np.uint8))
    batch, ids, _ = pipe.pull_batch()
    assert batch[0, 0, 0] == 3 and ids == [0, -1]
    assert batch[1].sum() == 0     # absent camera row stays zeroed


def test_zero_copy_ring_converts_on_pull():
    """zero_copy=True: push is a reference handoff (no copy, no
    conversion) and latest() converts BGR->gray on the consumer side,
    bit-compatible with the copying ring's push-time conversion. The mode
    exists for CPU-starved hosts where capture threads converting every
    frame at camera rate starve the spin loop."""
    import cv2

    from ros_vision_tpu.runtime.frame_pipe import FrameRing
    rng = np.random.default_rng(11)
    bgr = rng.integers(0, 256, (48, 64, 3), np.uint8)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    ring = FrameRing(48 * 64, zero_copy=True)
    assert ring.latest() is None
    fid = ring.push(bgr, timestamp_ns=77)
    assert fid == 0 and ring.head == 1
    # out= path: converted straight into the (H, W) batch row
    out = np.zeros((48, 64), np.uint8)
    buf, fid, ts = ring.latest(out=out)
    assert fid == 0 and ts == 77
    assert np.array_equal(out, ref)
    # no-out path allocates; gray frames pass through unconverted
    buf2, _, _ = ring.latest()
    assert np.array_equal(buf2.reshape(48, 64), ref)
    gray = np.arange(48 * 64, dtype=np.uint8).reshape(48, 64)
    ring.push(gray)
    buf3, fid3, _ = ring.latest()
    assert fid3 == 1 and np.array_equal(buf3.reshape(48, 64), gray)
    # last_seen filtering matches the ring semantics
    assert ring.latest(last_seen_id=1) is None
    ring.close()


def test_zero_copy_pipe_matches_copying_pipe():
    """FramePipe(zero_copy=True) pull_batch output is identical to the
    copying pipe's for the same pushed frames (same ids/stamps/pixels)."""
    from ros_vision_tpu.runtime.frame_pipe import FramePipe
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (8, 6, 3), np.uint8) for _ in range(2)]
    pipes = [FramePipe(2, 8, 6, zero_copy=zc) for zc in (False, True)]
    for pipe in pipes:
        for cam, f in enumerate(frames):
            pipe.push(cam, f, timestamp_ns=100 + cam)
    (b0, i0, s0), (b1, i1, s1) = [p.pull_batch() for p in pipes]
    assert i0 == i1 and s0 == s1
    assert np.array_equal(b0, b1)


# ---- camera publisher with mock + failure injection -----------------------

def test_camera_publisher_mock():
    from ros_vision_tpu.config.loader import CameraConfig
    from ros_vision_tpu.runtime.camera import CameraPublisher, MockCamera
    from ros_vision_tpu.runtime.frame_pipe import FrameRing
    cam = MockCamera(width=8, height=6)
    ring = FrameRing(48, n_slots=4)
    pub = CameraPublisher(cam, CameraConfig(width=8, height=6),
                          device=0, ring=ring)
    assert pub.init()
    pub.start()
    time.sleep(0.1)
    assert pub.frames_captured > 0
    cam.set_read_failure(True)
    time.sleep(0.05)
    assert pub.read_failures > 0
    cam.set_read_failure(False)
    time.sleep(0.05)
    assert pub.consecutive_failures == 0   # auto-recovery
    pub.stop()
    assert ring.latest() is not None


# ---- NT4 round-trip --------------------------------------------------------

def test_nt4_roundtrip():
    from ros_vision_tpu.runtime.nt4 import AprilTagDataSender, NT4TestServer
    srv = NT4TestServer()
    s = AprilTagDataSender("april_tags", "127.0.0.1", port=srv.port)
    s.send_value([1.0, 554.0, 0.1, 0.2, 0.3])
    s.send_protobuf(b"\x08\x01")
    assert srv.wait_for(2)
    names = [r[0] for r in srv.received]
    assert "/SmartDashboard/april_tags" in names
    assert "/SmartDashboard/april_tags_protobuf" in names
    vals = dict((r[0], r[2]) for r in srv.received)
    assert vals["/SmartDashboard/april_tags"] == [1.0, 554.0, 0.1, 0.2, 0.3]
    assert vals["/SmartDashboard/april_tags_protobuf"] == b"\x08\x01"
    s.close()
    srv.close()


def test_nt4_reconnect():
    """Kill and restart the NT4 server mid-stream: the sender must keep
    running (sends drop, never raise) and resume publishing when the server
    returns — the reference's ntcore client reconnects to the roboRIO
    forever (AprilTagDataSender.cpp relies on that)."""
    import time as _time
    from ros_vision_tpu.runtime.nt4 import (
        AprilTagDataSender, NT4Client, NT4TestServer)
    NT4Client.RECONNECT_INTERVAL = 0.1   # fast test cadence
    srv = NT4TestServer()
    port = srv.port
    s = AprilTagDataSender("april_tags", "127.0.0.1", port=port)
    s.send_value([1.0, 5.0, 0.1, 0.2, 0.3])
    assert srv.wait_for(1)
    srv.close()
    _time.sleep(0.1)
    # sends while the server is down must not raise
    for _ in range(3):
        s.send_value([2.0, 6.0, 0.0, 0.0, 0.0])
        _time.sleep(0.05)
    srv2 = NT4TestServer(port=port)
    deadline = _time.monotonic() + 10.0
    got = False
    while _time.monotonic() < deadline:
        s.send_value([3.0, 7.0, 0.4, 0.5, 0.6])
        if srv2.wait_for(1, timeout=0.2):
            got = True
            break
    assert got, "sender did not resume publishing after server restart"
    # the topic must have been re-announced on the new connection
    names = [p["name"] for p in srv2._announced]
    assert "/SmartDashboard/april_tags" in names
    vals = [r[2] for r in srv2.received
            if r[0] == "/SmartDashboard/april_tags"]
    assert [3.0, 7.0, 0.4, 0.5, 0.6] in vals
    s.close()
    srv2.close()


def test_msgpack_roundtrip():
    from ros_vision_tpu.runtime import msgpack_mini as mp
    cases = [None, True, False, 0, 7, 127, 128, -5, -100, 70000, -70000,
             3.14, "hello", b"\x00\x01", [1, [2.5, "x"], b"y"],
             {"a": 1, "b": [2]}, list(range(40))]
    for c in cases:
        v, off = mp.unpack(mp.pack(c))
        assert v == c, c


# ---- proto ----------------------------------------------------------------

def test_proto_roundtrip():
    from ros_vision_tpu.msg import apriltag_pb2 as pb
    from ros_vision_tpu.msg.types import encode_apriltag_list_proto

    class D:
        tag_id = 554
        pose_t = (0.1, 0.2, 0.3)

    payload = encode_apriltag_list_proto([D()], 1.5)
    m = pb.ApriltagListProto()
    m.ParseFromString(payload)
    assert m.tags[0].tag_id == 554
    assert abs(m.tags[0].x - 0.1) < 1e-12
    assert abs(m.tags[0].collect_time - 1.5) < 1e-12


# ---- config loader ---------------------------------------------------------

def test_config_loader(tmp_path):
    from ros_vision_tpu.config.loader import (
        ConfigLoader, api_preference_from_string, fourcc_from_string)
    cfg = {
        "camera_mounted_positions": {
            "cam1": {"location": "left_front", "format": "MJPG",
                     "height": 800, "width": 1280, "frame_rate": 100,
                     "api_preference": "V4L2", "usb_port": "0:2"}},
        "extrinsics": {"left_front": {
            "rotation": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
            "offset": [0.1, 0.2, 0.3]}},
        "network_tables_config": {"table_address": "10.7.66.2",
                                  "table_name": "/Vision"},
    }
    p = tmp_path / "system_config.json"
    p.write_text(json.dumps(cfg))
    ConfigLoader.set_config_file_path(str(p))
    try:
        c = ConfigLoader.get_camera_config("cam1")
        assert c.location == "left_front" and c.frame_rate == 100
        assert c.usb_port == "0:2"
        assert ConfigLoader.get_camera_config("nope") is None
        e = ConfigLoader.get_extrinsic_config("left_front")
        assert e.offset == [0.1, 0.2, 0.3]
        nt = ConfigLoader.get_network_tables_config()
        assert nt.table_name == "/Vision"
        assert fourcc_from_string("MJPG") == 0x47504A4D
        assert api_preference_from_string("V4L2") == 200
    finally:
        ConfigLoader.set_config_file_path(None)
        ConfigLoader.reload_config()


# ---- rotation utils --------------------------------------------------------

def test_rotation_utils():
    from ros_vision_tpu.utils import rotation_utils as ru
    assert np.allclose(ru.rot_x(0), np.eye(3))
    assert np.allclose(ru.rot_z(90) @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    assert np.allclose(ru.rot_y(90) @ [1, 0, 0], [0, 0, -1], atol=1e-12)
    c2r = ru.camera_to_robot()
    # camera z (forward) -> robot x (forward)
    assert np.allclose(c2r @ [0, 0, 1], [1, 0, 0], atol=1e-12)
    # camera y (down) -> robot -z
    assert np.allclose(c2r @ [0, 1, 0], [0, 0, -1], atol=1e-12)
    r = ru.compose_rotations_xyz(10, 20, 30)
    assert np.allclose(r, ru.rot_z(30) @ ru.rot_y(20) @ ru.rot_x(10))
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-12)


# ---- vision node -----------------------------------------------------------

def test_vision_node_transform_and_sort():
    from ros_vision_tpu.runtime.vision_node import CameraChannel, VisionNode

    class FakeDet:
        def __init__(self, tag_id, t):
            self.tag_id = tag_id
            self.hamming = 0
            self.decision_margin = 50.0
            self.center = np.array([10.0, 10.0])
            self.corners = np.zeros((4, 2))
            self.pose_t = np.asarray(t)

    class FakeDetector:
        def detect(self, frames, intrinsics=None):
            return [[FakeDet(5, [0, 0, 3.0]), FakeDet(1, [0, 0, 1.0])]]

    poses = []
    ch = CameraChannel(
        location="center_front",
        extrinsic_rotation=np.asarray(
            [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float),
        extrinsic_offset=np.array([0.5, 0.0, 0.0]),
        pose_publisher=poses.append)
    node = VisionNode(FakeDetector(), [ch])
    frames = np.zeros((1, 16, 16), np.uint8)
    results = node.process_batch(frames)
    dets, robot = results[0]
    # closest-first: tag 1 at z=1.0 -> robot x = 1.5, before tag 5 (x=3.5)
    assert [d.tag_id for d in dets] == [1, 5]
    assert np.allclose(robot[0], [1.5, 0, 0])
    assert np.allclose(robot[1], [3.5, 0, 0])
    assert poses and poses[0].detections[0].id == 1
    node.stop()


# ---- bags ------------------------------------------------------------------

def test_bag_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from ros_vision_tpu.runtime.bags import BagReader, BagWriter, \
        extract_images
    d = str(tmp_path / "bag")
    w = BagWriter(d)
    img = np.random.default_rng(0).integers(0, 255, (32, 48),
                                            np.uint8).astype(np.uint8)
    assert w.write_image("cameras/center_front/image_raw/compressed", img)
    assert w.write("apriltags/center_front/pose", b"\x01\x02",
                   {"ids": [554]})
    w.close()
    r = BagReader(d)
    assert set(r.topics()) == {"cameras/center_front/image_raw/compressed",
                               "apriltags/center_front/pose"}
    hdr, payload = next(r.read("apriltags/center_front/pose"))
    assert hdr["ids"] == [554] and payload == b"\x01\x02"
    out = str(tmp_path / "frames")
    n = extract_images(d, out)
    assert n == 1 and len(os.listdir(out)) == 1


# ---- timing report ---------------------------------------------------------

def test_timing_report(tmp_path):
    from ros_vision_tpu.runtime.timing import TimingLogger
    from ros_vision_tpu.tools.timing_report import column_stats, make_report
    path = str(tmp_path / "timing.csv")
    tl = TimingLogger(path)
    for i in range(50):
        tl.record(latency_us=1000 + i, det_time_us=5000,
                  processing_time_us=8000 + 10 * i)
    tl.close()
    md = make_report(path, str(tmp_path), plots=False)
    text = open(md).read()
    assert "latency_us" in text and "p99" in text
    import pandas as pd
    s = column_stats(pd.read_csv(path)["latency_us"])
    assert s["count"] == 50 and 1000 <= s["p50"] <= 1049


# ---- scheduler -------------------------------------------------------------

def test_scheduler_affinity():
    from ros_vision_tpu.runtime.scheduler import set_affinity
    import os as _os
    n = len(_os.sched_getaffinity(0))
    if n >= 2:
        assert set_affinity([0, 1])
        assert _os.sched_getaffinity(0) == {0, 1}
        set_affinity(list(range(n)))


def test_viewer_streams_jpeg():
    cv2 = pytest.importorskip("cv2")
    from websockets.sync.client import connect
    from ros_vision_tpu.runtime.viewer import ImageStreamServer
    import socket
    # pick a free port pair
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    srv = ImageStreamServer(port=port)
    try:
        ws = connect(f"ws://127.0.0.1:{port + 1}/image")
        time.sleep(0.1)
        img = np.random.default_rng(0).integers(0, 255, (32, 48),
                                                np.uint8).astype(np.uint8)
        for _ in range(5):
            srv.publish(img)
            time.sleep(0.02)
        payload = ws.recv(timeout=3)
        assert isinstance(payload, (bytes, bytearray))
        dec = cv2.imdecode(np.frombuffer(payload, np.uint8),
                           cv2.IMREAD_UNCHANGED)
        assert dec is not None and dec.shape[:2] == (32, 48)
        ws.close()
    finally:
        srv.close()


def test_proto_robot_frame_positions():
    """The protobuf must carry robot-frame positions when provided (the
    reference fills it from robot_position, not the camera pose —
    apriltags_cuda_detector.cu:483-487)."""
    import numpy as np
    from ros_vision_tpu.msg import apriltag_pb2 as pb
    from ros_vision_tpu.msg.types import encode_apriltag_list_proto

    class D:
        tag_id = 7
        pose_t = np.array([9.0, 9.0, 9.0])      # camera frame (wrong frame)

    payload = encode_apriltag_list_proto(
        [D()], 2.0, positions=[np.array([1.0, 2.0, 3.0])])
    m = pb.ApriltagListProto()
    m.ParseFromString(payload)
    assert (m.tags[0].x, m.tags[0].y, m.tags[0].z) == (1.0, 2.0, 3.0)


def test_closest_first_uses_camera_frame_distance():
    """Sort key = camera-frame distance (apriltags_cuda_detector.cu:443-447):
    with a large extrinsic offset, robot-frame norms would give the
    opposite order."""
    import numpy as np
    from ros_vision_tpu.runtime.vision_node import CameraChannel, VisionNode

    class D:
        def __init__(self, tid, z):
            self.tag_id = tid
            self.pose_t = np.array([0.0, 0.0, z])
            self.pose_R = np.eye(3)
            self.hamming = 0
            self.decision_margin = 50.0
            self.corners = np.zeros((4, 2))
            self.center = np.zeros(2)

    class Det:
        def detect(self, frames, intrinsics=None):
            # tag 1 is NEAR in camera frame; the -3 m x offset makes it FAR
            # in robot frame (rotation maps camera z -> robot x)
            return [[D(2, 2.0), D(1, 0.5)]]

    ch = CameraChannel(location="c",
                       extrinsic_rotation=np.array([[0., 0., 1.],
                                                    [-1., 0., 0.],
                                                    [0., -1., 0.]]),
                       extrinsic_offset=np.array([-3.0, 0.0, 0.0]))
    node = VisionNode(Det(), [ch])
    (dets, robot), = node.process_batch(np.zeros((1, 16, 16), np.uint8),
                                        [0.0])
    assert [d.tag_id for d in dets] == [1, 2]


def test_deferred_publish_drop_oldest_and_stop_never_hangs():
    """A wedged publisher must never backpressure the spin loop (the r4
    official streaming capture's 452 ms p50 failure mode): deferred
    enqueue never blocks, old batches are shed (counted), and stop()
    returns even while the sender is stalled mid-send."""
    import threading
    from ros_vision_tpu.runtime.vision_node import CameraChannel, VisionNode

    release = threading.Event()
    sent = []

    class WedgedSender:
        def send_value(self, values):
            sent.append(values)
            release.wait(timeout=30)   # wedged until the test releases it

        def send_protobuf(self, payload):
            pass

    class FakeDetector:
        def detect(self, frames, intrinsics=None):
            return [[]]

        def unpack(self, pending):
            return [[]]

    ch = CameraChannel(location="center_front",
                       extrinsic_rotation=np.eye(3),
                       extrinsic_offset=np.zeros(3))
    node = VisionNode(FakeDetector(), [ch],
                      tag_sender={"center_front": WedgedSender()})
    frames = np.zeros((1, 16, 16), np.uint8)
    t0 = time.monotonic()
    for _ in range(20):
        node.process_batch(frames, pending=object(), defer_publish=True)
    enqueue_time = time.monotonic() - t0
    # 20 batches against a wedged sender: enqueue must not block (the old
    # maxsize-8 FIFO blocked here) and the bounded queue must shed
    assert enqueue_time < 1.0, f"deferred enqueue blocked {enqueue_time}s"
    assert node.publish_dropped >= 20 - node.publish_queue_depth - 1
    assert len(sent) <= 2          # worker is stuck inside the first send
    release.set()                  # un-wedge so stop() drains fast
    t0 = time.monotonic()
    node.stop()
    assert time.monotonic() - t0 < 15


def test_pull_batch_waits_for_all_cameras():
    """pull_batch(wait_new=True) must wait for EVERY camera (bounded by
    the timeout), not return on the first fresh frame — an any-camera
    return zeroes laggard rows against stale stamps."""
    import threading
    from ros_vision_tpu.runtime.frame_pipe import FramePipe

    pipe = FramePipe(2, 4, 4)
    pipe.push(0, np.full((4, 4), 1, np.uint8), timestamp_ns=10)
    pipe.push(1, np.full((4, 4), 2, np.uint8), timestamp_ns=20)
    batch, ids, _ = pipe.pull_batch(wait_new=True)
    assert ids == [0, 0]

    # camera 0 refreshes immediately; camera 1 lands 20 ms later — the
    # pull must hold for it instead of zeroing its row
    pipe.push(0, np.full((4, 4), 3, np.uint8), timestamp_ns=30)

    def late_push():
        time.sleep(0.02)
        pipe.push(1, np.full((4, 4), 4, np.uint8), timestamp_ns=40)

    t = threading.Thread(target=late_push)
    t.start()
    batch, ids, stamps = pipe.pull_batch(wait_new=True, timeout_s=1.0)
    t.join()
    assert ids == [1, 1]
    assert batch[1, 0, 0] == 4 and stamps[1] == 40

    # a genuinely absent camera still falls through at the deadline with
    # its row zeroed (previous behavior preserved)
    pipe.push(0, np.full((4, 4), 5, np.uint8), timestamp_ns=50)
    batch, ids, _ = pipe.pull_batch(wait_new=True, timeout_s=0.05)
    assert ids[0] == 2 and ids[1] == -1 and batch[1].sum() == 0
