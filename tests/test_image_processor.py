"""ImageProcessorNode — parity with the reference demo subscriber
(image_processor_node.cpp): per-frame mean intensity + processing-time log
over the frame-ring transport."""
import logging
import time

import numpy as np

from ros_vision_tpu.runtime.frame_pipe import FrameRing
from ros_vision_tpu.runtime.image_processor import ImageProcessorNode


def test_mean_intensity_math():
    node = ImageProcessorNode()
    frame = np.full((4, 6, 3), 200, np.uint8)
    frame[..., 0] = 100  # bgr mean = (100+200+200)/3
    got = node.process(frame)
    assert abs(got - (100 + 200 + 200) / 3) < 1e-9
    assert node.frames_processed == 1


def test_ring_subscription_and_log(caplog):
    ring = FrameRing(frame_bytes=24, n_slots=4, force_python=True)
    node = ImageProcessorNode(ring)
    with caplog.at_level(logging.INFO, logger="image_processor"):
        node.start()
        for val in (10, 50, 250):
            ring.push(np.full(24, val, np.uint8), timestamp_ns=val)
            time.sleep(0.02)
        deadline = time.time() + 2
        while node.frames_processed < 1 and time.time() < deadline:
            time.sleep(0.01)
        node.stop()
    assert node.frames_processed >= 1
    assert node.last_mean_intensity == 250.0  # drop-oldest: newest wins
    assert any("Mean Intensity" in r.message for r in caplog.records)
