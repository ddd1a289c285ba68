"""Game-piece node tests (the reference's node is a TODO stub — ours runs)."""
import numpy as np
import pytest


def test_game_piece_node_runs():
    pytest.importorskip("cv2")
    import jax.numpy as jnp
    from ros_vision_tpu.models.infer import ModelInference
    from ros_vision_tpu.runtime.game_piece_node import GamePieceNode
    eng = ModelInference(num_classes=2, scale="n", img_size=128,
                         class_names=["ball", "cube"], dtype=jnp.float32)
    published = []
    node = GamePieceNode(engine=eng, detection_publisher=published.append)
    frame = np.random.default_rng(0).integers(0, 255, (200, 320, 3),
                                              np.uint8).astype(np.uint8)
    dets = node.process_frame(frame)
    assert node.frames_processed == 1
    assert published and published[0].detections == dets
    for d in dets:  # random weights may or may not fire; check contract
        assert 0 <= d.x <= 320 and d.conf >= 0.25
        assert d.class_name in ("ball", "cube")
    node.stop()
