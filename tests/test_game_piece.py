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


def test_game_piece_node_detects_trained_object():
    """End-to-end: fine-tune the engine on a synthetic game piece, then the
    NODE must detect that object through its full BGR -> preprocess ->
    jitted forward -> NMS -> scale-back path (the behavior
    detection_test.cpp exercises with a real TensorRT engine; weights are
    trained in-process since real engines don't exist offline)."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from ros_vision_tpu.models.infer import ModelInference
    from ros_vision_tpu.models.train import TrainConfig, train
    from ros_vision_tpu.runtime.game_piece_node import GamePieceNode

    size = 96
    frame = np.full((192, 192, 3), 70, np.uint8)        # BGR capture frame
    frame[48:112, 64:144] = (25, 100, 230)              # orange game piece
    # train on exactly what the node's preprocess will produce
    small = cv2.resize(frame, (size, size),
                       interpolation=cv2.INTER_LINEAR)
    img = (small[..., ::-1].astype(np.float32) / 255.0)[None]
    boxes = np.array([[[52.0, 40.0, 40.0, 32.0]]], np.float32)  # cx,cy,w,h
    labels = np.zeros((1, 1), np.int32)
    mask = np.ones((1, 1), bool)

    engine = ModelInference(num_classes=1, scale="n", img_size=size,
                            class_names=["ball"], dtype=jnp.float32)

    def dataset():
        while True:
            yield img, boxes, labels, mask

    train(engine, dataset(), steps=150,
          cfg=TrainConfig(learning_rate=2e-3), log_every=200)

    published = []
    node = GamePieceNode(engine=engine,
                         detection_publisher=published.append)
    dets = node.process_frame(frame)
    node.stop()
    assert published and published[0].detections == dets
    assert dets, "trained object not detected through the node path"
    best = max(dets, key=lambda d: d.conf)
    assert best.class_name == "ball" and best.conf >= 0.25
    # scaled back to capture-frame coords: box center (104, 80), 192px frame
    assert abs(best.x - 104.0) < 25 and abs(best.y - 80.0) < 25, \
        (best.x, best.y)
