"""YOLO training-loop test: overfit a single synthetic scene.

Training on repeated copies of one image with one bright box must drive the
loss down and the assigned-anchor IoU up — the end-to-end
forward+loss+backward+update path (the multi-chip variant of this step is
exercised by __graft_entry__.dryrun_multichip).
"""
import numpy as np
import pytest


def test_overfit_single_box():
    import jax.numpy as jnp
    from ros_vision_tpu.models.infer import ModelInference
    from ros_vision_tpu.models.train import TrainConfig, train

    rng = np.random.default_rng(0)
    size = 96
    img = rng.uniform(0.2, 0.4, (1, size, size, 3)).astype(np.float32)
    img[0, 24:56, 32:72] = [0.9, 0.4, 0.1]          # the "game piece"
    boxes = np.array([[[52.0, 40.0, 40.0, 32.0]]], np.float32)  # cx,cy,w,h
    labels = np.zeros((1, 1), np.int32)
    mask = np.ones((1, 1), bool)

    engine = ModelInference(num_classes=1, scale="n", img_size=size,
                            class_names=["ball"], dtype=jnp.float32)

    def dataset():
        while True:
            yield img, boxes, labels, mask

    hist = train(engine, dataset(), steps=60,
                 cfg=TrainConfig(learning_rate=2e-3), log_every=59)
    first, last = hist[0], hist[-1]
    assert last["loss"] < first["loss"] * 0.7, (first, last)
    assert last["mean_iou"] > first["mean_iou"]
