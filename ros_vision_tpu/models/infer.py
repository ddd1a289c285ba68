"""Game-piece detector inference engine (ModelInference equivalent).

Mirrors the reference's ModelInference + GamePieceDetector pipeline
(ModelInference.h:31-186; game_piece_detection_node.cu:347-380 preprocess;
yolo_detection.h postprocess): resize + BGR->RGB + /255 preprocessing, a
jitted bf16 YOLOv11 forward on the MXU, and fixed-shape on-device NMS —
instead of a TensorRT engine + host NMS. Weights load from an .npz/orbax
checkpoint (scripts/convert_yolo_weights.py converts Ultralytics .pt).
"""
from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ros_vision_tpu.models.yolo import YOLOv11, create_model
from ros_vision_tpu.ops import nms


@dataclasses.dataclass
class GamePieceDetection:
    x: float      # center x, original-image pixels
    y: float
    w: float
    h: float
    conf: float
    cls: int
    class_name: str


class ModelInference:
    """Jitted YOLO inference with the reference's tensor semantics.

    infer() is the analogue of ModelInference::infer (H2D copy, enqueueV3,
    D2H, sync — ModelInference.h:113-140): device transfer, jitted forward,
    device->host of the fixed-shape postprocessed outputs.
    """

    def __init__(self, num_classes: int = 1, scale: str = "n",
                 img_size: int = 640, class_names=None,
                 params_path: str | None = None, dtype=jnp.bfloat16,
                 max_detections: int = 100):
        self.img_size = img_size
        self.num_classes = num_classes
        self.class_names = list(class_names or [])
        self.dtype = dtype
        self.model, self.variables = create_model(
            num_classes, scale, img_size, dtype=dtype)
        if params_path:
            self.load_params(params_path)
        self.max_detections = max_detections

        @jax.jit
        def _run(variables, img):
            out = self.model.apply(variables, img.astype(dtype))
            return nms.parse_and_nms(out, max_detections)

        self._run = _run

    # semantic dims from model config (ModelInference.h:148-156)
    @property
    def input_shape(self):
        return (1, self.img_size, self.img_size, 3)

    @property
    def output_shape(self):
        a = sum((self.img_size // s) ** 2 for s in (8, 16, 32))
        return (1, 4 + self.num_classes, a)

    def save_checkpoint(self, path: str):
        """Orbax checkpoint (the JAX-ecosystem persistence path; .npz
        remains the portable format)."""
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path),
                   jax.tree_util.tree_map(np.asarray, self.variables))
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree_util.tree_map(np.asarray, self.variables)
        self.variables = jax.tree_util.tree_map(
            jnp.asarray, ckptr.restore(os.path.abspath(path), target))

    def load_params(self, path: str):
        import pickle
        if path.endswith(".npz"):
            flat = dict(np.load(path))
            from flax.traverse_util import unflatten_dict
            tree = unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()})
            self.variables = jax.tree_util.tree_map(jnp.asarray, tree)
        else:
            with open(path, "rb") as f:
                self.variables = pickle.load(f)

    def save_params(self, path: str):
        from flax.traverse_util import flatten_dict
        flat = {"/".join(k): np.asarray(v) for k, v in
                flatten_dict(self.variables).items()}
        np.savez(path, **flat)

    def preprocess(self, bgr: np.ndarray) -> np.ndarray:
        """BGR HWC uint8 -> RGB float [0,1] resized to model input
        (preprocess_image, game_piece_detection_node.cu:347-380; NHWC here —
        channel layout is an internal detail on TPU)."""
        import cv2
        img = cv2.resize(bgr, (self.img_size, self.img_size))
        img = img[..., ::-1].astype(np.float32) / 255.0
        return img[None]

    def preprocess_device(self, bgr_batch) -> jnp.ndarray:
        """Device-side preprocessing: resize + BGR->RGB + /255 as jitted TPU
        ops (BASELINE config 4: preprocessing on TPU). bgr_batch
        (B, H, W, 3) uint8."""
        x = jnp.asarray(bgr_batch)
        if x.ndim == 3:
            x = x[None]

        @jax.jit
        def run(x):
            x = x[..., ::-1].astype(jnp.float32) / 255.0
            return jax.image.resize(
                x, (x.shape[0], self.img_size, self.img_size, 3), "bilinear")

        return run(x)

    def infer(self, image_input: np.ndarray) -> dict:
        """Raw fixed-shape outputs for a preprocessed (1,H,W,3) input."""
        return self._run(self.variables, jnp.asarray(image_input))

    def detect(self, bgr: np.ndarray,
               conf_threshold: float = nms.CONF_THRESHOLD) -> list:
        """Full path: preprocess -> infer -> NMS -> scale back
        (detection_test flow)."""
        h, w = bgr.shape[:2]
        out = jax.tree_util.tree_map(np.asarray,
                                     self.infer(self.preprocess(bgr)))
        dets = []
        sx = w / self.img_size
        sy = h / self.img_size
        for i in np.nonzero(out["valid"][0])[0]:
            b = out["boxes"][0, i]
            c = int(out["classes"][0, i])
            name = self.class_names[c] if c < len(self.class_names) \
                else "unknown"
            dets.append(GamePieceDetection(
                float(b[0] * sx), float(b[1] * sy), float(b[2] * sx),
                float(b[3] * sy), float(out["scores"][0, i]), c, name))
        return dets
