"""Fixed-shape on-device NMS + YOLO output parsing.

Matches the reference's postprocess semantics exactly
(yolo_detection.h:53-182): confidence filter at 0.25, per-class greedy NMS at
IoU 0.45 over confidence-descending candidates — but as static-shape device
ops: top-K candidate selection with lax.top_k, then an exact sequential-
equivalent greedy pass as a fori_loop over the K slots (each step is a
K-wide vector op, so the whole NMS is K small VPU steps, no host sync).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CONF_THRESHOLD = 0.25   # game_piece_detection_node.cu:22
IOU_THRESHOLD = 0.45    # game_piece_detection_node.cu:23


def _iou_matrix(boxes):
    """boxes (..., K, 4) as cx,cy,w,h -> IoU (..., K, K)."""
    x1 = boxes[..., 0] - boxes[..., 2] / 2
    y1 = boxes[..., 1] - boxes[..., 3] / 2
    x2 = boxes[..., 0] + boxes[..., 2] / 2
    y2 = boxes[..., 1] + boxes[..., 3] / 2
    xx1 = jnp.maximum(x1[..., :, None], x1[..., None, :])
    yy1 = jnp.maximum(y1[..., :, None], y1[..., None, :])
    xx2 = jnp.minimum(x2[..., :, None], x2[..., None, :])
    yy2 = jnp.minimum(y2[..., :, None], y2[..., None, :])
    inter = jnp.maximum(0.0, xx2 - xx1) * jnp.maximum(0.0, yy2 - yy1)
    area = boxes[..., 2] * boxes[..., 3]
    union = area[..., :, None] + area[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("max_detections",))
def parse_and_nms(raw, max_detections: int = 100,
                  conf_threshold: float = CONF_THRESHOLD,
                  iou_threshold: float = IOU_THRESHOLD):
    """raw (B, 4+nc, P) -> dict of fixed-shape detections.

    Returns boxes (B, K, 4) cx,cy,w,h in model-input pixels, scores (B, K),
    classes (B, K) int32, valid (B, K) bool; slots sorted by confidence.
    """
    k = max_detections
    boxes_all = raw[:, 0:4, :].transpose(0, 2, 1)        # (B, P, 4)
    scores_all = raw[:, 4:, :]                           # (B, nc, P)
    cls = jnp.argmax(scores_all, axis=1).astype(jnp.int32)   # (B, P)
    score = jnp.max(scores_all, axis=1)                  # (B, P)
    score = jnp.where(score >= conf_threshold, score, 0.0)

    top_scores, top_idx = jax.lax.top_k(score, k)        # (B, K)
    top_boxes = jnp.take_along_axis(boxes_all, top_idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(cls, top_idx, axis=1)
    cand_valid = top_scores > 0

    iou = _iou_matrix(top_boxes)
    same_class = top_cls[..., :, None] == top_cls[..., None, :]
    overlap = (iou > iou_threshold) & same_class

    # exact greedy NMS over confidence-sorted slots: slot i survives iff it
    # is not suppressed by any surviving earlier slot
    def body(i, state):
        suppressed = state
        is_kept = ~suppressed[:, i] & cand_valid[:, i]
        sup_new = suppressed | (is_kept[:, None] & overlap[:, i, :]
                                & (jnp.arange(k) > i)[None, :])
        return sup_new

    suppressed = jax.lax.fori_loop(
        0, k, body, jnp.zeros_like(cand_valid))
    valid = cand_valid & ~suppressed
    return {"boxes": top_boxes, "scores": top_scores,
            "classes": top_cls, "valid": valid}


def scale_boxes(boxes, model_wh, orig_wh):
    """scale_detections (yolo_detection.h:194-216)."""
    sx = orig_wh[0] / model_wh[0]
    sy = orig_wh[1] / model_wh[1]
    return boxes * jnp.asarray([sx, sy, sx, sy], boxes.dtype)
