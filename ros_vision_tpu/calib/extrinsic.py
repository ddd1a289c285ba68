"""Extrinsic calibration: multi-camera pose solve with optax Adam.

Parity with the reference's extrinsic_calibration package:
  - data collection (data_collector.py): synchronized frame sets from all
    cameras at 1 Hz for a fixed duration (here via the framework's own
    camera stack, frames written as frame_<n>_<camid>.png).
  - solver (solver.py:219-317): detect 36h11 tags per image, estimate each
    tag's camera-frame position, then optimize per-camera (roll, pitch, yaw,
    translation) with Adam, minimizing the MSE of pairwise same-tag
    robot-frame position differences for tags seen by exactly two cameras
    (compute_loss solver.py:219-260). torch -> optax; the loss is jitted and
    fully batched over all tag pairs.
Output: per-camera rotation matrix + offset in the system_config extrinsics
schema.
"""
from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ros_vision_tpu.utils import rotation_utils

log = logging.getLogger(__name__)


@dataclasses.dataclass
class CameraGuess:
    rotations_deg: tuple = (0.0, 0.0, 0.0)   # roll(x), pitch(y), yaw(z)
    translation: tuple = (0.0, 0.0, 0.0)
    adjustable: bool = True


def collect_pairs(frameset: dict, cam_ids: list) -> tuple:
    """frameset: {frame: {tag_id: [{cam_id, translation}, ...]}} ->
    (cam_idx_a, cam_idx_b, pos_a, pos_b) arrays over all tags seen by
    exactly two cameras (solver.py pairing rule)."""
    ia, ib, pa, pb = [], [], [], []
    index = {c: i for i, c in enumerate(cam_ids)}
    for frame in frameset.values():
        for recs in frame.values():
            if len(recs) != 2:
                continue
            a, b = recs
            ia.append(index[a["cam_id"]])
            ib.append(index[b["cam_id"]])
            pa.append(np.asarray(a["translation"], np.float64))
            pb.append(np.asarray(b["translation"], np.float64))
    if not ia:
        raise ValueError("no tags observed by exactly two cameras")
    return (np.asarray(ia), np.asarray(ib),
            np.asarray(pa, np.float32), np.asarray(pb, np.float32))


def _rot_xyz(angles_deg):
    """Differentiable Rz @ Ry @ Rx from degrees (compose_rotations_xyz)."""
    r = jnp.deg2rad(angles_deg)
    cx, sx = jnp.cos(r[0]), jnp.sin(r[0])
    cy, sy = jnp.cos(r[1]), jnp.sin(r[1])
    cz, sz = jnp.cos(r[2]), jnp.sin(r[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


# np array: a module-level jnp constant would force backend init at import
_CAM2ROBOT = np.asarray(rotation_utils.camera_to_robot(), np.float32)


def solve_extrinsics(frameset: dict, guesses: dict,
                     num_iterations: int = 500,
                     learning_rate: float = 1e-2) -> dict:
    """Optimize camera extrinsics; returns {cam_id: {"rotation": 3x3 list,
    "offset": [3]}} in the system_config schema."""
    cam_ids = sorted(guesses)
    ia, ib, pa, pb = collect_pairs(frameset, cam_ids)
    ia = jnp.asarray(ia)
    ib = jnp.asarray(ib)
    pa = jnp.asarray(pa)
    pb = jnp.asarray(pb)

    angles0 = jnp.asarray([guesses[c].rotations_deg for c in cam_ids],
                          jnp.float32)
    trans0 = jnp.asarray([guesses[c].translation for c in cam_ids],
                         jnp.float32)
    frozen = jnp.asarray([not guesses[c].adjustable for c in cam_ids])

    params = {"angles": angles0, "trans": trans0}

    def cam_rotations(angles):
        return jax.vmap(_rot_xyz)(angles) @ _CAM2ROBOT   # (C, 3, 3)

    def loss_fn(p):
        R = cam_rotations(p["angles"])                    # (C, 3, 3)
        t = p["trans"]
        xa = jnp.einsum("nij,nj->ni", R[ia], pa) + t[ia]
        xb = jnp.einsum("nij,nj->ni", R[ib], pb) + t[ib]
        d = xa - xb
        return jnp.mean(jnp.sum(d * d, axis=1))          # solver.py MSE

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # freeze non-adjustable cameras (solver_config adjustable flags)
        grads = {k: jnp.where(frozen[:, None], 0.0, g)
                 for k, g in grads.items()}
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(loss_fn(params))
    for it in range(num_iterations):
        params, opt_state, loss = step(params, opt_state)
    loss = float(loss)
    log.info("extrinsic solve: loss %.6f -> %.6f (rmse %.4f m)",
             loss0, loss, loss ** 0.5)

    R = np.asarray(cam_rotations(params["angles"]))
    t = np.asarray(params["trans"])
    return {cam: {"rotation": R[i].tolist(), "offset": t[i].tolist()}
            for i, cam in enumerate(cam_ids)}


def build_frameset_from_images(images_by_frame: dict, detector_factory,
                               tag_size: float = 0.1651) -> dict:
    """Phase-A output -> frameset: {frame: {tag_id: [{cam_id, translation}]}}.
    images_by_frame: {frame_num: {cam_id: gray image}}; detector_factory:
    cam_id -> detector with estimate_pose (generate_frameset,
    solver.py:167-216)."""
    frameset = {}
    for frame_num, cams in images_by_frame.items():
        entry = {}
        for cam_id, gray in cams.items():
            det = detector_factory(cam_id)
            res = det.detect(gray)
            dets = res.detections if hasattr(res, "detections") else res
            for d in dets:
                if d.pose_t is None:
                    continue
                entry.setdefault(d.tag_id, []).append(
                    {"cam_id": cam_id,
                     "translation": np.asarray(d.pose_t, np.float64)})
        frameset[frame_num] = entry
    return frameset
