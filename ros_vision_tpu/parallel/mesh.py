"""Multi-chip scale-out: camera-batch sharding over a device mesh.

The reference scales by spawning one process pair per camera on one machine
(launch_vision.py:231-308). The TPU-native equivalent: the camera axis is the
leading batch axis of the jitted pipeline, sharded over the `cameras` axis of
a `jax.sharding.Mesh`. XLA inserts the (tiny) collectives; detection outputs
are gathered over ICI. A second `model` mesh axis is available for
tensor-parallel sharding of the game-piece detector's heavy convolutions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_camera_mesh(n_cameras: int | None = None, model_parallel: int = 1):
    """1-or-2-axis mesh: ('cameras', 'model')."""
    devs = np.array(jax.devices())
    n = len(devs)
    if n_cameras is None:
        n_cameras = n // model_parallel
    assert n_cameras * model_parallel <= n
    grid = devs[: n_cameras * model_parallel].reshape(
        n_cameras, model_parallel)
    return Mesh(grid, ("cameras", "model"))


def shard_detector(detector, mesh: Mesh):
    """Wrap a TPUDetector's jitted fn with camera-axis sharding.

    Frames (B, H, W) are sharded over 'cameras'; every per-quad output
    inherits the batch sharding. Returns a jitted fn(frames) -> outputs with
    explicit in/out shardings so multi-chip placement is compiler-checked.
    """
    in_s = NamedSharding(mesh, P("cameras", None, None))
    intr_s = NamedSharding(mesh, P("cameras", None))

    def fn(frames, intrinsics):
        frames = jax.lax.with_sharding_constraint(frames, in_s)
        intrinsics = jax.lax.with_sharding_constraint(intrinsics, intr_s)
        return detector._detect_device(frames, intrinsics)

    return jax.jit(fn, in_shardings=(in_s, intr_s))


def gather_detections(out: dict) -> dict:
    """Host-side gather of the (already replicated-on-fetch) outputs."""
    return jax.tree_util.tree_map(np.asarray, out)
