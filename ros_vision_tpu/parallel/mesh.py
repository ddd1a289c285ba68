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
    """Wrap a TPUDetector's pipeline with camera-axis sharding via
    shard_map: each device runs the detector on its LOCAL camera rows.

    shard_map (rather than jit + sharding constraints) is load-bearing:
    the pipeline contains per-frame Pallas kernels (ops/frontend_pallas,
    ops/ccl_pallas) whose grid is the batch axis — shard_map guarantees
    each device launches them on its own rows instead of relying on the
    SPMD partitioner to split a pallas_call. The batch is embarrassingly
    parallel (no cross-camera math), so semantics are identical.
    """
    fn = jax.shard_map(
        detector._detect_device, mesh=mesh,
        in_specs=(P("cameras", None, None), P("cameras", None)),
        out_specs=P("cameras"),
        check_vma=False)
    return jax.jit(fn)


def shard_detector_packed(detector, mesh: Mesh):
    """shard_detector for the packed-output hot path (VisionNode.submit):
    each device runs detect + pack on its local camera rows."""
    from ros_vision_tpu.apriltag.detector import pack_outputs

    def local(frames, intrinsics):
        return pack_outputs(detector._detect_device(frames, intrinsics))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("cameras", None, None), P("cameras", None)),
        out_specs=P("cameras", None, None),
        check_vma=False)
    return jax.jit(fn)


def gather_detections(out: dict) -> dict:
    """Host-side gather of the (already replicated-on-fetch) outputs."""
    return jax.tree_util.tree_map(np.asarray, out)
