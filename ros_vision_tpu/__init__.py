"""ros_vision_tpu — a TPU-native robot vision framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Team766/ros_vision
(an FRC robot vision stack): multi-camera capture, AprilTag 36h11 detection,
pose estimation, extrinsics fusion to robot frame, NetworkTables/websocket
outputs, a YOLO-style game-piece detector, intrinsic/extrinsic calibration, and
recording/replay — redesigned TPU-first:

  - The per-camera CUDA process pairs of the reference become ONE jitted,
    batched pipeline: the camera axis is the leading batch axis of fixed-shape
    tensors, shardable over a ``jax.sharding.Mesh`` for multi-chip scale-out.
  - The reference's cub sort/scan/select chains become fixed-shape masked
    ``lax.sort`` / segment ops; its CUDA kernels become Pallas kernels or
    XLA-fused jnp code.
  - Tag decode and pose estimation run on-device as dense batched math.
"""

__version__ = "0.1.0"
