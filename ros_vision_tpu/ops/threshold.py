"""Grayscale decimation + tile-based adaptive threshold on TPU.

TPU-native equivalent of the reference's 4-kernel CUDA chain
(threshold.cu:151-201): gray/decimate, 4x4 tile min/max, 3x3 min/max
dilation, and {0,127,255} thresholding — expressed as fused XLA ops over the
batched frame tensor (the VPU handles these elementwise/reduction patterns
natively; XLA fuses the whole stage into a couple of kernels).

All functions are batch-first: (B, H, W). Shapes are static; H and W must be
multiples of 8 at full resolution (same constraint as the reference,
apriltag_gpu.cu:754-755).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def yuyv_to_gray(yuyv: jnp.ndarray) -> jnp.ndarray:
    """YUYV422 frames (B, H, W*2) uint8 -> gray (B, H, W): every other byte
    (threshold.cu:21)."""
    return yuyv[..., ::2]


def decimate2(gray: jnp.ndarray) -> jnp.ndarray:
    """2x decimation by point sampling even rows/cols (threshold.cu:27-31)."""
    return gray[..., ::2, ::2]


def tile_minmax(decim: jnp.ndarray):
    """Per-4x4-tile min and max (InternalBlockMinMax, threshold.cu:60-80).

    decim (B, H2, W2) -> (tmin, tmax) each (B, H2//4, W2//4)."""
    b, h, w = decim.shape
    t = decim.reshape(b, h // 4, 4, w // 4, 4)
    return t.min(axis=(2, 4)), t.max(axis=(2, 4))


def dilate_minmax(tmin: jnp.ndarray, tmax: jnp.ndarray):
    """3x3 min/max dilation with border clamping (InternalBlockFilter,
    threshold.cu:84-118: out-of-bounds neighbors are skipped, which equals
    edge-replicated padding for min/max)."""
    pmin = jnp.pad(tmin, ((0, 0), (1, 1), (1, 1)), mode="edge")
    pmax = jnp.pad(tmax, ((0, 0), (1, 1), (1, 1)), mode="edge")
    fmin = jax.lax.reduce_window(
        pmin, jnp.uint8(255), jax.lax.min,
        window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
        padding="VALID")
    fmax = jax.lax.reduce_window(
        pmax, jnp.uint8(0), jax.lax.max,
        window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
        padding="VALID")
    return fmin, fmax


def threshold(decim: jnp.ndarray, fmin: jnp.ndarray, fmax: jnp.ndarray,
              min_white_black_diff: int = 5) -> jnp.ndarray:
    """Adaptive threshold to {0, 127, 255} (InternalThreshold,
    threshold.cu:121-147)."""
    pmin = jnp.repeat(jnp.repeat(fmin, 4, axis=1), 4, axis=2)
    pmax = jnp.repeat(jnp.repeat(fmax, 4, axis=1), 4, axis=2)
    spread = pmax.astype(jnp.int32) - pmin.astype(jnp.int32)
    thresh = pmin.astype(jnp.int32) + spread // 2
    out = jnp.where(decim.astype(jnp.int32) > thresh, jnp.uint8(255),
                    jnp.uint8(0))
    return jnp.where(spread < min_white_black_diff, jnp.uint8(127), out)


def adaptive_threshold(decim: jnp.ndarray, min_white_black_diff: int = 5):
    """Full stage: decimated gray -> (threshim, tmin/tmax taps)."""
    tmin, tmax = tile_minmax(decim)
    fmin, fmax = dilate_minmax(tmin, tmax)
    return threshold(decim, fmin, fmax, min_white_black_diff), \
        (tmin, tmax, fmin, fmax)
