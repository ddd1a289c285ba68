"""Device-side frame preprocessing: debayer + precomputed undistort/rectify.

BASELINE config 2: camera_calibration intrinsics drive a precomputed
undistort/rectify map applied on device. The map (one (H, W, 2) float32
source-coordinate field per camera, the cv2.initUndistortRectifyMap
equivalent) is built once on the host from calibrationmatrix_<serial>.json;
per frame the TPU does a bilinear gather remap — fused by XLA with the
downstream threshold stage.

Debayer: RGGB/BGGR/GRBG/GBRG 2x2 mosaics to gray (or RGB) with bilinear
channel interpolation — for cameras delivering raw mosaic instead of the
MJPG/YUYV formats the config selects (config_loader fourcc).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ros_vision_tpu.apriltag import geometry as geo


def build_undistort_map(width: int, height: int, fx: float, fy: float,
                        cx: float, cy: float, dist,
                        new_intrinsics=None) -> np.ndarray:
    """(H, W, 2) float32 map: for each RECTIFIED pixel, the source pixel in
    the distorted image (initUndistortRectifyMap semantics: forward-distort
    the ideal ray of each output pixel)."""
    nfx, nfy, ncx, ncy = new_intrinsics or (fx, fy, cx, cy)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    # ideal (rectified) pixel -> normalized ray under the NEW intrinsics,
    # then distort under the ORIGINAL model
    pts = np.stack([(xs + 0.5 - ncx) / nfx * fx + cx,
                    (ys + 0.5 - ncy) / nfy * fy + cy], -1)
    src = geo.distort_points(pts.reshape(-1, 2), fx, fy, cx, cy,
                             np.asarray(dist, np.float64))
    return src.reshape(height, width, 2).astype(np.float32)


@jax.jit
def remap_bilinear(img: jnp.ndarray, smap: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W) uint8/float; smap (H, W, 2) source coords (pixel
    centers at +0.5, matching the detector's convention). Out-of-bounds
    samples clamp to the edge (cv2.BORDER_REPLICATE behavior)."""
    b, h, w = img.shape
    x = smap[..., 0] - 0.5
    y = smap[..., 1] - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    flat = img.reshape(b, -1).astype(jnp.float32)

    def at(yy, xx):
        idx = (yy * w + xx).reshape(-1)
        return jnp.take(flat, idx, axis=1).reshape(b, h, w)

    out = (at(y0, x0) * (1 - fx) * (1 - fy) + at(y0, x0 + 1) * fx * (1 - fy)
           + at(y0 + 1, x0) * (1 - fx) * fy + at(y0 + 1, x0 + 1) * fx * fy)
    return jnp.clip(out + 0.5, 0, 255).astype(img.dtype)


_BAYER_OFFSETS = {
    # pattern -> (row, col) of the R sample within each 2x2 cell
    "RGGB": (0, 0), "GRBG": (0, 1), "GBRG": (1, 0), "BGGR": (1, 1),
}


@functools.partial(jax.jit, static_argnames=("pattern", "to_gray"))
def debayer(mosaic: jnp.ndarray, pattern: str = "RGGB",
            to_gray: bool = True):
    """mosaic (B, H, W) uint8 -> gray (B, H, W) or rgb (B, H, W, 3).

    Bilinear demosaic via channel masks + 3x3 normalized convolution —
    pure elementwise/window ops that XLA fuses.
    """
    if pattern not in _BAYER_OFFSETS:
        raise ValueError(f"unknown bayer pattern {pattern!r}")
    b, h, w = mosaic.shape
    m = mosaic.astype(jnp.float32)
    ys = jnp.arange(h) % 2
    xs = jnp.arange(w) % 2
    ry, rx = _BAYER_OFFSETS[pattern]
    r_mask = ((ys == ry)[:, None] & (xs == rx)[None, :]).astype(jnp.float32)
    b_mask = ((ys == 1 - ry)[:, None] &
              (xs == 1 - rx)[None, :]).astype(jnp.float32)
    g_mask = 1.0 - r_mask - b_mask

    kern = jnp.asarray([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5],
                        [0.25, 0.5, 0.25]], jnp.float32)

    def interp(mask):
        vals = m * mask
        num = jax.lax.conv_general_dilated(
            vals[:, None], kern[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
        den = jax.lax.conv_general_dilated(
            jnp.broadcast_to(mask, m.shape)[:, None], kern[None, None],
            (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
        return num / jnp.maximum(den, 1e-6)

    r = interp(r_mask)
    g = interp(g_mask)
    bl = interp(b_mask)
    if to_gray:
        # ITU-R BT.601 luma
        gray = 0.299 * r + 0.587 * g + 0.114 * bl
        return jnp.clip(gray + 0.5, 0, 255).astype(jnp.uint8)
    rgb = jnp.stack([r, g, bl], -1)
    return jnp.clip(rgb + 0.5, 0, 255).astype(jnp.uint8)


class Rectifier:
    """Per-camera preprocessing: (optional debayer) + precomputed remap.
    Compose in front of the detector for lenses whose distortion exceeds
    what the detector's undistortion-aware refine absorbs."""

    def __init__(self, width, height, fx, fy, cx, cy, dist,
                 bayer_pattern: str | None = None):
        # device-resident is correct here: the map flows into
        # remap_bilinear as a jit ARGUMENT (not a captured constant), so
        # it is staged once and never embedded/fetched at lowering.
        self.map = jnp.asarray(build_undistort_map(
            width, height, fx, fy, cx, cy, dist))
        self.bayer_pattern = bayer_pattern

    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        if self.bayer_pattern:
            frames = debayer(frames, self.bayer_pattern, to_gray=True)
        return remap_bilinear(frames, self.map)
