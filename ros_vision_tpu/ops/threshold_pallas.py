"""Fused Pallas threshold kernel (decimate + tile min/max stage).

The data-heavy half of the reference's threshold chain
(threshold.cu:151-201) as ONE Pallas kernel over row bands: 2x decimation
and 4x4 (decimated) tile min/max — one HBM read of the gray band, three
uint8 writes, all intermediates in VMEM. The remaining 3x3 tile dilation and
final thresholding operate on the small tile grid / decimated image and are
left to XLA (ops.threshold.dilate_minmax/threshold), where they fuse into a
couple of cheap elementwise passes.

Mosaic constraints shape the formulation: rolls are 32-bit only, no
lane-splitting reshapes — so tile min/max uses aligned-group roll/min
butterflies on full-res replicated int32 maps, banded to bound VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_vision_tpu.ops.threshold import dilate_minmax, threshold

MIN_WHITE_BLACK_DIFF = 5
_BIG = 100000


def _roll(x, shift, axis):
    # pltpu.roll requires non-negative shifts; negative == size - shift
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _ids(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _group_reduce_fill(x, op, neutral, axis):
    """Per aligned 8-group along `axis`: every element gets the group's
    reduction. Butterfly rolls -1,-2,-4 put the reduction at the group
    start; neutral-masked rolls +1,+2,+4 fill it back (leak-free for
    aligned groups)."""
    ids = _ids(x.shape, axis)
    r = x
    for s in (1, 2, 4):
        r = op(r, _roll(r, -s, axis))
    r = jnp.where(ids % 8 == 0, r, neutral)
    for s in (1, 2, 4):
        r = op(r, _roll(r, s, axis))
    return r


def _kernel(gray_ref, decim_rep_ref, tmin_rep_ref, tmax_rep_ref):
    g = gray_ref[0].astype(jnp.int32)                 # (BAND, W)
    rows = _ids(g.shape, 0)
    cols = _ids(g.shape, 1)
    # decimated value replicated 2x2: d[y,x] = g[y & ~1, x & ~1]
    a = jnp.where(rows % 2 == 0, g, _roll(g, 1, 0))
    d = jnp.where(cols % 2 == 0, a, _roll(a, 1, 1))
    # 8x8 full-res tile min/max (= 4x4 on the decimated grid)
    tmin = _group_reduce_fill(d, jnp.minimum, _BIG, 0)
    tmin = _group_reduce_fill(tmin, jnp.minimum, _BIG, 1)
    tmax = _group_reduce_fill(d, jnp.maximum, -_BIG, 0)
    tmax = _group_reduce_fill(tmax, jnp.maximum, -_BIG, 1)
    decim_rep_ref[0] = d.astype(jnp.uint8)
    tmin_rep_ref[0] = tmin.astype(jnp.uint8)
    tmax_rep_ref[0] = tmax.astype(jnp.uint8)


def _pick_band(h: int) -> int:
    for band in (256, 200, 160, 128, 100, 80, 64, 40, 32, 16, 8):
        if h % band == 0:
            return band
    return h


@functools.partial(jax.jit, static_argnames=("min_white_black_diff",
                                             "interpret"))
def adaptive_threshold_fused(gray: jnp.ndarray,
                             min_white_black_diff: int = MIN_WHITE_BLACK_DIFF,
                             interpret: bool = False):
    """(B, H, W) uint8 -> (decim (B,H/2,W/2), threshim (B,H/2,W/2))."""
    b, h, w = gray.shape
    assert h % 8 == 0 and w % 8 == 0
    band = _pick_band(h)
    grid = (b, h // band)
    spec = lambda: pl.BlockSpec((1, band, w), lambda i, j: (i, j, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    d_rep, tmin_rep, tmax_rep = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec()],
        out_specs=(spec(), spec(), spec()),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.uint8),) * 3,
        interpret=interpret,
    )(gray)
    decim = d_rep[:, ::2, ::2]
    tmin = tmin_rep[:, ::8, ::8]
    tmax = tmax_rep[:, ::8, ::8]
    fmin, fmax = dilate_minmax(tmin, tmax)
    return decim, threshold(decim, fmin, fmax, min_white_black_diff)
