"""Fused Pallas threshold kernel: gray -> (decim, threshim) in ONE kernel.

The reference's 4-kernel CUDA chain (threshold.cu:151-201) — gray/decimate,
4x4 tile min/max, 3x3 min/max dilation, {0,127,255} thresholding — as a
single whole-frame Pallas kernel: one HBM read of the gray frame, two
DECIMATED uint8 writes (0.5 MB/frame at 1280x800), every intermediate in
VMEM. The previous banded formulation wrote three FULL-RES replicated
planes (3 MB/frame) and lost to XLA on the relay's fresh-HBM-write rate;
this one keeps all full-res traffic on-chip.

Mosaic constraints shape the formulation (CLAUDE.md platform quirks):
rolls are 32-bit only and there are no lane-splitting reshapes, so the
2x decimation "unzip" (out[j] = in[2j]) is a log2 chain of masked rolls:
for each bit b of the destination index, shift by 2^b where the bit is
set — out[j] = in[j + sum_b j_b 2^b] = in[2j]. Tile min/max, the 3x3
tile dilation (edge-clamped via iota masks), and the threshold rule then
run on the decimated plane with short masked-roll chains.

Semantics are bit-exact vs ops/threshold.py adaptive_threshold(decimate2)
(tests/test_threshold_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_WHITE_BLACK_DIFF = 5
_BIG = 100000
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)


def _roll(x, shift, axis):
    # pltpu.roll requires non-negative shifts; negative == size - shift
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _ids(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _unzip2(x, axis):
    """out[..j..] = x[..2j..] for j < size/2 (trailing half is garbage;
    callers slice). Bit-decomposition gather: no wrap for valid lanes
    (2j <= size-2)."""
    size = x.shape[axis]
    ids = _ids(x.shape, axis)
    b = 1
    while b < size // 2:
        x = jnp.where((ids & b) != 0, _roll(x, -b, axis), x)
        b <<= 1
    return x


def _tile4_start(x, op, axis):
    """Per aligned 4-group along axis: group reduction at the group START
    (other positions garbage — masked by later stages)."""
    r = op(x, _roll(x, -1, axis))
    return op(r, _roll(r, -2, axis))


def _dilate_starts(t, op, neutral, axis):
    """3-tile min/max dilation on the tile grid embedded at 4-aligned
    starts, edge-clamped (missing neighbors skipped, threshold.cu:84-118)."""
    ids = _ids(t.shape, axis)
    size = t.shape[axis]
    left = jnp.where(ids >= 4, _roll(t, 4, axis), neutral)
    right = jnp.where(ids < size - 4, _roll(t, -4, axis), neutral)
    return op(op(t, left), right)


def _fill4(t, op, neutral, axis):
    """Replicate each aligned 4-group's START value to the whole group."""
    ids = _ids(t.shape, axis)
    t = jnp.where(ids % 4 == 0, t, neutral)
    t = op(t, _roll(t, 1, axis))
    return op(t, _roll(t, 2, axis))


def _make_kernel(min_white_black_diff):
    def _kernel(gray_ref, decim_ref, thresh_ref):
        g = gray_ref[0].astype(jnp.int32)             # (H, W)
        h, w = g.shape
        d = _unzip2(g, 0)[: h // 2]
        d = _unzip2(d, 1)[:, : w // 2]                # (H/2, W/2) decim

        tmin = _tile4_start(_tile4_start(d, jnp.minimum, 0),
                            jnp.minimum, 1)
        tmax = _tile4_start(_tile4_start(d, jnp.maximum, 0),
                            jnp.maximum, 1)
        for ax in (0, 1):
            tmin = _dilate_starts(tmin, jnp.minimum, _BIG, ax)
            tmax = _dilate_starts(tmax, jnp.maximum, -_BIG, ax)
        for ax in (0, 1):
            tmin = _fill4(tmin, jnp.minimum, _BIG, ax)
            tmax = _fill4(tmax, jnp.maximum, -_BIG, ax)

        spread = tmax - tmin
        thresh = tmin + spread // 2
        out = jnp.where(d > thresh, jnp.int32(255), jnp.int32(0))
        out = jnp.where(spread < min_white_black_diff, jnp.int32(127), out)
        decim_ref[0] = d.astype(jnp.uint8)
        thresh_ref[0] = out.astype(jnp.uint8)
    return _kernel


@functools.partial(jax.jit, static_argnames=("min_white_black_diff",
                                             "interpret"))
def adaptive_threshold_fused(gray: jnp.ndarray,
                             min_white_black_diff: int = MIN_WHITE_BLACK_DIFF,
                             interpret: bool = False):
    """(B, H, W) uint8 -> (decim (B,H/2,W/2), threshim (B,H/2,W/2))."""
    b, h, w = gray.shape
    assert h % 8 == 0 and w % 8 == 0
    in_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    decim, threshim = pl.pallas_call(
        _make_kernel(min_white_black_diff),
        grid=(b,),
        in_specs=[in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, h // 2, w // 2), jnp.uint8),) * 2,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(gray)
    return decim, threshim
