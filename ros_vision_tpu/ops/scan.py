"""MXU-based prefix sums.

Log-shift scans materialize O(log n) full-size intermediates — expensive on
HBM-write-bound paths. A TPU-idiomatic alternative: block the axis into
(n/512, 512) and compute in-block prefix sums as ONE matmul against a
lower-triangular ones matrix on the MXU, then fix up block offsets with a
tiny second-level scan. Total HBM traffic ~3x the array instead of ~2*log n.

f32 matmul accumulation is exact for integer-valued data below 2^24, which
covers all count/compaction cumsums here (counts <= 4M... see callers).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLK = 512


@functools.lru_cache(maxsize=4)
def _lt_matrix_np(blk: int):
    return np.tril(np.ones((blk, blk), np.float32))


def _lt_matrix(blk: int):
    # constant materialized per-trace (never cache jnp arrays across traces)
    return jnp.asarray(_lt_matrix_np(blk))


def cumsum_mxu(x: jnp.ndarray, axis: int = -1,
               binary: bool = False) -> jnp.ndarray:
    """Inclusive cumsum along `axis` via blocked MXU matmuls. f32 in/out.

    binary=True: caller guarantees x is 0/1-valued — bf16 input rounding is
    then exact and the matmul runs in ONE MXU pass (f32 accumulation keeps
    the partial sums exact), 6x faster than the HIGHEST-precision path."""
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    orig_shape = x.shape
    n = x.shape[-1]
    blk = _BLK if n >= _BLK else max(128, 1 << (n - 1).bit_length())
    pad = (-n) % blk
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    nb = x.shape[-1] // blk
    xb = x.reshape(x.shape[:-1] + (nb, blk)).astype(jnp.float32)
    # in-block inclusive prefix: xb @ LT^T  (out[i] = sum_{j<=i} in[j])
    lt = _lt_matrix(blk)
    # HIGHEST: full-f32 MXU passes — the default (bf16 inputs) would corrupt
    # integer-count cumsums beyond 256 and moment prefixes at ~1e-2 relative
    inblock = jax.lax.dot_general(
        xb, lt, (((xb.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT if binary
                   else jax.lax.Precision.HIGHEST))
    # block totals -> exclusive prefix over blocks (tiny, plain cumsum)
    totals = xb.sum(-1)
    offs = jnp.cumsum(totals, axis=-1) - totals
    out = inblock + offs[..., None]
    out = out.reshape(x.shape)
    if pad:
        out = out[..., :n]
    out = out.reshape(orig_shape)
    if axis != -1 and axis != len(orig_shape) - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def blocked_cumsum_parts(data: jnp.ndarray, blk: int = 128):
    """Blocked prefix-sum PARTS along axis 1 of (B, K, C): returns
    (local, totals, blk) where local (B, K, C) is the block-INCLUSIVE
    prefix (resets every `blk` elements) and totals (B, NB, C) are the
    per-block sums. Sums over short ranges (span <= blk) can then be
    formed from values whose magnitude is bounded by ONE block's content
    — the f32 rounding of a windowed difference scales with the block
    magnitude instead of the global/segment prefix magnitude (the
    conditioning fix for giant-segment windowed moments; see
    quadfit _errs_stable). blk=128 measured on a 6960-point segment:
    mid-edge errs land within ~3 of the f64 truth vs ~160 corrupted at
    blk=512 (content ulp 8 vs 32) — callers' windows must span < blk."""
    b, k, c = data.shape
    if k < blk:
        blk = max(8, 1 << (k - 1).bit_length())
    pad = (-k) % blk
    dm = jnp.moveaxis(data, -1, 1)                       # (B, C, K)
    if pad:
        dm = jnp.pad(dm, ((0, 0), (0, 0), (0, pad)))
    nb = dm.shape[-1] // blk
    xb = dm.reshape(b, c, nb, blk).astype(jnp.float32)
    lt = _lt_matrix(blk)
    inblock = jax.lax.dot_general(
        xb, lt, (((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    totals = xb.sum(-1)                                  # (B, C, NB)
    local = jnp.moveaxis(inblock.reshape(b, c, nb * blk)[..., :k], 1, -1)
    return local, jnp.moveaxis(totals, 1, -1), blk


def overlapped_cumsum(data: jnp.ndarray, blk: int = 128, ov: int = 40):
    """Overlapped-block inclusive prefix along axis 1 of (B, K, C):
    returns (opref, blk, ov) with opref (B, NB*(blk+ov), C), where block
    j's row covers global elements [j*blk - ov, (j+1)*blk) and holds the
    inclusive prefix STARTING AT j*blk - ov (zeros before element 0).

    Any contiguous range [g0..g1] with span <= ov and g1 in block j can
    then be summed as opref[loc(g1)] - opref[loc(g0)-1] (loc(g) =
    j*(blk+ov) + g - j*blk + ov; the loc-1 index is >= 0 whenever
    g0 > j*blk - ov, and the range's prefix base is exactly zero at the
    block head) — both operands bounded by ONE (blk+ov)-element window,
    so the f32 rounding of the difference scales with local content, not
    the global/segment prefix magnitude (same conditioning property as
    blocked_cumsum_parts but with NO cross-block totals term: 2 gathers
    per range instead of 3 + select logic)."""
    b, k, c = data.shape
    if k < blk:
        blk = max(8, 1 << (k - 1).bit_length())
    pad = (-k) % blk
    dm = jnp.moveaxis(data, -1, 1)                       # (B, C, K)
    if pad:
        dm = jnp.pad(dm, ((0, 0), (0, 0), (0, pad)))
    nb = dm.shape[-1] // blk
    xb = dm.reshape(b, c, nb, blk).astype(jnp.float32)
    # prepend each block's predecessor tail (zeros for block 0)
    prev_tail = jnp.pad(xb[:, :, :-1, blk - ov:],
                        ((0, 0), (0, 0), (1, 0), (0, 0)))
    obk = jnp.concatenate([prev_tail, xb], axis=-1)      # (B,C,NB,blk+ov)
    lt = _lt_matrix(blk + ov)
    opref = jax.lax.dot_general(
        obk, lt, (((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    opref = jnp.moveaxis(opref.reshape(b, c, nb * (blk + ov)), 1, -1)
    return opref, blk, ov


def segmented_cumsum_from_starts(data: jnp.ndarray,
                                 start_idx: jnp.ndarray) -> jnp.ndarray:
    """Inclusive segmented cumsum along axis 1 of (B, K[, C]) given the
    segment START INDEX per element (B, K) — one MXU cumsum + one gather:
    seg_prefix[i] = cum[i] - cum[start(i) - 1].

    Precision note: the global f32 prefix accumulates across segments;
    callers keep per-element magnitudes bounded (quadfit centers coordinates
    per segment and scales weights by 1/256) so the subtraction stays
    accurate to ~1e-6 relative.
    """
    if data.ndim == 3:
        # channel-major for the lane-aligned scan, then back to (B, K, C)
        # for the base lookup: a (B, K)-indexed slice-gather of C-vectors is
        # ~25x cheaper on TPU than a broadcast-index gather over (B, C, K)
        # (measured 0.6 ms vs 17 ms at K=131072)
        dm = jnp.moveaxis(data, -1, 1)                   # (B, C, K)
        cum = jnp.moveaxis(cumsum_mxu(dm), 1, -1)        # (B, K, C)
        base = jnp.take_along_axis(
            cum, jnp.maximum(start_idx - 1, 0)[..., None], axis=1)
        base = jnp.where((start_idx - 1 >= 0)[..., None], base, 0.0)
        return cum - base
    cum = cumsum_mxu(data)
    base = jnp.take_along_axis(cum, jnp.maximum(start_idx - 1, 0), axis=1)
    base = jnp.where(start_idx - 1 >= 0, base, 0.0)
    return cum - base
