"""One-hot MXU replacements for small-table gathers and histograms.

XLA lowers per-element gathers/scatters to near-scalar loops on TPU
(measured ~1.4 ms per 131k-index gather per frame — the dominant cost of
the quad-fitting middle pipeline, see ops/quadfit.py). But every such op
in this pipeline indexes a SMALL table (the per-segment stats, S ~= 1025
rows): a gather from a small table is a one-hot matmul, and a histogram
into a small table is a masked row-reduction — both dense, regular work
the MXU/VPU eat at ~0.3 ms/frame instead.

  table_take_cm(table (B, S, C), idx (B, K)) -> (B, C, K)   [channel-major]
      out[c, k] = table[idx[k], c]  via  table^T (C, S) @ onehot (S, K)
  value_histogram(values (B, K), S) -> (B, S)
      out[s] = #(values == s)       via  row-sums of onehot (S, K)

The onehot is built per (S-chunk, K-tile) block in VMEM and never touches
HBM. f32 products against a 0/1 one-hot with HIGHEST precision are exact,
so results match jnp.take_along_axis / scatter-add bit-for-bit (unit-tested
in tests/test_ops_units.py).

These replace the cub DeviceReduce/ReduceByKey table passes of the
reference (apriltag_gpu.cu:829-905) in spirit: same bounded-table contract,
TPU-native execution.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_TILE = 2048
_S_CHUNK = 256


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m



def _pick_tile(k: int) -> int:
    """Largest K-tile <= 2048 that divides k (8-aligned when possible) —
    point widths are not always 2048-divisible (the fused frontend pads
    K to whole image rows, e.g. 131200 = 80 x 1640)."""
    for t in range(min(_K_TILE, k), 0, -1):
        if k % t == 0 and (t % 8 == 0 or t == k or t < 8):
            return t
    return k


def is_tpu_backend() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _make_take_kernel(s_pad: int, c_pad: int, k_tile: int):
    n_chunks = s_pad // _S_CHUNK

    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]                                 # (K_TILE, 1)
        acc = jnp.zeros((c_pad, k_tile), jnp.float32)
        for ci in range(n_chunks):
            iota_s = ci * _S_CHUNK + jax.lax.broadcasted_iota(
                jnp.int32, (k_tile, _S_CHUNK), 1)
            oh = (idx == iota_s).astype(jnp.float32)     # (K_TILE, S_CHUNK)
            tab = tab_ref[0, pl.ds(ci * _S_CHUNK, _S_CHUNK), :]  # (S_CHUNK, C)
            acc = acc + jax.lax.dot_general(
                tab, oh, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (C, K_TILE)
        out_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def table_take_cm(table: jnp.ndarray, idx: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """table (B, S, C) f32, idx (B, K) int32 in [0, S) -> (B, C, K) f32
    with out[b, c, k] = table[b, idx[b, k], c] (channel-major: each channel
    is a ready-to-use (B, K) row for elementwise work downstream).
    Out-of-range idx produce 0."""
    b, s, c = table.shape
    _, k = idx.shape
    k_tile = _pick_tile(k)
    s_pad = _ceil_to(s, _S_CHUNK)
    c_pad = _ceil_to(c, 8)
    tab = jnp.pad(table.astype(jnp.float32),
                  ((0, 0), (0, s_pad - s), (0, c_pad - c)))
    # idx as a (B*K, 1) column: TPU block shapes must tile the last two dims
    # (8, 128), which a (1, k_tile) row block over (B, K) violates for B > 1
    col = idx.reshape(b * k, 1)
    n_tiles = k // k_tile
    out = pl.pallas_call(
        _make_take_kernel(s_pad, c_pad, k_tile),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((k_tile, 1),
                         lambda i, j, n=n_tiles: (i * n + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, c_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_pad, k_tile),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_pad, k), jnp.float32),
        interpret=interpret,
    )(col, tab)
    return out[:, :c, :]


def table_take_cm_ref(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """jnp reference/CPU fallback with identical semantics."""
    b, s, c = table.shape
    safe = jnp.clip(idx, 0, s - 1)
    g = jnp.take_along_axis(table.astype(jnp.float32), safe[..., None],
                            axis=1)
    g = jnp.where(((idx >= 0) & (idx < s))[..., None], g, 0.0)
    return jnp.moveaxis(g, -1, 1)


def take_cm(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatching channel-major table gather."""
    if is_tpu_backend():
        return table_take_cm(table, idx)
    return table_take_cm_ref(table, idx)


def _make_hist_kernel(s_pad: int, k_tile: int):
    n_chunks = s_pad // _S_CHUNK

    def kernel(val_ref, out_ref, acc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        val = val_ref[:]                                  # (K_TILE, 1)
        for ci in range(n_chunks):                        # bound VMEM: one
            iota_s = ci * _S_CHUNK + jax.lax.broadcasted_iota(  # 2MB chunk
                jnp.int32, (k_tile, _S_CHUNK), 1)
            oh = (val == iota_s).astype(jnp.int32)
            acc[:, pl.ds(ci * _S_CHUNK, _S_CHUNK)] += jnp.sum(
                oh, axis=0, keepdims=True)
        del val

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("num_values", "interpret"))
def value_histogram(values: jnp.ndarray, num_values: int,
                    interpret: bool = False) -> jnp.ndarray:
    """values (B, K) int32 -> (B, num_values) int32 counts
    (out[b, s] = #(values[b] == s); values outside [0, num_values) are
    simply not counted)."""
    b, k = values.shape
    k_tile = _pick_tile(k)
    s_pad = _ceil_to(num_values, _S_CHUNK)
    col = values.reshape(b * k, 1)
    n_tiles = k // k_tile
    out = pl.pallas_call(
        _make_hist_kernel(s_pad, k_tile),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((k_tile, 1),
                               lambda i, j, n=n_tiles: (i * n + j, 0),
                               memory_space=pltpu.VMEM)],
        # 3-D output: a (1, s_pad) block over a 2-D (B, s_pad) array is
        # rejected by the TPU tiling rules for B > 1
        out_specs=pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, s_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, s_pad), jnp.int32)],
        interpret=interpret,
    )(col)
    return out[:, 0, :num_values]


def value_histogram_ref(values: jnp.ndarray, num_values: int) -> jnp.ndarray:
    b, k = values.shape
    clipped = jnp.where((values >= 0) & (values < num_values), values,
                        num_values)
    return jax.vmap(
        lambda v: jnp.zeros((num_values + 1,), jnp.int32).at[v].add(1)
    )(clipped)[:, :num_values]


def histogram(values: jnp.ndarray, num_values: int) -> jnp.ndarray:
    """Backend-dispatching histogram."""
    if is_tpu_backend():
        return value_histogram(values, num_values)
    return value_histogram_ref(values, num_values)


def _make_minmax_kernel(s_pad: int, k_tile: int):
    n_chunks = s_pad // _S_CHUNK
    big = 2 ** 30

    def kernel(seg_ref, val_ref, min_ref, max_ref, amin, amax):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            amin[:] = jnp.full_like(amin, big)
            amax[:] = jnp.full_like(amax, -big)

        seg = seg_ref[:]                                  # (K_TILE, 1)
        val = val_ref[:]
        for ci in range(n_chunks):
            iota_s = ci * _S_CHUNK + jax.lax.broadcasted_iota(
                jnp.int32, (k_tile, _S_CHUNK), 1)
            hit = seg == iota_s
            lo = jnp.min(jnp.where(hit, val, big), axis=0, keepdims=True)
            hi = jnp.max(jnp.where(hit, val, -big), axis=0, keepdims=True)
            sl = pl.ds(ci * _S_CHUNK, _S_CHUNK)
            amin[:, sl] = jnp.minimum(amin[:, sl], lo)
            amax[:, sl] = jnp.maximum(amax[:, sl], hi)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            min_ref[0] = amin[:]
            max_ref[0] = amax[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def segment_min_max(seg: jnp.ndarray, val: jnp.ndarray, num_segments: int,
                    interpret: bool = False):
    """Per-segment min and max of `val` (B, K) int32 over segment ids
    `seg` (B, K) in [0, num_segments): -> ((B, S) min, (B, S) max), with
    2^30 / -2^30 for empty segments. The one-hot masked-reduction
    replacement for a (segment, value)-keyed lax.sort + first/last pick
    (the ReduceByKey extents role, apriltag_gpu.cu:829-862) — ~0.2 ms
    instead of ~1.3 ms per 131k-point sort per frame on v5e."""
    b, k = seg.shape
    k_tile = _pick_tile(k)
    s_pad = _ceil_to(num_segments, _S_CHUNK)
    segc = seg.reshape(b * k, 1)
    valc = val.reshape(b * k, 1)
    n_tiles = k // k_tile
    colspec = pl.BlockSpec((k_tile, 1),
                           lambda i, j, n=n_tiles: (i * n + j, 0),
                           memory_space=pltpu.VMEM)
    mn, mx = pl.pallas_call(
        _make_minmax_kernel(s_pad, k_tile),
        grid=(b, n_tiles),
        in_specs=[colspec, colspec],
        out_specs=(pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, 1, s_pad), jnp.int32),
                   jax.ShapeDtypeStruct((b, 1, s_pad), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, s_pad), jnp.int32),
                        pltpu.VMEM((1, s_pad), jnp.int32)],
        interpret=interpret,
    )(segc, valc)
    return mn[:, 0, :num_segments], mx[:, 0, :num_segments]


def segment_min_max_ref(seg: jnp.ndarray, val: jnp.ndarray,
                        num_segments: int):
    """jnp reference/CPU fallback with identical semantics."""
    big = 2 ** 30
    b = seg.shape[0]
    offs = jnp.arange(b, dtype=jnp.int32)[:, None] * num_segments
    clip = jnp.clip(seg, 0, num_segments - 1)
    flat = (clip + offs).reshape(-1)
    inb = ((seg >= 0) & (seg < num_segments)).reshape(-1)
    v = val.reshape(-1)
    mn = jnp.full((b * num_segments,), big, jnp.int32).at[flat].min(
        jnp.where(inb, v, big))
    mx = jnp.full((b * num_segments,), -big, jnp.int32).at[flat].max(
        jnp.where(inb, v, -big))
    return mn.reshape(b, num_segments), mx.reshape(b, num_segments)


def _make_rank_gather_kernel(hi_dim: int, k_tile: int):
    s_chunk = min(_S_CHUNK, hi_dim)
    n_chunks = (hi_dim + s_chunk - 1) // s_chunk

    def kernel(lab_ref, rhi_ref, rlo_ref, out_ref, acc):
        lab = lab_ref[:]                                   # (K_TILE, 1)
        hi = lab >> 9
        lo = lab & 511
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (k_tile, 512), 1)
        oh_lo = (lo == iota_lo).astype(jnp.float32)
        g = []
        for tab_ref in (rhi_ref, rlo_ref):
            acc[:] = jnp.zeros_like(acc)
            for ci in range(n_chunks):
                iota_s = ci * s_chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (k_tile, s_chunk), 1)
                oh_hi = (hi == iota_s).astype(jnp.bfloat16)
                tab = tab_ref[0, pl.ds(ci * s_chunk, s_chunk), :]
                acc[:] += jax.lax.dot_general(
                    oh_hi, tab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            g.append(jnp.sum(acc[:] * oh_lo, axis=1, keepdims=True))
        out_ref[:] = (g[0] * 256.0 + g[1]).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank_gather(labels: jnp.ndarray, rank_v: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """ranks_per_pixel[i] = rank_v[labels[i]] for labels (B, N) int32 in
    [0, N), rank_v (B, N) int32 in [0, 2048): the CCL rank-broadcast
    epilogue as a factored one-hot MXU gather over the (label>>9,
    label&511) table space — one-hot rows select exactly one bf16 chunk
    entry (rank>>8 <= 7, rank&255 <= 255, both bf16-exact), so the result
    is bit-exact. NOTE: measured SLOWER than the near-scalar (B, N)
    take_along_axis it was meant to replace (43.8 vs 39.3 ms whole-CCL
    at (4, 400, 640) on v5e) — the (K_TILE, 512) one-hot intermediate
    costs ~16 KB of VMEM traffic per gathered element. Kept as the
    bit-exact reference implementation for in-kernel epilogues."""
    b, n = labels.shape
    assert n < (1 << 19), n
    hi_dim = _ceil_to(-(-n // 512), 8)
    if hi_dim > _S_CHUNK:          # chunked table reads need whole chunks
        hi_dim = _ceil_to(hi_dim, _S_CHUNK)
    pad_n = hi_dim * 512
    rv = rank_v
    if pad_n != n:
        rv = jnp.pad(rank_v, ((0, 0), (0, pad_n - n)))
    rtab = rv.reshape(b, hi_dim, 512)
    r_hi = (rtab >> 8).astype(jnp.bfloat16)
    r_lo = (rtab & 255).astype(jnp.bfloat16)
    k_tile = _pick_tile(n)
    col = labels.reshape(b * n, 1)
    n_tiles = n // k_tile
    out = pl.pallas_call(
        _make_rank_gather_kernel(hi_dim, k_tile),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((k_tile, 1),
                         lambda i, j, nt=n_tiles: (i * nt + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hi_dim, 512), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hi_dim, 512), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_tile, 1),
                               lambda i, j, nt=n_tiles: (i * nt + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((k_tile, 512), jnp.float32)],
        interpret=interpret,
    )(col, r_hi, r_lo)
    return out.reshape(b, n)
