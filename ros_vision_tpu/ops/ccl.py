"""Connected-components labeling on TPU.

Outputs per pixel: the canonical min-index label, the exact component size,
and a dense rank in [1, MAX_BLOBS] over "big" components (size >= min_blob)
— the same 2048-blob id compression the reference bakes into its packed
point types (points.h:171 kMaxBlobs = 2048). Ranks let the boundary stage
build single-int32 blob-pair sort keys (11+11 bits) instead of sorting two
full label words, and they ride the size gather for free.

TPU-native replacement for the reference's BKE union-find labeling
(labeling_allegretti_2019_BKE.cu:466-492). Atomics/pointer-chasing union-find
is hostile to the TPU's dense SIMD model, so we use a dense
Shiloach-Vishkin-style algorithm instead: iterative min-neighbor hooking with
scatter-min plus pointer-jumping path compression, which converges in
O(log diameter) full-image passes — every pass is pure vectorized
gather/scatter the XLA compiler pipelines over HBM.

Connectivity matches the apriltag unionfind semantics the reference
implements: 4-way for black (0) pixels, 8-way for white (255); 127 pixels are
their own singletons. Every component's final label is the minimum flat pixel
index in the component (deterministic canonical labels, unlike the
reference's arbitrary union-find representatives).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.int32(2 ** 30)   # np scalar: a jnp constant would force backend
# initialization at import time (the axon relay may be unreachable)

MAX_BLOBS = 2048          # dense big-blob id space (points.h:171 kMaxBlobs)
_SIZE_BITS = 20           # sizes < 2^20 (decimated pixels; w*h < 2^22 cap)


def _finish(p: jnp.ndarray, b: int, n: int, min_blob: int):
    """Shared epilogue: per-pixel (sizes, ranks) from converged parents via
    ONE packed gather. ranks = dense 1..MAX_BLOBS ids over components with
    size >= min_blob (0 elsewhere), ordered by root pixel index."""
    offs = jnp.arange(b, dtype=jnp.int32)[:, None] * n
    flat = (p + offs).reshape(-1)
    sizes_at_root = jnp.zeros((b * n,), jnp.int32).at[flat].add(
        jnp.ones((b * n,), jnp.int32)).reshape(b, n)
    is_big_root = (p == jnp.arange(n, dtype=jnp.int32)[None, :]) & \
        (sizes_at_root >= min_blob)
    from ros_vision_tpu.ops.scan import cumsum_mxu
    rank_at_root = cumsum_mxu(
        is_big_root.astype(jnp.float32), binary=True).astype(jnp.int32)
    rank_at_root = jnp.where(is_big_root & (rank_at_root <= MAX_BLOBS),
                             rank_at_root, 0)
    packed_at_root = (rank_at_root << _SIZE_BITS) | sizes_at_root
    packed = jnp.take_along_axis(packed_at_root, p, axis=1)
    return packed & ((1 << _SIZE_BITS) - 1), packed >> _SIZE_BITS

# (dy, dx, diagonal?)
_OFFSETS = [
    (0, -1, False), (0, 1, False), (-1, 0, False), (1, 0, False),
    (-1, -1, True), (-1, 1, True), (1, -1, True), (1, 1, True),
]


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift (B, H, W) so that out[y, x] = in[y+dy, x+dx], filling borders.
    pad+slice (not roll+update) so XLA fuses it into the consumer."""
    b, h, w = x.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
    return jax.lax.slice(pad, (0, 1 + dy, 1 + dx), (b, 1 + dy + h, 1 + dx + w))


def _neighbor_min(labels_img: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Min label over connectivity-eligible neighbors (and self)."""
    m = labels_img
    not127 = v != 127
    for dy, dx, diag in _OFFSETS:
        nv = _shift2d(v, dy, dx, jnp.uint8(127))
        nl = _shift2d(labels_img, dy, dx, _BIG)
        ok = not127 & (nv == v)
        if diag:
            ok &= v == 255
        m = jnp.minimum(m, jnp.where(ok, nl, _BIG))
    return m


def _line_cummin(labels_img: jnp.ndarray, v: jnp.ndarray,
                 axis: int) -> jnp.ndarray:
    """Segmented forward+backward cummin of labels along rows (axis=2) or
    columns (axis=1), with segment resets wherever the pixel value changes
    (or is 127). Propagates the min label across an entire same-value run in
    one pass — the workhorse that makes convergence O(shape turns) instead
    of O(diameter)."""
    same_prev = jnp.concatenate([
        jnp.zeros_like(jnp.take(v, jnp.array([0]), axis=axis), jnp.bool_),
        (jnp.diff(v.astype(jnp.int16), axis=axis) == 0)], axis=axis)
    run = same_prev & (v != 127)
    reset = ~run

    def combine(a, bseg):
        av, af = a
        bv, bf = bseg
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    fwd, _ = jax.lax.associative_scan(combine, (labels_img, reset), axis=axis)
    bwd, _ = jax.lax.associative_scan(
        combine, (jnp.flip(fwd, axis), jnp.flip(_flip_reset(reset, axis),
                                                axis)), axis=axis)
    return jnp.minimum(fwd, jnp.flip(bwd, axis))


def _flip_reset(reset: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Reset flags for the reversed direction: segment breaks shift by one."""
    shifted = jnp.roll(reset, -1, axis=axis)
    # last element along axis starts a segment in the reversed scan
    idx = [slice(None)] * reset.ndim
    idx[axis] = -1
    return shifted.at[tuple(idx)].set(True)


@functools.partial(jax.jit, static_argnames=("max_iters", "sweep_iters",
                                             "min_blob"))
def label_components(threshim: jnp.ndarray, max_iters: int = 32,
                     sweep_iters: int = 1, min_blob: int = 25):
    """Label same-value components of a {0,127,255} image.

    threshim: (B, H, W) uint8.
    Returns (labels, sizes, ranks): labels (B, H*W) int32 = min flat index of
    each pixel's component; sizes (B, H*W) int32 = component size gathered
    back to every pixel (the reference exposes per-blob sizes the same way
    for the min-cluster-pixel gates,
    labeling_allegretti_2019_BKE.cu:411-460); ranks (B, H*W) int32 = dense
    1..MAX_BLOBS ids over size>=min_blob components (0 for small ones).

    Hybrid schedule tuned for TPU: gathers/scatters are the expensive ops
    (XLA lowers them to near-scalar loops), while shifted min-convolutions
    are cheap VPU work. Each outer round therefore runs `sweep_iters` pure
    shift-min propagation sweeps (no gathers) followed by ONE hook +
    pointer-jump round; the sweeps collapse local structure so only a few
    expensive rounds are needed for long, snaking components.
    """
    b, h, w = threshim.shape
    n = h * w
    init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))

    def gather(p, idx):
        return jnp.take_along_axis(p, idx, axis=1)

    def body(state):
        p, _, it = state
        # cheap local sweeps: line cummins propagate labels along entire
        # same-value runs; one neighbor-min couples rows/cols + diagonals
        def sweep(_, q):
            limg = q.reshape(b, h, w)
            limg = _line_cummin(limg, threshim, axis=2)
            limg = _line_cummin(limg, threshim, axis=1)
            return _neighbor_min(limg, threshim).reshape(b, n)
        m = jax.lax.fori_loop(0, sweep_iters, sweep, p)
        # hook: p[p[i]] <- min(m[i]) over i sharing the parent
        offs = jnp.arange(b, dtype=jnp.int32)[:, None] * n
        flat = (p + offs).reshape(-1)
        pn = p.reshape(-1).at[flat].min(m.reshape(-1)).reshape(b, n)
        # pointer jumping (path compression), twice
        pn = gather(pn, pn)
        pn = gather(pn, pn)
        changed = jnp.any(pn != p)
        return pn, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    p, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True),
                                              jnp.int32(0)))
    sizes, ranks = _finish(p, b, n, min_blob)
    return p, sizes, ranks


def _coarsen_thresh(threshim: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) {0,127,255} -> (B, H/2, W/2): 255 where the 2x2 block is
    all-white, 0 where all-black, 127 (isolated) otherwise. Within a uniform
    block all 4 pixels are mutually connected (white: 8-way incl. diagonals;
    black: the 4-cycle of side adjacencies), and adjacency between uniform
    blocks of the same value implies pixel-level connectivity (side contact;
    diagonal white blocks touch corner-diagonally = 8-way) — so the SAME
    sweep rules apply to the coarse image and any label it propagates is a
    label of genuinely connected pixels."""
    b, h, w = threshim.shape
    q = threshim.reshape(b, h // 2, 2, w // 2, 2)
    allw = (q == 255).all(axis=(2, 4))
    allb = (q == 0).all(axis=(2, 4))
    return jnp.where(allw, jnp.uint8(255),
                     jnp.where(allb, jnp.uint8(0), jnp.uint8(127)))


def _flood_multilevel(threshim, values, interpret, strides, levels,
                      chunk=1, diag_strides=(), unit_passes=1,
                      sparse_diag=False):
    """Pyramid-preconditioned min-flood: flood the uniform-block coarse
    graph first (4x smaller, and the tortuous around-the-specks paths of
    the big background component shortcut through all-white-block
    highways), seed the fine flood with the coarse labels, finish at full
    resolution. Exact: seeds only ever carry labels from genuinely
    connected pixels, and min-flood is monotone."""
    from ros_vision_tpu.ops import ccl_pallas
    b, h, w = threshim.shape
    if levels > 0 and h % 2 == 0 and w % 2 == 0 and h // 2 >= 32 \
            and w // 2 >= 128:
        ct = _coarsen_thresh(threshim)
        cv = values.reshape(b, h // 2, 2, w // 2, 2).min(axis=(2, 4))
        cl = _flood_multilevel(ct, cv, interpret, strides, levels - 1,
                               chunk, diag_strides, unit_passes, sparse_diag)
        up = jnp.broadcast_to(cl[:, :, None, :, None],
                              (b, h // 2, 2, w // 2, 2)).reshape(b, h, w)
        ct_up = jnp.broadcast_to(ct[:, :, None, :, None],
                                 (b, h // 2, 2, w // 2, 2)).reshape(b, h, w)
        values = jnp.where(ct_up != 127, jnp.minimum(values, up), values)
    return ccl_pallas.propagate_fixpoint(threshim, values, strides=strides,
                                         chunk=chunk,
                                         diag_strides=diag_strides,
                                         unit_passes=unit_passes,
                                         sparse_diag=sparse_diag,
                                         interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret", "min_blob",
                                             "strides", "broadcast",
                                             "levels", "chunk",
                                             "diag_strides", "unit_passes",
                                             "sparse_diag"))
def label_components_flood(threshim: jnp.ndarray, interpret: bool = False,
                           min_blob: int = 25, strides: tuple | None = None,
                           broadcast: str = "gather", levels: int = 0,
                           chunk: int = 1,
                           diag_strides: tuple | None = None,
                           unit_passes: int | None = None,
                           sparse_diag: bool | None = None):
    # levels>0 enables the pyramid preconditioner (_flood_multilevel);
    # measured a wash on v5e at 400x640 (43 -> 46 ms at B=4: the coarse
    # kernel + up/down sampling offset the sweep savings) — kept for
    # bigger frames where the fixpoint sweep count grows with diameter.
    """Fully kernel-resident CCL: ONE stride-ladder flood to fixpoint
    labels the components; sizes come from a one-hot MXU histogram over the
    label space (labels ARE flat pixel indices, so the per-root table maps
    back by pure indexing) and sizes/ranks reach every pixel with a single
    packed gather (broadcast='flood' re-floods instead — measured equal).

    Cost model (measured on v5e at (4, 400, 640)): the in-kernel sweep is
    ~10 us and the noisy-scene fixpoint takes ~287 sweeps; the mask build,
    histogram and packed gather are ~2 ms/frame of XLA work around it.
    Replaces label_components_hybrid's outer hook/pointer-jump rounds
    (same outputs/semantics, same BKE-equivalent role as the reference's
    labeling_allegretti_2019_BKE.cu:466-492); default TPU CCL in the
    detector."""
    from ros_vision_tpu.ops import ccl_pallas
    from ros_vision_tpu.ops.scan import cumsum_mxu

    b, h, w = threshim.shape
    n = h * w
    if strides is None:
        strides = ccl_pallas._STRIDES
    if diag_strides is None:
        diag_strides = ccl_pallas._DIAG_STRIDES
    if unit_passes is None:
        # measured: 8 wins at (8, 400, 640) (37.5 vs 40.3 ms kernel-only)
        # but LOSES at 1080p-decimated 540x960 (153.5 vs 141.8 ms at B=4,
        # and a 161 s Mosaic compile) — the bigger frame's fixpoint is
        # reach-bound, not check-bound. Gate by frame size.
        unit_passes = ccl_pallas._UNIT_PASSES if n <= (1 << 18) else 1
    if sparse_diag is None:
        sparse_diag = False     # flipped per-size once measured on chip
    init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                            (b, n)).reshape(b, h, w)
    p = _flood_multilevel(threshim, init, interpret, strides,
                          levels, chunk, diag_strides,
                          unit_passes, sparse_diag).reshape(b, n)

    # component sizes over the label space via the one-hot MXU histogram;
    # counts[v] > 0 iff v is some component's label (= root pixel index),
    # and because labels ARE flat pixel indices the per-root packed table
    # maps back to image layout by pure reshape — no scatter, no gather.
    counts = ccl_pallas.label_histogram(p, interpret=interpret)
    is_root_v = counts > 0
    is_big_v = counts >= min_blob
    rank_v = cumsum_mxu(is_big_v.astype(jnp.float32),
                        binary=True).astype(jnp.int32)
    rank_v = jnp.where(is_big_v & (rank_v <= MAX_BLOBS), rank_v, 0)
    # pack rank (12 bits) | size (19 bits). Sizes stay EXACT only while
    # n < 2^19; the detector's flood auto-gate admits frames up to exactly
    # this bound (detector.py), and the assert keeps direct callers honest.
    assert n < (1 << 19), \
        f"flood CCL size packing needs h*w < 2^19 ({n}); use label_components"
    packed_v = jnp.where(is_root_v,
                         (rank_v << 19) | counts,
                         jnp.int32(2 ** 31 - 1))
    if broadcast == "flood":
        packed = ccl_pallas.propagate_fixpoint(
            threshim, packed_v.reshape(b, h, w),
            strides=strides, diag_strides=diag_strides,
            unit_passes=unit_passes, interpret=interpret).reshape(b, n)
    else:
        # labels index the per-root table directly (labels ARE flat pixel
        # indices): one (B, N) gather
        packed = jnp.take_along_axis(packed_v, p, axis=1)
    sizes = packed & ((1 << 19) - 1)
    ranks = packed >> 19
    return p, sizes, ranks


@functools.partial(jax.jit, static_argnames=("interpret", "min_blob",
                                             "strides"))
def flood_ranks(threshim: jnp.ndarray, interpret: bool = False,
                min_blob: int = 25, strides: tuple | None = None):
    """Per-pixel dense blob ranks ONLY (B, H*W) — the third output of
    label_components_flood — via the factored one-hot MXU gather
    (gather_pallas.rank_gather). Bit-exact vs label_components_flood's
    ranks (unit-tested) but measured SLOWER on v5e (43.8 vs 39.3 ms at
    (4, 400, 640): the (K, 512) one-hot intermediate is VMEM-traffic
    bound), so the detector keeps label_components_flood; retained as
    the working reference for the fused-frontend kernel's epilogue."""
    from ros_vision_tpu.ops import ccl_pallas, gather_pallas
    from ros_vision_tpu.ops.scan import cumsum_mxu

    b, h, w = threshim.shape
    n = h * w
    assert n < (1 << 19), n
    if strides is None:
        strides = ccl_pallas._STRIDES
    init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                            (b, n)).reshape(b, h, w)
    p = ccl_pallas.propagate_fixpoint(threshim, init, strides=strides,
                                      interpret=interpret).reshape(b, n)
    counts = ccl_pallas.label_histogram(p, interpret=interpret)
    is_big_v = counts >= min_blob
    rank_v = cumsum_mxu(is_big_v.astype(jnp.float32),
                        binary=True).astype(jnp.int32)
    rank_v = jnp.where(is_big_v & (rank_v <= MAX_BLOBS), rank_v, 0)
    return gather_pallas.rank_gather(p, rank_v, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("max_iters", "pallas_sweeps",
                                             "verify_sweeps", "interpret",
                                             "min_blob"))
def label_components_hybrid(threshim: jnp.ndarray, max_iters: int = 16,
                            pallas_sweeps: int = 448,
                            verify_sweeps: int = 64,
                            interpret: bool = False, min_blob: int = 25):
    """label_components with the Pallas VMEM propagation kernel doing the
    bulk of the work: a deep first round (pallas_sweeps on-chip neighbor-min
    sweeps, ops/ccl_pallas.py) collapses everything with bounded shape
    diameter, then shallow rounds (verify_sweeps) with ONE scatter-min hook
    + pointer jump each run until fixpoint (the exactness mechanism and
    long-snake accelerator). Same outputs/semantics as label_components."""
    from ros_vision_tpu.ops import ccl_pallas

    b, h, w = threshim.shape
    n = h * w
    init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))

    def gather(p, idx):
        return jnp.take_along_axis(p, idx, axis=1)

    def body(state):
        p, _, it = state
        sweeps = jnp.where(it == 0, pallas_sweeps, verify_sweeps)
        m = ccl_pallas.propagate(threshim, p.reshape(b, h, w),
                                 n_sweeps=sweeps,
                                 interpret=interpret).reshape(b, n)
        offs = jnp.arange(b, dtype=jnp.int32)[:, None] * n
        pn = p.reshape(-1).at[(p + offs).reshape(-1)].min(
            m.reshape(-1)).reshape(b, n)
        pn = gather(pn, pn)
        return pn, jnp.any(pn != p), it + 1

    p, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), body,
        (init, jnp.bool_(True), jnp.int32(0)))
    sizes, ranks = _finish(p, b, n, min_blob)
    return p, sizes, ranks
