"""Fused Pallas frontend: CCL ranks + boundary compaction in two kernels.

The detector's front half (threshold image -> compacted boundary points)
was ~13 ms/frame of XLA work at (4, 400, 640) on v5e, dominated not by
compute but by HBM materialization and near-scalar lowerings:

  - connectivity-mask build: ~1.9 ms/frame of fused elementwise work whose
    only real cost is the fresh full-frame HBM write;
  - label histogram + rank epilogue: ~3.6 ms/frame, of which ~2.8 ms is a
    single (B, N) random gather (XLA lowers it near-scalar);
  - boundary two-stage compaction: two lax.sort-based stream compactions
    over 256k / 393k elements, ~2.5-4 ms/frame.

This module keeps the whole front half in VMEM. Two kernels per frame:

  rank_image:      threshim -> per-pixel dense blob rank (B, H, W) int32
      1. connectivity masks built IN-KERNEL (rolls of the threshold image;
         no HBM mask plane) — same unit + stride-ladder + diagonal-chain
         scheme as ops/ccl_pallas.build_ladder_masks;
      2. stride-ladder min-flood to fixpoint (labels = min flat pixel
         index per component; equivalent of the BKE union-find,
         labeling_allegretti_2019_BKE.cu:466-492);
      3. component sizes as an MXU histogram over the factored label space
         (hi, lo) = (label >> 9, label & 511): one (HI, W) @ (W, 512)
         bf16 matmul per image row, f32 accumulation (exact: counts
         < 2^24);
      4. dense ranks over size >= min_blob components by an in-kernel 2D
         prefix sum of the histogram plane (same 1..MAX_BLOBS assignment
         as ops/ccl.py; points.h:171 kMaxBlobs = 2048);
      5. rank broadcast back to pixels as a factored one-hot MXU gather:
         per row, tmp = R^T @ onehot_hi then a one-hot row-select over lo
         — each output is a single exact product (one-hot columns select
         one entry), so bf16 chunk tables (rank >> 8, rank & 255) are
         bit-exact.

  boundary_compact: threshim + ranks -> compacted (key, pack2) points
      1. per-pixel candidate bits + per-direction blob-pair keys
         (BlobDiff semantics, apriltag_gpu.cu:226-360) and the
         uniform-thin routing targets, built XLA-SIDE (fused elementwise
         + one MXU cumsum — boundary_planes_xla);
      2. MONOTONE ROUTING stream compaction — the TPU-native replacement
         for cub::DeviceSelect::If (apriltag_gpu.cu:788-802) and for the
         lax.sort compaction of ops/segments.compact: each kept element's
         output slot is a nondecreasing function of its position, so the
         permutation routes in ceil(log2(N)) masked flat-roll steps (a
         vector op per step, ~micro-seconds, vs milliseconds for a sort).
         Run as TWO <=3-plane Pallas kernels (route_planes): the original
         one-kernel stage A (bits + thin + 5 routed planes) crashes the
         Mosaic compile helper, while kernels at or below stage B's size
         compile reliably (bisected round 3; mb_pallas_lottery.py);
      3. capacity overflow handled by closed-form uniform stream thinning
         (bit-identical f32 selection math to ops/segments.thin_uniform,
         so the XLA path and these kernels keep identical semantics);
      4. stage B expands 4 directions per kept pixel (dir-major blocks)
         and routes again to the K-point budget; pack2/key words are
         written directly (quadfit.finish_points layout).
      Measured (4, 400, 640) K=65536 on v5e: 1.92 ms/frame vs 4.31 for
      the XLA boundary_points it replaces, bit-exact incl. overflow.

Outputs are bit-identical to the XLA path (ccl.label_components_flood
ranks; quadfit.boundary_points points, counts and slot order) on every
frame including overflowing ones — unit-tested in interpret mode in
tests/test_frontend_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_BLOB_PIXELS = 25
MAX_BLOBS = 2048
RANK_BITS = 11
KEY_INVALID = 1 << 22

_BIG = 2 ** 30          # python literal: jnp scalars would be captured

# (dy, dx, diagonal) — unit connectivity, same table as ops/ccl.py
_OFFSETS = [
    (0, -1, False), (0, 1, False), (-1, 0, False), (1, 0, False),
    (-1, -1, True), (-1, 1, True), (1, -1, True), (1, 1, True),
]
# boundary emit directions, same table as ops/quadfit.py
_DIRS = ((1, 0), (0, 1), (-1, 1), (1, 1))

# Scoped-VMEM budget for the boundary kernels: XLA may place a kernel's
# full (B, ...) outputs in VMEM (layout S(1)) when fusing, so the scoped
# allocation SCALES WITH BATCH — the default 16 MB limit OOMs at B=16
# (21.47 MB measured) while B<=8 fits. 64 MB covers B=32 with the
# routing stack; v5e has 128 MB VMEM.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)
_VMEM_LIMIT_BIG = pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)

STRIDES = (4, 32)       # straight-chain ladder (measured best on v5e)
DIAG_STRIDES = ()       # white-staircase diagonal chains cut sweeps 28%
# (269 vs 375, scripts/mb_sweep_sched.py) but cost 4 extra rolls/sweep
# (~10% net) AND trigger a Mosaic compiler crash when diagonal-jump
# sweeps and the histogram matmul fori share one kernel (bisected:
# flood(diag)+hist crashes, flood(straight)+hist compiles, each half
# alone compiles) — disabled until the toolchain moves
_MAX_SWEEPS = 16384


def _roll2(x, dy, dx):
    """out[y, x] = in[y+dy, x+dx] with wrap (callers mask borders)."""
    if dy:
        x = pltpu.roll(x, (-dy) % x.shape[0], axis=0)
    if dx:
        x = pltpu.roll(x, (-dx) % x.shape[1], axis=1)
    return x


# ---------------------------------------------------------------------------
# connectivity masks + flood (in-kernel)
# ---------------------------------------------------------------------------

def _build_masks(v, strides, diag_strides):
    """Loop-invariant connectivity bits from the (H, W) int32 threshold
    plane, entirely in VMEM. Bits 0..7: unit directions (_OFFSETS order);
    then 4 bits per straight stride (+x, -x, +y, -y); then 4 bits per
    diagonal stride (+x+y, -x-y, +x-y, -x+y; white-only, since only white
    is 8-connected). Same semantics as ccl_pallas.build_ladder_masks plus
    the diagonal chains."""
    h, w = v.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    not127 = v != 127
    white = v == 255

    bits = []
    for (dy, dx, diag) in _OFFSETS:
        nv = _roll2(v, dy, dx)
        ok = not127 & (nv == v)
        if diag:
            ok &= white
        if dy == -1:
            ok &= rows > 0
        elif dy == 1:
            ok &= rows < h - 1
        if dx == -1:
            ok &= cols > 0
        elif dx == 1:
            ok &= cols < w - 1
        bits.append(ok)
    mask = jnp.zeros(v.shape, jnp.int32)
    for k, ok in enumerate(bits):
        mask = mask | (ok.astype(jnp.int32) << k)

    # straight-chain doubling (border safety is inductive: c_1 is False in
    # the last column/row and c_2s only reads wrapped garbage where c_s is
    # already False); diagonal chains double with (s, s) shifts. Chains are
    # int32 0/1: Mosaic rotates are 32-bit only.
    cpx = bits[1].astype(jnp.int32)               # (0, 1)
    cpy = bits[3].astype(jnp.int32)               # (1, 0)
    cpd = bits[7].astype(jnp.int32)               # (1, 1)
    cpa = bits[6].astype(jnp.int32)               # (1, -1)
    need = max(list(strides) + list(diag_strides) + [1])
    chains = {1: (cpx, cpy, cpd, cpa)}
    s = 1
    while s < need:
        cpx = cpx & _roll2(cpx, 0, s)
        cpy = cpy & _roll2(cpy, s, 0)
        if diag_strides:
            cpd = cpd & _roll2(cpd, s, s)
            cpa = cpa & _roll2(cpa, s, -s)
        s *= 2
        chains[s] = (cpx, cpy, cpd, cpa)
    bit = 8
    for s in strides:
        px, py = chains[s][0], chains[s][1]
        for m in (px, _roll2(px, 0, -s), py, _roll2(py, -s, 0)):
            mask = mask | (m << bit)
            bit += 1
    for s in diag_strides:
        pd, pa = chains[s][2], chains[s][3]
        for m in (pd, _roll2(pd, -s, -s), pa, _roll2(pa, -s, s)):
            mask = mask | (m << bit)
            bit += 1
    return mask


def _unit_pass(mask, lab, reverse=False):
    """One chained unit-neighborhood pass (8 masked rolls, Gauss-Seidel).
    Alternating forward/reversed order between passes cuts sweeps-to-
    fixpoint ~linearly in passes per sweep (the fixpoint is turn-bound;
    ccl_pallas._unit_pass has the measured curve). Unit passes touch only
    the unit-direction mask bits — NOT the diagonal-jump chains that
    trigger the Mosaic crash next to the histogram matmul fori."""
    m = lab
    seq = list(enumerate(_OFFSETS))
    if reverse:
        seq = seq[::-1]
    for k, (dy, dx, _d) in seq:
        nl = _roll2(m, dy, dx)
        m = jnp.minimum(m, jnp.where(((mask >> k) & 1) == 1, nl, _BIG))
    return m


def _ladder_sweep(mask, lab, strides, diag_strides, unit_passes=1):
    """One chained sweep: largest jumps first on the running minimum,
    then `unit_passes` unit 8-neighborhood passes in alternating order."""
    m = lab
    jumps = []
    bit = 8
    for s in strides:
        for (dy, dx) in ((0, s), (0, -s), (s, 0), (-s, 0)):
            jumps.append((dy, dx, bit))
            bit += 1
    for s in diag_strides:
        for (dy, dx) in ((s, s), (-s, -s), (s, -s), (-s, s)):
            jumps.append((dy, dx, bit))
            bit += 1
    for dy, dx, b in reversed(jumps):
        nl = _roll2(m, dy, dx)
        m = jnp.minimum(m, jnp.where(((mask >> b) & 1) == 1, nl, _BIG))
    for i in range(unit_passes):
        m = _unit_pass(mask, m, reverse=(i % 2 == 1))
    return m


def _flood(v, strides, diag_strides, unit_passes=1):
    """Min-flood flat pixel indices over same-value connectivity to
    fixpoint. Returns the (H, W) int32 label plane."""
    h, w = v.shape
    mask = _build_masks(v, strides, diag_strides)
    init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))

    def step(state):
        lab, _, it = state
        new = _ladder_sweep(mask, lab, strides, diag_strides, unit_passes)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < _MAX_SWEEPS), step,
        (init, jnp.bool_(True), jnp.int32(0)))
    return lab


# ---------------------------------------------------------------------------
# in-kernel prefix sums
# ---------------------------------------------------------------------------

def _lane_prefix(x):
    """Inclusive prefix sum along the last (lane) axis of an (R, W) int32
    plane: log2(W) masked roll-adds."""
    w = x.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < w:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        x = x + jnp.where(cols >= s, shifted, 0)
        s *= 2
    return x


def _sublane_prefix(x):
    """Inclusive prefix sum along the first (sublane) axis of an (R, C)
    int32 plane."""
    r = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < r:
        shifted = pltpu.roll(x, s, axis=0)
        x = x + jnp.where(rows >= s, shifted, 0)
        s *= 2
    return x


def _flat_prefix_excl(valid):
    """Exclusive prefix sum of an (R, W) 0/1 int32 plane in row-major
    order; also returns the total as a scalar. (The total comes from a
    full-plane reduce rather than slicing the last prefix row — a static
    sublane-offset slice of the (R, 1) column crashes the Mosaic
    compiler, bisected on v5e.)"""
    inrow = _lane_prefix(valid)                       # (R, W) inclusive
    row_tot = inrow[:, -1:]                           # (R, 1)
    row_incl = _sublane_prefix(row_tot)               # (R, 1)
    row_excl = row_incl - row_tot
    s_incl = row_excl + inrow
    return s_incl - valid, jnp.sum(valid)


# ---------------------------------------------------------------------------
# monotone routing (stream compaction)
# ---------------------------------------------------------------------------

def _flatroll_dyn(x, q, r, cols):
    """Row-major flat roll by a TRACED amount s = q*w + r:
    out[i] = in[i + s] on an (R, W) plane. Dynamic shifts lower to
    tpu.dynamic_rotate; when r == 0 the lane select is the identity."""
    h, w = x.shape
    a = pltpu.roll(x, (-q) % h, axis=0)
    c = pltpu.roll(a, (-r) % w, axis=1)
    dn = pltpu.roll(pltpu.roll(a, h - 1, axis=0), (-r) % w, axis=1)
    return jnp.where(cols < w - r, c, dn)


def _route(planes, d, nbits):
    """Monotone leftward routing: move element at flat position i to
    position i - d[i], for strictly-increasing-target streams (guaranteed
    by thin targets). planes: list of (R, W) int32 payload planes where
    plane[0] < 0 marks an empty/invalid slot. Holes left behind become
    invalid. ceil(log2(max_d)) = nbits masked flat-roll steps, run as a
    fori_loop with DYNAMIC roll distances — an unrolled 19-step version
    with static shifts blows up the Mosaic compile helper (bisected
    crash on v5e)."""
    h, w = planes[0].shape
    m = h * w
    flat = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def step(k, state):
        ps, dd = state
        s = jnp.int32(1) << k
        q = s // w
        r = s - q * w
        inc = [_flatroll_dyn(p, q, r, cols) for p in ps]
        inc_d = _flatroll_dyn(dd, q, r, cols)
        take = (inc[0] >= 0) & (((inc_d >> k) & 1) == 1) & (flat < m - s)
        stay = (ps[0] >= 0) & (((dd >> k) & 1) == 0)
        new0 = jnp.where(take, inc[0], jnp.where(stay, ps[0], -1))
        rest = [jnp.where(take, ip, p) for ip, p in zip(inc[1:], ps[1:])]
        return [new0] + rest, jnp.where(take, inc_d, dd)

    planes, _ = jax.lax.fori_loop(0, nbits, step, (list(planes), d))
    return planes


def _thin_targets(valid, cap):
    """Uniform-thinning output slots: same closed-form f32 selection as
    ops/segments.thin_uniform — keep iff floor((slot+1)r) > floor(slot*r),
    target floor(slot*r), r = min(1, (cap-2)/T). Returns (keep, target,
    kept_total (1,1))."""
    s_excl, total = _flat_prefix_excl(valid.astype(jnp.int32))
    tf = jnp.maximum(total.astype(jnp.float32), 1.0)
    r = jnp.minimum(1.0, (cap - 2) / tf)              # scalar
    slot = s_excl.astype(jnp.float32)
    t_here = jnp.floor(slot * r)
    keep = (valid > 0) & (jnp.floor((slot + 1.0) * r) > t_here)
    kept = jnp.floor(total.astype(jnp.float32) * r).astype(jnp.int32)
    return keep, t_here.astype(jnp.int32), kept


# ---------------------------------------------------------------------------
# rank kernel
# ---------------------------------------------------------------------------

def _make_rank_kernel(h, w, hi_dim, min_blob, strides, diag_strides,
                      unit_passes=1, hc=8, gc=8, split_u8=False):
    n = h * w

    # hc: rows per histogram matmul; gc: rows per gather matmul (the f32
    # tmp — MXU accumulators must be 32-bit — is (512, gc*W)). The old
    # (8, 2) defaults were sized for the 16/28 MB scoped-VMEM era; with
    # the 64 MB limit wider chunks fit. Chip A/B at (8, 400, 640)
    # (scripts/mb_rankchunks.py, interleaved two-pass minima): (8,2)
    # 6.05 ms/frame, (8,8)/(16,4)/(16,8) all ~5.74-5.75 — plateau past
    # gc=4, so (8, 8) ships.
    assert h % hc == 0 and h % gc == 0, h

    def kernel(thresh_ref, *refs):
        if split_u8:
            # two u8 output planes (rank >> 8, rank & 255): halves the
            # HBM output traffic vs one int32 plane. gc-row slices are
            # written into an i32 scratch (u8 sublane tiles are 32 rows
            # — unaligned u8 slice stores are not) and converted with
            # two full-plane stores at the end.
            hi_ref, lo_ref, hist_ref, lab_ref, acc_ref = refs
        else:
            rank_ref, hist_ref, lab_ref = refs
            acc_ref = None
        v = thresh_ref[0].astype(jnp.int32)
        lab_ref[:] = _flood(v, strides, diag_strides, unit_passes)

        # ---- histogram over the factored label space ----------------
        # hc rows per iteration: per-row matmuls drown in loop overhead
        # and (HI, 512) accumulator traffic (~400 read-modify-writes of
        # 1 MB); lane-concatenating hc rows into one (HI, hc*W) one-hot
        # cuts both by hc
        hist_ref[:] = jnp.zeros_like(hist_ref)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_dim, hc * w), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (512, hc * w), 0)

        def hist_chunk(i, _):
            rows = jnp.concatenate(
                [lab_ref[pl.ds(i * hc + r, 1), :] for r in range(hc)],
                axis=1)                                    # (1, hc*W)
            oh_hi = ((rows >> 9) == iota_hi).astype(jnp.bfloat16)
            oh_lo = ((rows & 511) == iota_lo).astype(jnp.bfloat16)
            hist_ref[:] += jax.lax.dot_general(
                oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, h // hc, hist_chunk, 0)

        # ---- dense ranks over big components ------------------------
        counts = hist_ref[:]                               # (HI, 512) f32
        is_big = (counts >= min_blob).astype(jnp.int32)
        rank_incl = _lane_prefix(is_big)
        row_tot = rank_incl[:, -1:]
        rank_incl = rank_incl + (_sublane_prefix(row_tot) - row_tot)
        rank = jnp.where((is_big == 1) & (rank_incl <= MAX_BLOBS),
                         rank_incl, 0)
        r_hi = (rank >> 8).astype(jnp.bfloat16)
        r_lo = (rank & 255).astype(jnp.bfloat16)

        # ---- rank broadcast: factored one-hot gather, gc rows/iter ---
        # every one-hot column selects exactly one table entry (<= 255),
        # so bf16 products AND the axis-0 sum (one nonzero term) are
        # exact end to end
        iota_hi_g = jax.lax.broadcasted_iota(jnp.int32, (hi_dim, gc * w), 0)
        iota_lo_g = jax.lax.broadcasted_iota(jnp.int32, (512, gc * w), 0)

        def gather_chunk(i, _):
            rows = jnp.concatenate(
                [lab_ref[pl.ds(i * gc + r, 1), :] for r in range(gc)],
                axis=1)                                    # (1, gc*W)
            oh_hi = ((rows >> 9) == iota_hi_g).astype(jnp.bfloat16)
            oh_lo = ((rows & 511) == iota_lo_g).astype(jnp.bfloat16)
            g = []
            for tab in (r_hi, r_lo):
                tmp = jax.lax.dot_general(       # (512, gc*W) f32
                    tab, oh_hi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g.append(jnp.sum(tmp * oh_lo.astype(jnp.float32), axis=0,
                                 keepdims=True))
            rank_rows = (g[0] * 256.0 + g[1]).astype(jnp.int32)
            for r in range(gc):
                row = rank_rows[:, r * w:(r + 1) * w]
                if split_u8:
                    acc_ref[pl.ds(i * gc + r, 1), :] = row
                else:
                    rank_ref[0, pl.ds(i * gc + r, 1), :] = row
            return 0

        jax.lax.fori_loop(0, h // gc, gather_chunk, 0)
        if split_u8:
            acc = acc_ref[:]
            hi_ref[0] = (acc >> 8).astype(jnp.uint8)
            lo_ref[0] = (acc & 255).astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnames=("min_blob", "strides",
                                             "diag_strides", "unit_passes",
                                             "hc", "gc", "split_u8",
                                             "interpret"))
def rank_image(threshim: jnp.ndarray, min_blob: int = MIN_BLOB_PIXELS,
               strides: tuple = STRIDES,
               diag_strides: tuple = DIAG_STRIDES,
               unit_passes: int | None = None,
               hc: int = 8, gc: int = 8, split_u8: bool = False,
               interpret: bool = False):
    """(B, H, W) uint8 threshold image -> (B, H, W) int32 dense blob ranks
    (1..MAX_BLOBS over components with size >= min_blob, 0 elsewhere) —
    the third output of ccl.label_components_flood, computed without any
    intermediate HBM plane.

    split_u8=True instead returns (rank >> 8, rank & 255) as two uint8
    planes — half the HBM output traffic (the plane write runs at the
    sad fresh-buffer rate); callers reassemble with one fused shift+or
    (frontend()).

    Shapes that are not tile-aligned (w % 128 or h % 8 != 0, e.g. the
    1080p decimated 540x960) are padded in-kernel with 127 ("own blob")
    pixels: padding pixels get no connectivity bits, form singleton
    components below min_blob (rank 0), and trailing row/column padding
    preserves the row-major order of real root pixels — so the
    sliced-back ranks are bit-identical to the unpadded assignment."""
    b, h, w = threshim.shape
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    if (wp, hp) != (w, h):
        threshim = jnp.pad(threshim,
                           ((0, 0), (0, hp - h), (0, wp - w)),
                           constant_values=127)
    n = hp * wp
    # the (label >> 9, label & 511) factored one-hot machinery is generic
    # in hi_dim = ceil(n / 512); 2^20 bounds the padded 1080p decimated
    # frame while keeping the one-hot build cost sane
    assert n <= (1 << 20), "label space too large for the factored hists"
    if unit_passes is None:
        # same gate as ccl.label_components_flood: multi-pass sweeps win
        # at bench sizes, lose on big (reach-bound) frames
        unit_passes = 16 if n <= (1 << 18) else 1
    hi_dim = max(8, -(-(-(-n // 512)) // 8) * 8)
    spec = lambda: pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((hi_dim, 512), jnp.float32),
               pltpu.VMEM((hp, wp), jnp.int32)]
    if split_u8:
        out_specs = (spec(), spec())
        out_shape = (jax.ShapeDtypeStruct((b, hp, wp), jnp.uint8),) * 2
        scratch = scratch + [pltpu.VMEM((hp, wp), jnp.int32)]
    else:
        out_specs = spec()
        out_shape = jax.ShapeDtypeStruct((b, hp, wp), jnp.int32)
    out = pl.pallas_call(
        _make_rank_kernel(hp, wp, hi_dim, min_blob, strides, diag_strides,
                          unit_passes, hc, gc, split_u8),
        grid=(b,),
        in_specs=[spec()],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # Mosaic keeps the roll temporaries of the flood loop live on the
        # stack: the default scoped-vmem limit OOMs by ~2 MB at 400x640
        # (measured r3: 30.83M needed vs 28.70M default limit). Frames
        # past the bench size (the padded 1080p decimated plane is 2.2x
        # the 400x640 working set) get the wider budget — v5e has 128 MB.
        compiler_params=(_VMEM_LIMIT if n <= (1 << 18)
                         else _VMEM_LIMIT_BIG),
        interpret=interpret,
    )(threshim)
    if (wp, hp) != (w, h):
        if split_u8:
            out = tuple(o[:, :h, :w] for o in out)
        else:
            out = out[:, :h, :w]
    return out


# ---------------------------------------------------------------------------
# boundary kernel
# ---------------------------------------------------------------------------

def _boundary_bits(v, ranks):
    """Candidate maskbits + per-direction pair-key planes from the (H, W)
    int32 threshold and rank planes (BlobDiff semantics; identical math to
    quadfit.boundary_masks)."""
    h, w = v.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    interior = (rows >= 1) & (rows <= h - 2) & (cols >= 1) & (cols <= w - 2)
    big = ranks > 0
    mask = jnp.zeros(v.shape, jnp.int32)
    keys = []
    for d, (dx, dy) in enumerate(_DIRS):
        nv = _roll2(v, dy, dx)
        nr = _roll2(ranks, dy, dx)           # int32 roll; nbig = nr > 0
        ok = interior & ((v + nv) == 255) & big & (nr > 0)
        gpos = nv > v
        mask = mask | (ok.astype(jnp.int32) << d) \
            | ((ok & gpos).astype(jnp.int32) << (4 + d))
        lo = jnp.minimum(ranks, nr) - 1
        hi = jnp.maximum(ranks, nr) - 1
        keys.append(jnp.where(ok & (lo >= 0), (lo << RANK_BITS) | hi,
                              KEY_INVALID))
    return mask, keys


def _make_stage_a_kernel(h, w, br):
    """bits + thin + route emitting pixels; outputs the first BR rows of
    the routed pm and per-dir key planes. (Historical: the original
    one-kernel stage A. The Mosaic compile helper rejects it — bits +
    thin prefix scans + a 5-plane routing loop in one program — while
    each piece alone compiles; kept for interpret-mode reference. The
    production path is boundary_planes_xla + _make_route_kernel.)"""
    n = h * w
    nbits_a = max(1, (n - 1).bit_length())

    def kernel(thresh_ref, rank_ref, pm_ref, k0_ref, k1_ref, k2_ref,
               k3_ref):
        v = thresh_ref[0].astype(jnp.int32)
        ranks = rank_ref[0]
        mask, keys = _boundary_bits(v, ranks)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        pxy = (rows << 11) | cols
        valid_a = (mask & 0xF) != 0
        keep_a, tgt_a, _ = _thin_targets(valid_a, br * w)
        pm = jnp.where(keep_a, (pxy << 8) | mask, -1)
        flat = rows * w + cols
        d_a = jnp.where(keep_a, flat - tgt_a, 0)
        routed = _route([pm] + keys, d_a, nbits_a)
        for ref, plane in zip((pm_ref, k0_ref, k1_ref, k2_ref, k3_ref),
                              routed):
            ref[0] = plane[:br, :]

    return kernel


def _make_route_kernel(h, w, br, nplanes):
    """Pure routing kernel: route `nplanes` payload planes left by a
    precomputed per-element distance plane `d` (holes -> invalid on plane
    0, which must carry the <0-is-empty convention), emitting the first
    BR rows. Sized like the proven stage-B kernel (<= 3 routed planes +
    d), which the Mosaic helper compiles reliably — unlike the full
    bits+thin+route stage-A program."""
    n = h * w
    nbits = max(1, (n - 1).bit_length())

    def kernel(*refs):
        d_ref = refs[0]
        in_refs = refs[1:1 + nplanes]
        out_refs = refs[1 + nplanes:]
        planes = [r[0] for r in in_refs]
        routed = _route(planes, d_ref[0], nbits)
        for ref, plane in zip(out_refs, routed):
            ref[0] = plane[:br, :]

    return kernel


def boundary_planes_xla(threshim: jnp.ndarray, ranks_img: jnp.ndarray,
                        br: int):
    """XLA-side stage-A plane build: boundary bits, per-direction pair
    keys, uniform-thinned pm and the monotone routing distances — all
    fused elementwise + one MXU cumsum (segs.thin_uniform), no sorts.
    Returns (pm, d, [k0..k3]) as (B, H, W) int32 planes, bit-identical
    to the in-kernel _boundary_bits/_thin_targets math."""
    from ros_vision_tpu.ops import quadfit, segments as segs
    b, h, w = threshim.shape
    n = h * w
    maskbits, keyimg = quadfit.boundary_masks(threshim, ranks_img)
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    pxy = ((ys[:, None] << 11) | xs[None, :])[None] \
        + jnp.zeros((b, h, w), jnp.int32)
    valid_a = (maskbits & 0xF).reshape(b, n) != 0
    keep_a, tgt_a = segs.thin_uniform(valid_a, br * w)
    flat = jnp.arange(n, dtype=jnp.int32)[None]
    pm = jnp.where(keep_a, ((pxy << 8) | maskbits).reshape(b, n), -1)
    d_a = jnp.where(keep_a, flat - tgt_a, 0)
    return (pm.reshape(b, h, w), d_a.reshape(b, h, w),
            [keyimg[:, i] for i in range(4)])


def route_planes(d: jnp.ndarray, planes: list, br: int,
                 interpret: bool = False) -> list:
    """Route (B, H, W) payload planes by the distance plane `d` in Pallas,
    3 planes per kernel (the helper-safe size), returning (B, BR, W)
    compacted planes. plane[0] must be the validity-bearing plane (<0 =
    empty); it is duplicated into each kernel as the routing mask."""
    b, h, w = planes[0].shape
    spec = lambda sh: pl.BlockSpec((1,) + sh,  # noqa: E731
                                   lambda i: (i,) + (0,) * len(sh),
                                   memory_space=pltpu.VMEM)
    outs: list = [None] * len(planes)
    outs[0] = None
    # first kernel routes [p0, p1, p2]; later kernels route [p0, pi, pj]
    # and discard their duplicate p0 output
    groups = [[0, 1, 2][:len(planes)]]
    i = 3
    while i < len(planes):
        groups.append([0] + list(range(i, min(i + 2, len(planes)))))
        i += 2
    for gi, grp in enumerate(groups):
        nplanes = len(grp)
        routed = pl.pallas_call(
            _make_route_kernel(h, w, br, nplanes),
            grid=(b,),
            in_specs=[spec((h, w))] * (1 + nplanes),
            out_specs=(spec((br, w)),) * nplanes,
            out_shape=(jax.ShapeDtypeStruct((b, br, w), jnp.int32),)
            * nplanes,
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(d, *[planes[j] for j in grp])
        for slot, j in enumerate(grp):
            if outs[j] is None:
                outs[j] = routed[slot]
    return outs


def _make_stage_b_kernel(w, br, k_cap, out_rows):
    nbits_b = max(1, (br * 4 * w - 1).bit_length())

    def kernel(pm_ref, k0_ref, k1_ref, k2_ref, k3_ref,
               key_ref, pack2_ref, cnt_ref):
        # ---- expand 4 dirs as SUBLANE blocks (dir-major), thin, route
        # The candidate plane is (4*BR, W): block d holds direction d's
        # candidates for all stage-A slots — the same dir-major
        # enumeration as the XLA path's (B, 4, P) stacking. BR is
        # clamped so 4*BR*W stays routable (see _ROUTE_MAX_ELEMS).
        pmb = pm_ref[0]
        keys = [k0_ref[0], k1_ref[0], k2_ref[0], k3_ref[0]]
        ppb = (pmb >> 8) & ((1 << 22) - 1)            # (py<<11)|px
        base = ((ppb >> 11) << 14) | ((ppb & 0x7FF) << 3)
        cand_l = []
        for d in range(4):
            okd = (pmb >= 0) & (((pmb >> d) & 1) == 1)
            g = (pmb >> (4 + d)) & 1
            cand_l.append(jnp.where(okd, base | (g << 2) | d, -1))
        cand = jnp.concatenate(cand_l, axis=0)        # (4*BR, W)
        ckey = jnp.concatenate(keys, axis=0)
        keep_b, tgt_b, kept_b = _thin_targets(cand >= 0, k_cap)
        cand = jnp.where(keep_b, cand, -1)
        rows_b = jax.lax.broadcasted_iota(jnp.int32, (4 * br, w), 0)
        cols_b = jax.lax.broadcasted_iota(jnp.int32, (4 * br, w), 1)
        d_b = jnp.where(keep_b, rows_b * w + cols_b - tgt_b, 0)
        pgd, key = _route([cand, ckey], d_b, nbits_b)

        # ---- finish: pack2/key words for the first out_rows rows -----
        pgd_o = pgd[:out_rows, :]
        key_o = key[:out_rows, :]
        okq = pgd_o >= 0
        dirk = pgd_o & 3
        g = 2 * ((pgd_o >> 2) & 1) - 1
        px = (pgd_o >> 3) & 0x7FF
        py = pgd_o >> 14
        dxs = ((dirk == 0) | (dirk == 3)).astype(jnp.int32) \
            - (dirk == 2).astype(jnp.int32)
        dys = (dirk >= 1).astype(jnp.int32)
        x2 = 2 * px + dxs
        y2 = 2 * py + dys
        pack2 = (x2 << 15) | (y2 << 4) | ((dxs * g + 1) << 2) | (dys * g + 1)
        key_ref[0] = jnp.where(okq, key_o, KEY_INVALID)
        pack2_ref[0] = jnp.where(okq, pack2, 0)
        cnt_ref[0, 0, 0] = kept_b

    return kernel


@functools.partial(jax.jit, static_argnames=("p_cap", "k_cap",
                                             "interpret"))
def boundary_compact(threshim: jnp.ndarray, ranks: jnp.ndarray,
                     p_cap: int, k_cap: int, interpret: bool = False):
    """(B, H, W) threshold + rank planes -> ((B, OUT_ROWS*4W) key/pack2
    point words, counts (B,)). OUT_ROWS*4W >= k_cap slots; at most
    k_cap - 2 are valid (uniform thinning), compacted densely to the
    front. Kept set, counts AND slot order are bit-identical to
    quadfit.boundary_points (the XLA path enumerates stage-B candidates
    in the same (row, dir, col) order)."""
    b, h, w = threshim.shape
    assert h % 8 == 0 and w % 128 == 0, (h, w)
    br = boundary_block_rows(p_cap, w)
    out_rows = -(-(-(-k_cap // w)) // 8) * 8
    out_rows = min(out_rows, 4 * br)
    spec = lambda sh: pl.BlockSpec((1,) + sh,  # noqa: E731
                                   lambda i: (i,) + (0,) * len(sh),
                                   memory_space=pltpu.VMEM)
    # Hybrid split sized for the Mosaic compile helper (measured r3: the
    # one-kernel stage A — bits + thin + 5-plane routing — crashes it
    # consistently, while the <=3-routed-plane kernels and stage B
    # compile reliably): the stage-A plane build runs XLA-side (fused
    # elementwise + one MXU cumsum, no sorts), the pixel compaction runs
    # as TWO 3-plane routing kernels, and stage B (candidate expansion +
    # point routing) stays one kernel.
    pm, d_a, keys = boundary_planes_xla(threshim, ranks, br)
    planes = route_planes(d_a, [pm] + keys, br, interpret=interpret)
    key, pack2, cnt = pl.pallas_call(
        _make_stage_b_kernel(w, br, k_cap, out_rows),
        grid=(b,),
        in_specs=[spec((br, w))] * 5,
        out_specs=(spec((out_rows, w)), spec((out_rows, w)),
                   pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, out_rows, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, out_rows, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, 1, 1), jnp.int32)),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*planes)
    kw = out_rows * w
    return key.reshape(b, kw), pack2.reshape(b, kw), cnt[:, 0, 0]


# Mosaic's dynamic-rotate lowering (the routing flat-roll) only compiles
# for planes up to ~320k int32 elements (bisected on v5e: 307,200 OK at
# both (120, 2560) and (240, 1280); 325k+ crashes the compile helper).
# The stage-B candidate plane is (BR, 4W), so BR is clamped to fit.
_ROUTE_MAX_ELEMS = 307_200


def boundary_block_rows(p_cap: int, w: int) -> int:
    """Stage-A pixel rows (8-aligned) for a given pixel cap: both the
    kernel and the XLA path cap stage A at boundary_block_rows(p)*w
    pixels so their stage-B candidate enumerations line up exactly.
    Clamped so the (BR, 4W) stage-B plane stays routable (see
    _ROUTE_MAX_ELEMS); at W = 640 this caps emitting pixels at 76,800 —
    each emits 1-4 boundary points (~2 avg), so a saturated scene still
    overfills the 131k point budget before this cap binds recall."""
    rows = -(-(-(-p_cap // w)) // 8) * 8
    return min(rows, (_ROUTE_MAX_ELEMS // (4 * w)) // 8 * 8)


def frontend(threshim: jnp.ndarray, max_points: int,
             max_boundary_pixels: int, split_u8: bool = False,
             interpret: bool = False):
    """Full fused frontend: threshold image -> ({key, pack2} (B, K')
    with K' = out_rows*4W >= max_points, counts (B,)). Valid points are
    densely compacted to the front, in the same slot order as the XLA
    path. split_u8 moves the rank plane over HBM as two u8 planes (the
    reassembly shift+or fuses into boundary_planes_xla) — chip-parity
    True but a measured TIE at (8, 400, 640) (5.25 vs 5.27 ms/frame,
    scripts/mb_split8.py): the rank kernel's fixed cost is grid/dispatch,
    not the output write. Default off."""
    if split_u8:
        rhi, rlo = rank_image(threshim, split_u8=True, interpret=interpret)
        ranks = (rhi.astype(jnp.int32) << 8) | rlo.astype(jnp.int32)
    else:
        ranks = rank_image(threshim, interpret=interpret)
    key, pack2, counts = boundary_compact(
        threshim, ranks, max_boundary_pixels, max_points,
        interpret=interpret)
    return {"key": key, "pack2": pack2}, counts
