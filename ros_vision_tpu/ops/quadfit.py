"""Boundary extraction + quad fitting on TPU (fixed shapes, jittable).

TPU-native re-expression of the reference's data-dependent GPU middle
pipeline (apriltag_gpu.cu:776-1097 + line_fit_filter.cu): the cub
select/sort/reduce/scan chains become masked compaction, `lax.sort`,
segment reductions and a segmented associative scan; the DoFitLines /
DoFitQuads kernels become dense batched linear algebra over a
(segments, 45 pairs) / (segments, 210 combos) layout that maps naturally
onto the TPU vector units. Unlike the reference — which syncs 4 counters to
the host mid-pipeline (apriltag_gpu.cu:806,938,1016,1073) — this pipeline is
fully fixed-shape and runs to completion on device in one jit.

Numerical scheme: all moment math is f32 with per-segment coordinate
centering and 1/256-scaled gradient weights; both transformations leave the
fitted lines, errors and MSEs mathematically invariant while keeping f32
magnitudes small (the reference gets the equivalent safety from integer
fixed-point accumulators).

Algorithm parameters mirror apriltag-3 / the frc971 pipeline:
min blob 25 px, min cluster 24 points, window ksz = min(20, sz/12), 7-tap
unnormalized Gaussian smoothing, <=10 maxima, C(10,4) = 210 exhaustive quad
combinations, max_line_fit_mse = 10, cos(critical angle) = cos(10 deg).
"""
from __future__ import annotations

import dataclasses
import functools
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ros_vision_tpu.ops import scan
from ros_vision_tpu.ops import segments as segs

MIN_BLOB_PIXELS = 25
MIN_CLUSTER_POINTS = 24
# segment size past which windowed-err moments switch to the block-local
# (conditioning-stable) formulation — see _errs_stable in cluster_and_fit
ERRS_STABLE_MIN_SZ = 2048
MAX_NMAXIMA = 10
MAX_LINE_FIT_MSE = 10.0
COS_CRITICAL_RAD = math.cos(10 * math.pi / 180)
WEIGHT_SCALE = 1.0 / 256.0
N_PAIRS = 45
N_COMBOS = 210

_BIGI = np.int32(2 ** 30)   # np scalar: a jnp constant would force backend
# initialization at import time (the axon relay may be unreachable) and
# bake a device buffer into the module

# static tables: pair index for (a < b) slot pairs; combos in the reference's
# lexicographic enumeration order (m0 outermost — argmin tie-breaking then
# matches the sequential search)
_PAIR_IDX = np.full((MAX_NMAXIMA, MAX_NMAXIMA), -1, np.int32)
for _i, (_a, _b) in enumerate(itertools.combinations(range(MAX_NMAXIMA), 2)):
    _PAIR_IDX[_a, _b] = _i
_COMBOS = np.array(list(itertools.combinations(range(MAX_NMAXIMA), 4)),
                   np.int32)  # (210, 4)
_COMBO_PAIRS = np.stack([
    _PAIR_IDX[_COMBOS[:, 0], _COMBOS[:, 1]],
    _PAIR_IDX[_COMBOS[:, 1], _COMBOS[:, 2]],
    _PAIR_IDX[_COMBOS[:, 2], _COMBOS[:, 3]],
    _PAIR_IDX[_COMBOS[:, 0], _COMBOS[:, 3]],   # edge 3->0 uses the reverse fit
], axis=1)  # (210, 4)


@dataclasses.dataclass(frozen=True)
class QuadFitConfig:
    max_points: int = 131072     # K: boundary points kept per frame
    max_segments: int = 1024     # NSEG: blob-pair clusters per frame
    max_quads: int = 128         # NQ: quads emitted per frame
    tag_width: int = 4           # min tag width in decimated px (8/2 for 36h11)
    normal_border: bool = True
    reversed_border: bool = False
    use_pallas_sort: bool = False   # VMEM bitonic network for the three
    # (B, K) sorts in cluster_and_fit (ops/sort_pallas.py) instead of
    # lax.sort. Same outputs (all operands are keys, so the network's
    # instability is unobservable); resolved by TPUDetector via a probe
    # compile like use_fused_frontend.
    route_compaction: bool = False  # pure-XLA monotone routing
    # (segments.compact_route) for boundary_points' two stream
    # compactions instead of lax.sort — bit-identical outputs; serves
    # frames the Pallas boundary kernels can't take (non-128-multiple
    # lane width, e.g. 1080p) and the helper-crash fallback.

    @property
    def max_boundary_pixels(self) -> int:
        """First-stage compaction cap: pixels that emit any boundary point
        (each such pixel emits 1-4 points; ~2 on average)."""
        return (3 * self.max_points) // 4


# bit-packing layout (the reference packs the same fields into 64-bit
# QuadBoundaryPoint / IndexPoint words, points.h:25-161; with dense
# <=2048 blob ranks we fit the pair key and the coordinate payload in one
# int32 each)
RANK_BITS = 11                   # 2048 blobs (points.h:171 kMaxBlobs)
KEY_INVALID = np.int32(1 << (2 * RANK_BITS))


def pack_payload(x2, y2, gx, gy):
    """x-major point payload: sorting by it within a blob-pair key yields
    xmin/xmax as the first/last element of each segment."""
    return (x2 << 15) | (y2 << 4) | ((gx + 1) << 2) | (gy + 1)


def unpack_payload(p):
    return p >> 15, (p >> 4) & 0x7FF, ((p >> 2) & 0x3) - 1, (p & 0x3) - 1


def fit_line_f32(m, n):
    """Vectorized fit_line from window moments m[..., 6] =
    [Mx, My, Mxx, Mxy, Myy, W] and point count n. Returns dict with
    ex, ey, nx, ny (line normal), err, mse."""
    w = m[..., 5]
    w = jnp.where(w == 0, 1e-12, w)
    ex = m[..., 0] / w
    ey = m[..., 1] / w
    cxx = m[..., 2] / w - ex * ex
    cxy = m[..., 3] / w - ex * ey
    cyy = m[..., 4] / w - ey * ey
    theta = 0.5 * jnp.arctan2(-2 * cxy, cyy - cxx)
    nx = jnp.cos(theta)
    ny = jnp.sin(theta)
    mse = nx * nx * cxx + 2 * nx * ny * cxy + ny * ny * cyy
    return {"ex": ex, "ey": ey, "nx": nx, "ny": ny,
            "err": n * mse, "mse": mse}


_DIRS = ((1, 0), (0, 1), (-1, 1), (1, 1))


def boundary_masks(threshim, ranks_img):
    """Per-pixel candidate maskbits + per-direction blob-pair key images.

    maskbits (B, H, W) int32: bit d = direction d emits a point, bit 4+d =
    its gradient sign is +. keyimg (B, 4, H, W) int32: the blob-pair key
    per direction (dir-major channel layout — the stage-B candidate order).
    Role of the BlobDiff kernel's per-pixel tests (apriltag_gpu.cu:226-360).
    """
    b, h, w = threshim.shape
    v = threshim.astype(jnp.int32)
    big = ranks_img > 0
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    interior = ((xs >= 1) & (xs <= w - 2))[None, None, :] & \
        ((ys >= 1) & (ys <= h - 2))[None, :, None]
    maskbits = jnp.zeros((b, h, w), jnp.int32)
    keych = []
    for d, (dx, dy) in enumerate(_DIRS):
        nv = jnp.roll(v, (-dy, -dx), axis=(1, 2))
        nbig = jnp.roll(big, (-dy, -dx), axis=(1, 2))
        nr = jnp.roll(ranks_img, (-dy, -dx), axis=(1, 2))
        ok = interior & ((v + nv) == 255) & big & nbig
        gpos = nv > v                                   # +1 gradient sign
        maskbits = maskbits | (ok.astype(jnp.int32) << d) \
            | ((ok & gpos).astype(jnp.int32) << (4 + d))
        lo = jnp.minimum(ranks_img, nr) - 1
        hi = jnp.maximum(ranks_img, nr) - 1
        keych.append(jnp.where(ok & (lo >= 0), (lo << RANK_BITS) | hi,
                               KEY_INVALID))
    return maskbits, jnp.stack(keych, axis=1)


def finish_points(pgd, key, w):
    """(pgd, key) point words -> the {key, pack2} dict cluster_and_fit
    consumes. pgd packs (py << 14) | (px << 3) | (g << 2) | dir; -1 =
    empty slot."""
    valid = pgd >= 0
    dirk = pgd & 3
    g = 2 * ((pgd >> 2) & 1) - 1                        # {0,1} -> {-1,+1}
    px = (pgd >> 3) & 0x7FF
    py = pgd >> 14
    dxs = jnp.asarray([d[0] for d in _DIRS], jnp.int32)[dirk]
    dys = jnp.asarray([d[1] for d in _DIRS], jnp.int32)[dirk]
    x2 = 2 * px + dxs
    y2 = 2 * py + dys
    key = jnp.where(valid, key, KEY_INVALID)
    pack2 = pack_payload(x2, y2, dxs * g, dys * g)
    return {"key": key, "pack2": jnp.where(valid, pack2, 0)}


def boundary_points(threshim, ranks, cfg: QuadFitConfig):
    """Emit black/white blob-pair boundary points and compact to K slots.

    Equivalent of the BlobDiff kernel + nonzero compaction
    (apriltag_gpu.cu:226-360, 788-802). Coordinates are in double-resolution
    decimated units: x = 2*px + dx, y = 2*py + dy. `ranks` (B, H*W) are the
    dense big-blob ids from ops.ccl (0 = blob below MIN_BLOB_PIXELS).

    Two-stage compaction sized for TPU scatter costs (which scale with the
    index-array length): stage A compacts the (B, H*W) pixel set down to
    pixels that emit anything (payload: pixel coords + per-direction
    validity and gradient-sign bits in one int32); stage B expands 4
    directions per kept pixel (dir-major) and compacts to K (pixel, grad,
    dir) words. Overflow at either cap is handled by uniform stream
    thinning (segs.thin_uniform) — evenly spread drops, the same policy
    (and bit-identical f32 selection math) as the fused Pallas frontend
    kernel (ops/frontend_pallas.py).

    Returns (dict(key, pack2) of (B, K) int32, counts (B,)).
      key   = (lo_rank-1) << 11 | (hi_rank-1)  (blob-pair identity)
      pack2 = x-major payload (pack_payload)
    """
    from ros_vision_tpu.ops.frontend_pallas import boundary_block_rows
    b, h, w = threshim.shape
    n = h * w
    k = cfg.max_points
    assert 2 * w < 2048 and 2 * h < 2048, \
        "image too large for 11-bit coords (w*h < 2^22, apriltag_gpu.cu:774)"
    rimg = ranks.reshape(b, h, w)
    maskbits, keyimg = boundary_masks(threshim, rimg)
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    pxy = ((ys[:, None] << 11) | xs[None, :]) + jnp.zeros((b, h, w),
                                                          jnp.int32)

    # ---- stage A: compact pixels that emit any point (uniform-thinned) --
    # cap = whole pixel rows (boundary_block_rows) so the stage-B
    # candidate enumeration matches the fused kernel's exactly
    br = boundary_block_rows(cfg.max_boundary_pixels, w)
    p_cap = br * w
    valid_a = (maskbits & 0xF).reshape(b, n) != 0
    keep_a, tgt_a = segs.thin_uniform(valid_a, p_cap)
    # pm = (py<<11|px)<<8 | maskbits is strictly increasing over pixels,
    # so stage-A compaction is a keys-only sort (no payload word) — or
    # the sort-free monotone routing chain when route_compaction is on
    pm_vals = ((pxy << 8) | maskbits).reshape(b, n)
    if cfg.route_compaction:
        pm = segs.compact_route(keep_a, tgt_a, {"pm": pm_vals}, p_cap,
                                {"pm": jnp.int32(-1)})[0]["pm"]
    else:
        pm, _ = segs.compact_monotone(keep_a, pm_vals, p_cap,
                                      jnp.int32(-1))
    pvalid = pm >= 0
    pix = jnp.where(pvalid, ((pm >> 19) & 0x7FF) * w + ((pm >> 8) & 0x7FF),
                    0)

    # ---- stage B: expand 4 directions per pixel (dir-major), thin to K --
    # payloads: pgd = py << 14 | px << 3 | g << 2 | dir, plus the
    # blob-pair key slice-gathered at the compacted pixels (dir-major
    # channel layout keeps the gather transpose-free); the fused kernel
    # mirrors this enumeration with sublane-stacked dir blocks
    dvalid = jnp.stack([pvalid & (((pm >> d) & 1) > 0) for d in range(4)],
                       axis=1)                           # (B, 4, P)
    gbits = jnp.stack([(pm >> (4 + d)) & 1 for d in range(4)], axis=1)
    pp = (pm >> 8) & ((1 << 22) - 1)                     # (py<<11)|px
    cand = (jnp.broadcast_to(((pp >> 11) << 14 | (pp & 0x7FF) << 3)
                             [:, None, :], (b, 4, p_cap))
            | (gbits << 2) | jnp.arange(4, dtype=jnp.int32)[None, :, None])
    keyp = jnp.take_along_axis(keyimg.reshape(b, 4, n),
                               pix[:, None, :], axis=2)  # (B, 4, P)
    keep_b, tgt_b = segs.thin_uniform(dvalid.reshape(b, -1), k)
    payload = {"pgd": cand.reshape(b, -1), "key": keyp.reshape(b, -1)}
    fills = {"pgd": jnp.int32(-1), "key": jnp.int32(KEY_INVALID)}
    if cfg.route_compaction:
        pts, counts = segs.compact_route(keep_b, tgt_b, payload, k, fills)
    else:
        pts, counts = segs.compact(keep_b, payload, k, fills)
    return finish_points(pts["pgd"], pts["key"], w), counts


def _make_sorters(cfg: QuadFitConfig):
    """(sort1, sort2, sort3) over (B, K) int32 rows: lax.sort, or the
    Pallas bitonic network when cfg.use_pallas_sort (bit-identical here —
    every operand is a key, so ties mean identical tuples)."""
    if cfg.use_pallas_sort:
        from ros_vision_tpu.ops.sort_pallas import sort_tpu
        interp = jax.default_backend() not in ("tpu", "axon")
        return (lambda a: sort_tpu([a], num_keys=1, interpret=interp)[0],
                lambda a, b: sort_tpu([a, b], num_keys=2,
                                      interpret=interp),
                lambda a, b, c: sort_tpu([a, b, c], num_keys=3,
                                         interpret=interp))
    return (lambda a: jax.lax.sort([a], dimension=1, num_keys=1)[0],
            lambda a, b: jax.lax.sort([a, b], dimension=1, num_keys=2,
                                      is_stable=True),
            lambda a, b, c: jax.lax.sort([a, b, c], dimension=1,
                                         num_keys=3, is_stable=True))


def cluster_and_fit(pts: dict, decim: jnp.ndarray, cfg: QuadFitConfig,
                    _debug_stop: str | None = None):
    """From compacted boundary points to quad corners.

    _debug_stop: perf-instrumentation cut point ('sort1', 'tables',
    'theta', 'moments', 'errs', 'smooth', 'peaks', 'combos') — returns a
    partial dict early; None = full run.

    Returns dict with corners (B, NQ, 4, 2) in decimated pixel coords,
    quad_valid (B, NQ), n_quads (B,), plus stage taps.

    TPU cost model (measured on v5e): gathers/scatters/segment-reductions
    cost ~0.7-1.2 ms per 131k-index op while elementwise ops and MXU cumsums
    are ~free, so per-segment values are kept in (B, NSEG1) tables built with
    ONE scatter each and broadcast back with ONE combined multi-channel
    slice-gather per phase; per-segment sums come from prefix-sum differences
    at segment boundary indices (NSEG-sized gathers) instead of segment_sum.
    """
    from ros_vision_tpu.ops import gather_pallas as gp
    b, k = pts["key"].shape
    nseg = cfg.max_segments
    nseg1 = nseg + 1
    i_global = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (b, k))
    sort1, sort2, sort3 = _make_sorters(cfg)

    # ---- sort by (blob-pair key, x-major payload): segment ids + exact
    #      xmin/xmax for free (first/last element of each segment) ---------
    key_s, pack2 = sort2(pts["key"], pts["pack2"])
    x2, y2, gx, gy = unpack_payload(pack2)
    valid_pt = key_s < KEY_INVALID
    seg = segs.segment_ids_from_sorted_keys(key_s, valid=valid_pt,
                                            max_segments=nseg)
    if _debug_stop == "sort1":
        return {"seg": seg, "x2": x2, "y2": y2}

    # segment size/extent tables (role of the cub ReduceByKey extents pass,
    # apriltag_gpu.cu:829-862). Segment ids are sorted, so sizes come from
    # the one-hot MXU histogram and starts/ends from its exclusive cumsum —
    # no table scatters. ymin/ymax come from ONE extra single-key sort by
    # (seg, y): sorts are ~4x cheaper than table scatter-min/max here.
    from ros_vision_tpu.ops.scan import cumsum_mxu
    count = gp.histogram(seg, nseg1)                       # (B, NSEG1)
    countf = count.astype(jnp.float32)
    start_tab = (cumsum_mxu(countf) - countf).astype(jnp.int32)
    end_tab = start_tab + count - 1                        # empty: start-1

    xmin = segs.take1(x2, jnp.clip(start_tab, 0, k - 1))
    xmax = segs.take1(x2, jnp.clip(end_tab, 0, k - 1))
    # y extents from one extra single-key sort. (A gather_pallas
    # one-hot masked segment min/max was tried in round 3 and measured
    # 4.5x SLOWER on chip — 1.5 vs 0.33 ms/frame at K=131k: the
    # (K, NSEG) select+min sweep does ~134M VPU ops/frame while the
    # radix sort is bandwidth-bound. Kernel kept in gather_pallas for
    # smaller-K callers.)
    ykey = sort1(jnp.where(valid_pt, seg, nseg) << 11 | y2)
    ymin = segs.take1(ykey, jnp.clip(start_tab, 0, k - 1)) & 0x7FF
    ymax = segs.take1(ykey, jnp.clip(end_tab, 0, k - 1)) & 0x7FF
    cx = (xmin + xmax).astype(jnp.float32) * 0.5 + 0.05118
    cy = (ymin + ymax).astype(jnp.float32) * 0.5 - 0.028581

    # broadcast per-segment constants [start, count, cx, cy] to points in
    # ONE 4-channel slice-gather (monotone table gathers beat the one-hot
    # MXU formulation here — 0.53 vs 1.40 ms/frame measured,
    # ops/gather_pallas.py docstring). Gathered BEFORE the theta sort and
    # reused after it: the theta sort permutes points only WITHIN their
    # segment, so every slot keeps its segment and these per-segment
    # values — the post-sort re-gather the round-3 code did was a
    # duplicate (chip profile: 3.7 ms/call for the (B, K, 4) gather).
    ptab = jnp.stack([start_tab.astype(jnp.float32),
                      count.astype(jnp.float32), cx, cy], axis=-1)
    pbc = segs.take1(ptab, seg)
    fx2 = x2.astype(jnp.float32)
    fy2 = y2.astype(jnp.float32)
    dxp = fx2 - pbc[..., 2]
    dyp = fy2 - pbc[..., 3]

    # border-orientation dot product: per-segment sum via prefix-sum
    # differences at segment ends (exact enough in f32: terms are centered)
    dterm = jnp.where(valid_pt, dxp * gx + dyp * gy, 0.0)
    dcum = scan.cumsum_mxu(dterm)
    dot = (segs.take1(dcum, jnp.clip(end_tab, 0, k - 1))
           - jnp.where(start_tab > 0,
                       segs.take1(dcum, jnp.clip(start_tab - 1, 0, k - 1)),
                       0.0))

    h2, w2 = decim.shape[1], decim.shape[2]
    max_perimeter = 3 * (2 * w2 + 2 * h2)
    bbox_ok = ((xmax - xmin) * (ymax - ymin)) >= cfg.tag_width
    border_ok = jnp.full_like(bbox_ok, False)
    if cfg.normal_border:
        border_ok = border_ok | (dot >= 0)
    if cfg.reversed_border:
        border_ok = border_ok | (dot < 0)
    seg_ok = ((count >= MIN_CLUSTER_POINTS) & (count <= max_perimeter)
              & bbox_ok & border_ok)
    seg_ok = seg_ok.at[:, nseg].set(False)
    if _debug_stop == "tables":
        return {"seg_ok": seg_ok, "count": count}

    # ---- theta sort within segments (AddThetaToIndexPoint + radix sort,
    #      apriltag_gpu.cu:396-412, 944-956). One packed int32 key:
    #      seg (11 bits) << 20 | theta fixed-point (20 bits) — the same
    #      fixed-point-angle radix-sort trick as the reference's IndexPoint
    #      (points.h:169-279, 28-bit theta; 20 bits = 6e-6 rad resolution,
    #      far below boundary-point angular spacing). Segments failing the
    #      filters are NOT remapped here — they sort and fit like any other
    #      (slots are fixed either way) and seg_ok masks them at the end. --
    theta = jnp.arctan2(dyp, dxp)
    theta_fx = jnp.clip(((theta + math.pi) * (2 ** 20 / (2 * math.pi)))
                        .astype(jnp.int32), 0, 2 ** 20 - 1)
    sort_key = (jnp.where(valid_pt, seg, nseg) << 20) | theta_fx
    pack3 = (x2 << 11) | y2
    sort_key_s, pack3 = sort2(sort_key, pack3)
    seg = sort_key_s >> 20
    x2 = pack3 >> 11
    y2 = pack3 & 0x7FF
    valid_pt = seg < nseg

    # segment starts/counts/centers are order-invariant AND slot-invariant
    # under the within-segment theta sort, so the pre-sort `pbc` broadcast
    # is still exact here — no re-gather
    start_tab2 = start_tab
    start = pbc[..., 0].astype(jnp.int32)
    sz_pt = pbc[..., 1].astype(jnp.int32)
    pos = i_global - start
    if _debug_stop == "theta":
        return {"seg_ok": seg_ok, "count": count, "pos": pos}

    # ---- line-fit moments, segmented prefix sums ------------------------
    # decimated-pixel coords with apriltag's +0.5 center convention
    px = x2.astype(jnp.float32) * 0.5 + 0.5
    py = y2.astype(jnp.float32) * 0.5 + 0.5
    # per-segment centering for f32 conditioning (translation-invariant)
    ccx = pbc[..., 2] * 0.5 + 0.5
    ccy = pbc[..., 3] * 0.5 + 0.5
    xc = px - ccx
    yc = py - ccy
    ix = (px).astype(jnp.int32)
    iy = (py).astype(jnp.int32)
    inb = (ix > 0) & (ix + 1 < w2) & (iy > 0) & (iy + 1 < h2)
    ixc = jnp.clip(ix, 1, w2 - 2)
    iyc = jnp.clip(iy, 1, h2 - 2)

    # gradient magnitude weights: pack BOTH gradient channels into ONE
    # int32 plane ((gx+255) << 10 | (gy+255) — each in [0, 510], exact)
    # and fetch with ONE single-channel gather: half the materialized
    # plane bytes and half the gather output vs the former f32 2-channel
    # gstack, with bit-identical unpacked values (gradients are small
    # integers, exact in both forms). (Folding sqrt(gx^2+gy^2) into the
    # image for a 1-channel f32 gather was measured SLOWER — 8.84 vs
    # 8.68 ms/frame cluster total at K=65536: a fresh f32 magnitude
    # plane is not exact-packable. Batching the three pref_at gathers
    # into one concatenated-index gather was worse still, +0.7 ms/frame.)
    dint = decim.astype(jnp.int32)
    gxi = jnp.pad(dint[:, :, 2:] - dint[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    gyi = jnp.pad(dint[:, 2:, :] - dint[:, :-2, :], ((0, 0), (1, 1), (0, 0)))
    gplane = (((gxi + 255) << 10) | (gyi + 255)).reshape(b, -1)
    gpt = segs.take1(gplane, iyc * w2 + ixc)
    gimx = ((gpt >> 10) - 255).astype(jnp.float32)
    gimy = ((gpt & 1023) - 255).astype(jnp.float32)
    wgt = jnp.where(inb, jnp.sqrt(gimx * gimx + gimy * gimy) + 1.0, 1.0)
    wgt = wgt * WEIGHT_SCALE
    wgt = jnp.where(valid_pt, wgt, 0.0)
    mom = jnp.stack([wgt * xc, wgt * yc, wgt * xc * xc, wgt * xc * yc,
                     wgt * yc * yc, wgt], axis=-1)  # (B, K, 6)
    pref = scan.segmented_cumsum_from_starts(mom, start)
    # materialize pref ONCE: without the barrier XLA fuses the
    # (cum - base) epilogue into every downstream windowed gather and
    # re-runs the (B, K, 6) base gather per consumer — the chip profile
    # showed the same scan.py:90 gather 4x at 3.7 ms/call each
    pref = jax.lax.optimization_barrier(pref)
    if _debug_stop == "moments":
        return {"seg_ok": seg_ok, "count": count, "pref": pref,
                "start": start, "pos": pos, "sz_pt": sz_pt}

    # helpers: prefix lookup by position within this point's segment
    # (a single concatenated-index gather for the three lookups was
    # measured SLOWER on v5e — +0.7 ms/frame at K=65536: the (B, 3K)
    # index/output materialization beats three fusable gathers)
    def pref_at(position, nonneg=False):
        """Inclusive prefix at segment-relative position (clamped >= 0);
        returns 0 for position < 0 (nonneg=True skips that select when the
        caller guarantees position >= 0)."""
        posc = jnp.clip(position, 0, k - 1)
        gathered = segs.take1(pref, jnp.clip(start + posc, 0, k - 1))
        if nonneg:
            return gathered
        return jnp.where((position >= 0)[..., None], gathered, 0.0)

    total = pref_at(sz_pt - 1, nonneg=True)

    def window_moments(a, bpos):
        """Circular window [a..bpos] within segment (positions mod sz).

        Wrap algebra: m_wrap = total - (P(a-1) - P(b)) = m_direct + total,
        so ONE (B, K, 6) select on `total` replaces selecting between two
        full window-moment intermediates (measured -0.5 ms/frame at
        K=65536 B=8 on the relay v5e; f32 rounding order changes within
        the documented errs-noise envelope)."""
        am = jnp.where(a < 0, a + sz_pt, a)
        bm = jnp.where(bpos >= sz_pt, bpos - sz_pt, bpos)
        direct = am <= bm
        mwin = (pref_at(bm, nonneg=True) - pref_at(am - 1)
                + jnp.where(direct[..., None], 0.0, total))
        n = jnp.where(direct, bm - am + 1, sz_pt - am + bm + 1)
        return mwin, n.astype(jnp.float32)

    # ---- windowed errors (DoFitLines, line_fit_filter.cu:340-592) -------
    ksz = jnp.minimum(20, sz_pt // 12)
    fit_ok_pt = valid_pt & (ksz >= 2)

    def _errs_fast():
        mwin, nwin = window_moments(pos - ksz, pos + ksz)
        return fit_line_f32(mwin, nwin)["err"]

    def _errs_stable():
        """Block-local windowed moments for GIANT segments.

        The fast path subtracts two segment-prefix values whose f32 ulp
        grows with segment length x coordinate spread: measured on a
        1120-px-edge tag (6960-point segment), mid-edge err came out
        ~190 vs the f64 truth 2.9 — above the ~80 corner signal, so the
        top-10 peaks all landed mid-edge and the quad was lost (the
        reference's integer fixed-point accumulators are exact here,
        points.h:169-279). This path re-forms every window from
        OVERLAPPED-block inclusive prefixes (scan.overlapped_cumsum):
        each block's prefix restarts ov=40 elements before the block, so
        any window (<= 41 points, ksz <= 20) lies inside one overlapped
        block and every subtraction cancels values bounded by its
        content — the rounding no longer scales with segment size, and
        each range costs 2 gathers with no cross-block totals term (the
        previous blocked_cumsum_parts formulation cost 3 + selects; the
        full branch measured 10.00 vs 9.01 ms/frame stock-vs-fast-forced
        in-detector at B=8 K=32768 on the relay, scripts/mb_errsgate)."""
        opref, blk, ov = scan.overlapped_cumsum(mom)
        bw = blk + ov

        def lrs(g0, g1, live):
            """Sum of mom over GLOBAL index range [g0..g1] (g0 <= g1,
            span <= ov); `live` masks empty/invalid ranges."""
            g0c = jnp.clip(g0, 0, k - 1)
            g1c = jnp.clip(g1, 0, k - 1)
            j = g1c // blk
            base = j * bw - j * blk + ov        # loc(g) = base + g
            hi = segs.take1(opref, base + g1c)
            lo_pos = base + g0c - 1
            lo = jnp.where((g0c - 1 >= j * blk - ov)[..., None],
                           segs.take1(opref, jnp.maximum(lo_pos, 0)), 0.0)
            return jnp.where(live[..., None], hi - lo, 0.0)

        a = pos - ksz
        bp = pos + ksz
        wrap_lo = a < 0
        wrap_hi = bp >= sz_pt
        p1a = start + jnp.maximum(a, 0)
        p1b = start + jnp.minimum(bp, sz_pt - 1)
        p2a = jnp.where(wrap_lo, start + sz_pt + a, start)
        p2b = jnp.where(wrap_lo, start + sz_pt - 1, start + bp - sz_pt)
        mwin = (lrs(p1a, p1b, fit_ok_pt)
                + lrs(p2a, p2b, fit_ok_pt & (wrap_lo | wrap_hi)))
        nwin = (2 * ksz + 1).astype(jnp.float32)
        return fit_line_f32(mwin, nwin)["err"]

    # giant segments (> 2048 points ~ >330 decimated-px edges) are where
    # the fast path's rounding passes ~1/3 of the corner signal; they
    # only occur on near-frame-filling tags, so typical scenes never pay
    # the stable path's extra gathers. Gate on SCREENED segments only
    # (count/bbox/border filters): giant segments that fail seg_ok have
    # their errs masked out of the peak search anyway, and saturating
    # noise scenes (the bench scene's percolating background pairs)
    # otherwise trip the stable branch every frame — measured +~2.5 vs
    # +0.9 ms/frame at the wide K=32768 B=8 errs stage (mb_cluster r5).
    sz_screened = jnp.where(seg_ok, count, 0)
    errs = jax.lax.cond(
        jnp.max(sz_screened) > ERRS_STABLE_MIN_SZ,
        _errs_stable, _errs_fast)
    errs = jnp.where(fit_ok_pt, errs, 0.0)
    if _debug_stop == "errs":
        return {"seg_ok": seg_ok, "count": count, "errs": errs}

    # 7-tap circular gaussian smoothing (FilterCoefficients,
    # line_fit_filter.h:122-128) + peak detection. Within a segment the
    # circular taps are plain array shifts except within 3 (4 for peaks) of
    # the segment boundary, so: smooth/peak the whole K axis with cheap
    # global rolls, then repair the boundary region exactly via a small
    # (B, NSEG1, 16) table — two ~10k-index gathers/scatters instead of nine
    # 131k-index gathers.
    errs_raw = errs
    smoothed = jnp.zeros_like(errs)
    for j in range(-3, 4):
        f = math.exp(-j * j / 2.0)
        smoothed = smoothed + f * jnp.roll(errs_raw, -j, axis=1)
    nxt = jnp.roll(smoothed, -1, axis=1)
    prv = jnp.roll(smoothed, 1, axis=1)
    is_peak_lin = (smoothed > nxt) & (smoothed > prv)

    # --- boundary repair table: raw errs at positions [0,8) u [sz-8,sz) ---
    fw = 8
    pp = jnp.concatenate([jnp.arange(fw, dtype=jnp.int32),
                          jnp.arange(-fw, 0, dtype=jnp.int32)])
    pos_tab = jnp.where(pp >= 0, pp, count[..., None] + pp)   # (B,NSEG1,16)
    in_seg = (pos_tab >= 0) & (pos_tab < count[..., None])
    gidx = jnp.clip(start_tab2[..., None] + pos_tab, 0, k - 1)
    eraw = jnp.where(in_seg, segs.take1(
        errs_raw, gidx.reshape(b, -1)).reshape(b, nseg1, 2 * fw), 0.0)

    # exact circular smoothing for positions [0,5) u [sz-5,sz): repair
    # only ever applies to segments with count >= 2*fw (the fix_in gate
    # below), and there the circular tap -> table-slot mapping is
    # CONSTANT — fix slot s covers signed position p (s for s < 5,
    # s - 10 from the end otherwise) and tap p+j lands at table slot
    # (p+j) mod 16. The whole 7-tap weighted smoothing is therefore one
    # tiny constant (16, 10) matmul over the eraw table — replacing the
    # previous 70-wide take_along_axis + 7-term unrolled sum (the tap
    # gather alone cost ~0.7 ms/call at B=8 NSEG=1024 on the relay v5e).
    # f32 sum order changes within the documented errs-noise envelope.
    fpos = jnp.concatenate([jnp.arange(5, dtype=jnp.int32),
                            jnp.arange(-5, 0, dtype=jnp.int32)])
    fpos_abs = jnp.where(fpos >= 0, fpos, count[..., None] + fpos)
    nfix = fpos.shape[0]
    wmat = np.zeros((2 * fw, nfix), np.float32)
    for s in range(nfix):
        p = s if s < 5 else s - 10
        for j in range(-3, 4):
            wmat[(p + j) % (2 * fw), s] += math.exp(-j * j / 2.0)
    sm_fix = jnp.einsum("bnt,ts->bns", eraw, jnp.asarray(wmat),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    # peaks from the fixed smoothed values. Table layout
    # [0,1,2,3,4, sz-5,sz-4,sz-3,sz-2,sz-1]: the +1/-1 circular neighbors
    # are in-table for every slot except 4 (needs pos 5) and 5 (needs pos
    # sz-6) — those two positions' global roll results are already exact
    # (their taps don't wrap), so they're excluded from the peak scatter.
    nxt_idx = jnp.asarray([1, 2, 3, 4, 0, 6, 7, 8, 9, 0], jnp.int32)
    prv_idx = jnp.asarray([9, 0, 1, 2, 0, 4, 5, 6, 7, 8], jnp.int32)
    sm_nxt = sm_fix[:, :, nxt_idx]
    sm_prv = sm_fix[:, :, prv_idx]
    pk_fix = (sm_fix > sm_nxt) & (sm_fix > sm_prv)
    pk_slot_ok = jnp.asarray(
        [True, True, True, True, False, False, True, True, True, True])

    # scatter the repaired values back (duplicate positions write equal
    # values; positions 3,4 / sz-5,sz-4 equal the roll result anyway).
    # (A gather formulation — every point pulling its repair slot from a
    # (B, NSEG1*10, 2) table — was measured SLOWER on the relay v5e:
    # +1.37 vs +0.97 ms/frame at K=65536 B=8; the full-width random-index
    # gather costs more than two ~10k-index scatters.)
    fix_in = (fpos_abs >= 0) & (fpos_abs < count[..., None]) & \
        (count[..., None] >= 2 * fw)
    fgidx_all = jnp.clip(start_tab2[..., None] + fpos_abs, 0, k - 1)
    fgidx = jnp.where(fix_in, fgidx_all, k)
    pgidx = jnp.where(fix_in & pk_slot_ok[None, None, :], fgidx_all, k)
    smoothed = jax.vmap(lambda a, ix, v: a.at[ix].set(v))(
        jnp.concatenate([smoothed, jnp.zeros((b, 1), jnp.float32)], 1),
        fgidx.reshape(b, -1), sm_fix.reshape(b, -1))[:, :k]
    is_peak_lin = jax.vmap(lambda a, ix, v: a.at[ix].set(v))(
        jnp.concatenate([is_peak_lin, jnp.zeros((b, 1), jnp.bool_)], 1),
        pgidx.reshape(b, -1), pk_fix.reshape(b, -1))[:, :k]

    errs = jnp.where(fit_ok_pt, smoothed, 0.0)
    is_peak = fit_ok_pt & is_peak_lin
    if _debug_stop == "smooth":
        return {"seg_ok": seg_ok, "count": count, "errs": errs,
                "is_peak": is_peak}

    # ---- top-10 maxima per segment (peak select/sort/extents,
    #      apriltag_gpu.cu:1001-1078). One sort by (segment, -error) with
    #      the point position as payload; per-segment peak counts via the
    #      one-hot MXU histogram, block starts via its cumsum, and every
    #      segment's top-11 (pos, err) via ONE small windowed gather — rank
    #      10 carries the 11th-peak error as the strictly-greater keep
    #      threshold (apriltag semantics). No table scatters. --------------
    peak_seg = jnp.where(is_peak, seg, nseg)
    if cfg.use_pallas_sort:
        # stable-sort-equivalent int formulation: the error's f32 bit
        # pattern is order-isomorphic for nonnegative errors, and pos as
        # a third key reproduces the stable payload order exactly (pos
        # follows i_global within a segment, and cross-segment ties are
        # impossible — the segment id is the primary key)
        errbits = jax.lax.bitcast_convert_type(errs, jnp.int32)
        pseg_s, negb_s, ppos_s = sort3(peak_seg, -errbits, pos)
        perr_s = jax.lax.bitcast_convert_type(-negb_s, jnp.float32)
    else:
        pseg_s, negerr_s, ppos_s = jax.lax.sort(
            [peak_seg, -errs, pos], dimension=1, num_keys=2,
            is_stable=True)
        perr_s = -negerr_s
    pk_count = gp.histogram(peak_seg, nseg1)
    pkf = pk_count.astype(jnp.float32)
    pstart = (cumsum_mxu(pkf) - pkf).astype(jnp.int32)
    r11 = jnp.arange(MAX_NMAXIMA + 1, dtype=jnp.int32)
    win_idx = jnp.clip(pstart[..., None] + r11, 0, k - 1)  # (B, NSEG1, 11)
    src = jnp.stack([ppos_s.astype(jnp.float32), perr_s], -1)
    win = segs.take1(src, win_idx.reshape(b, -1)).reshape(
        b, nseg1, MAX_NMAXIMA + 1, 2)
    in_blk = r11[None, None, :] < pk_count[..., None]
    werr = jnp.where(in_blk, win[..., 1], -jnp.inf)
    thresh = jnp.where(pk_count > MAX_NMAXIMA, werr[..., MAX_NMAXIMA],
                       -jnp.inf)
    # errors are sorted descending within a segment, so the strictly-greater
    # predicate selects a prefix: qual counts AND locates the maxima
    qual = in_blk[..., :MAX_NMAXIMA] & \
        (werr[..., :MAX_NMAXIMA] > thresh[..., None])
    nmax = qual.sum(-1)
    # maxima positions re-sorted ascending (the combo tables assume position
    # order; invalid slots sort to the back and are zeroed under nmax)
    mx = jnp.where(qual, win[..., :MAX_NMAXIMA, 0].astype(jnp.int32), _BIGI)
    maxima = jax.lax.sort([mx], dimension=2, num_keys=1)[0]
    maxima = jnp.where(
        jnp.arange(MAX_NMAXIMA, dtype=jnp.int32)[None, None, :]
        < nmax[..., None], maxima, 0)

    seg_quad_ok = seg_ok & (nmax >= 4)
    if _debug_stop == "peaks":
        return {"seg_ok": seg_quad_ok, "count": count, "maxima": maxima}

    # ---- 45 pair fits + 210 combos (DoFitQuads,
    #      line_fit_filter.cu:1088-1212) ----------------------------------
    seg_starts = start_tab2
    seg_sz = count

    def pref_at_seg(position):
        """(B, NSEG1, Li) segment-relative position -> prefix (…, 6)."""
        posc = jnp.clip(position, 0, k - 1)
        gidx = jnp.clip(seg_starts[..., None] + posc, 0, k - 1)
        flatidx = gidx.reshape(b, -1)
        g = segs.take1(pref, flatidx).reshape(b, nseg1, -1, 6)
        return jnp.where((position >= 0)[..., None], g, 0.0)

    pb = pref_at_seg(maxima)                    # prefix at maxima pos
    pa = pref_at_seg(maxima - 1)                # prefix just before
    tot_seg = pref_at_seg((seg_sz - 1)[..., None])   # (B, NSEG1, 1, 6)

    ca = _COMBOS  # slot tuples
    a_idx = jnp.asarray([a for a, _ in itertools.combinations(range(10), 2)])
    b_idx = jnp.asarray([bb for _, bb in itertools.combinations(range(10), 2)])
    m_fwd = pb[:, :, b_idx, :] - pa[:, :, a_idx, :]          # (B,NSEG1,45,6)
    n_fwd = (jnp.take(maxima, b_idx, axis=2)
             - jnp.take(maxima, a_idx, axis=2) + 1).astype(jnp.float32)
    m_rev = tot_seg - m_fwd + (pb - pa)[:, :, a_idx, :] + \
        (pb - pa)[:, :, b_idx, :]
    n_rev = seg_sz[..., None].astype(jnp.float32) - n_fwd + 2.0

    fit_fwd = fit_line_f32(m_fwd, n_fwd)
    fit_rev = fit_line_f32(m_rev, n_rev)

    cp = jnp.asarray(_COMBO_PAIRS)  # (210, 4)

    def gatherc(d, which, col):
        src = d[which]
        return src[:, :, cp[:, col]]

    mse01 = gatherc({"f": fit_fwd["mse"]}, "f", 0)
    mse12 = gatherc({"f": fit_fwd["mse"]}, "f", 1)
    mse23 = gatherc({"f": fit_fwd["mse"]}, "f", 2)
    mse30 = fit_rev["mse"][:, :, cp[:, 3]]
    err_tot = (fit_fwd["err"][:, :, cp[:, 0]] + fit_fwd["err"][:, :, cp[:, 1]]
               + fit_fwd["err"][:, :, cp[:, 2]]
               + fit_rev["err"][:, :, cp[:, 3]])
    dot01_12 = (fit_fwd["nx"][:, :, cp[:, 0]] * fit_fwd["nx"][:, :, cp[:, 1]]
                + fit_fwd["ny"][:, :, cp[:, 0]] * fit_fwd["ny"][:, :, cp[:, 1]])
    slots_ok = jnp.asarray(ca[:, 3])[None, None, :] < nmax[..., None]
    combo_ok = (slots_ok & (mse01 <= MAX_LINE_FIT_MSE)
                & (mse12 <= MAX_LINE_FIT_MSE) & (mse23 <= MAX_LINE_FIT_MSE)
                & (mse30 <= MAX_LINE_FIT_MSE)
                & (jnp.abs(dot01_12) <= COS_CRITICAL_RAD))
    err_masked = jnp.where(combo_ok, err_tot, jnp.inf)
    best = jnp.argmin(err_masked, axis=2)                    # (B, NSEG1)
    best_err = jnp.take_along_axis(err_masked, best[..., None],
                                   axis=2)[..., 0]
    seg_quad_ok = seg_quad_ok & jnp.isfinite(best_err) & \
        (best_err / jnp.maximum(seg_sz, 1) <= MAX_LINE_FIT_MSE)
    if _debug_stop == "combos":
        return {"seg_ok": seg_quad_ok, "count": count, "best": best,
                "best_err": best_err}

    # ---- corners from the best combo's 4 lines --------------------------
    def line_params(d, pair_col):
        pidx = jnp.take(cp[:, pair_col], best, axis=0)       # (B, NSEG1)
        out = {}
        for key in ("ex", "ey", "nx", "ny"):
            out[key] = jnp.take_along_axis(d[key], pidx[..., None],
                                           axis=2)[..., 0]
        return out

    l0 = line_params(fit_fwd, 0)
    l1 = line_params(fit_fwd, 1)
    l2 = line_params(fit_fwd, 2)
    l3 = line_params(fit_rev, 3)
    lines = [l0, l1, l2, l3]

    det_ok = jnp.ones((b, nseg1), jnp.bool_)
    ccx_seg = cx * 0.5 + 0.5
    ccy_seg = cy * 0.5 + 0.5
    corner_xy = [None] * 4
    for i in range(4):
        li, lj = lines[i], lines[(i + 1) & 3]
        a00, a01 = li["ny"], -lj["ny"]
        a10, a11 = -li["nx"], lj["nx"]
        b0 = -li["ex"] + lj["ex"]
        b1 = -li["ey"] + lj["ey"]
        det = a00 * a11 - a10 * a01
        det_ok = det_ok & (jnp.abs(det) >= 1e-3)
        l0v = (a11 * b0 - a01 * b1) / jnp.where(det == 0, 1e-12, det)
        px_c = li["ex"] + l0v * a00 + ccx_seg
        py_c = li["ey"] + l0v * a10 + ccy_seg
        corner_xy[(i + 1) & 3] = jnp.stack([px_c, py_c], axis=-1)
    # stack, not 8 full-table .at[].set()s: each (B, NSEG1, 4, 2)
    # dynamic-update-slice cost ~0.87 ms/call on the relay v5e profile
    corners = jnp.stack(corner_xy, axis=2)               # (B, NSEG1, 4, 2)
    seg_quad_ok = seg_quad_ok & det_ok

    # area + winding/angle checks (fit_quad epilogue)
    def tri(p0, p1, p2):
        return 0.5 * jnp.abs((p1[..., 0] - p0[..., 0]) *
                             (p2[..., 1] - p0[..., 1]) -
                             (p2[..., 0] - p0[..., 0]) *
                             (p1[..., 1] - p0[..., 1]))

    area = tri(corners[:, :, 0], corners[:, :, 1], corners[:, :, 2]) + \
        tri(corners[:, :, 2], corners[:, :, 3], corners[:, :, 0])
    seg_quad_ok = seg_quad_ok & (area >= 0.95 * cfg.tag_width * cfg.tag_width)

    for i in range(4):
        p0 = corners[:, :, i]
        p1 = corners[:, :, (i + 1) & 3]
        p2 = corners[:, :, (i + 2) & 3]
        d1 = p1 - p0
        d2 = p2 - p1
        denom = jnp.sqrt((d1 * d1).sum(-1) * (d2 * d2).sum(-1))
        cosdt = (d1 * d2).sum(-1) / jnp.where(denom == 0, 1e-12, denom)
        seg_quad_ok = seg_quad_ok & (jnp.abs(cosdt) <= COS_CRITICAL_RAD) & \
            (d1[..., 0] * d2[..., 1] >= d1[..., 1] * d2[..., 0])

    # ---- compact quads to NQ slots, largest-area first -------------------
    # Under adversarial noise there can be more candidate quads than slots
    # (the reference has no cap and decodes them all); prioritizing by area
    # keeps real tags, which junk clusters rarely out-size.
    nq = cfg.max_quads
    prio = jnp.where(seg_quad_ok, area, -1.0)
    top_prio, top_idx = jax.lax.top_k(prio, nq)           # (B, NQ)
    out_c = jnp.take_along_axis(corners, top_idx[..., None, None], axis=1)
    quad_valid = top_prio > 0
    n_quads = quad_valid.sum(axis=1)

    return {
        "corners": out_c,
        "quad_valid": quad_valid,
        "n_quads": n_quads,
        # stage taps
        "seg": seg, "pos": pos, "errs": errs, "is_peak": is_peak,
        "maxima": maxima, "nmax": nmax, "seg_ok": seg_ok,
        "count": count,
    }
