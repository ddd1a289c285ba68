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
MAX_NMAXIMA = 10
MAX_LINE_FIT_MSE = 10.0
COS_CRITICAL_RAD = math.cos(10 * math.pi / 180)
WEIGHT_SCALE = 1.0 / 256.0
N_PAIRS = 45
N_COMBOS = 210

_BIGI = jnp.int32(2 ** 30)

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
    row_interleave: int = 16     # overflow fairness: candidate rows are
    # visited in a strided order so that when the K cap overflows, dropped
    # points spread across the whole image instead of truncating the bottom


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


def boundary_points(threshim, labels, sizes, cfg: QuadFitConfig):
    """Emit black/white blob-pair boundary points and compact to K slots.

    Equivalent of the BlobDiff kernel + nonzero compaction
    (apriltag_gpu.cu:226-360, 788-802). Coordinates are in double-resolution
    decimated units: x = 2*px + dx, y = 2*py + dy.
    Returns dict(key_lo, key_hi, x2, y2, gx, gy) of (B, K) and counts (B,).
    """
    b, h, w = threshim.shape
    v = threshim.astype(jnp.int32)
    limg = labels.reshape(b, h, w)
    simg = sizes.reshape(b, h, w)
    big = simg >= MIN_BLOB_PIXELS

    # interior mask (x in [1, w-2], y in [1, h-2]) matching the oracle loops
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    interior = ((xs >= 1) & (xs <= w - 2))[None, None, :] & \
        ((ys >= 1) & (ys <= h - 2))[None, :, None]

    valids, los, his, x2s, y2s, gxs, gys = [], [], [], [], [], [], []
    for dx, dy in ((1, 0), (0, 1), (-1, 1), (1, 1)):
        nv = jnp.roll(v, (-dy, -dx), axis=(1, 2))
        nl = jnp.roll(limg, (-dy, -dx), axis=(1, 2))
        nbig = jnp.roll(big, (-dy, -dx), axis=(1, 2))
        ok = interior & ((v + nv) == 255) & big & nbig
        # neighbor must also be interior (roll wraps; interior excludes
        # borders on both sides so wrapped values are always masked)
        g = jnp.sign(nv - v)  # +1 if neighbor white
        lo = jnp.minimum(limg, nl)
        hi = jnp.maximum(limg, nl)
        x2 = 2 * xs[None, None, :] + dx + jnp.zeros_like(v)
        y2 = 2 * ys[None, :, None] + dy + jnp.zeros_like(v)
        valids.append(ok)
        los.append(lo)
        his.append(hi)
        x2s.append(x2)
        y2s.append(y2)
        gxs.append(dx * g)
        gys.append(dy * g)

    # largest divisor of h not exceeding the configured interleave
    ri = next(r for r in range(min(cfg.row_interleave, h), 0, -1)
              if h % r == 0)

    def flat(lst):
        x = jnp.stack(lst, axis=1)                      # (B, 4, H, W)
        # strided row interleave: rows 0, ri, 2ri, ..., 1, ri+1, ...
        x = x.reshape(b, 4, h // ri, ri, w).swapaxes(2, 3)
        return x.reshape(b, -1)

    # pack (x2, y2, gx, gy) into one int32 word (11+11+2+2 bits; the same
    # idea as the reference's 64-bit QuadBoundaryPoint packing,
    # points.h:25-161) — halves the compaction + sort payload traffic.
    # 11-bit coords bound the image at 2048x2048 full-res (the reference
    # has the equivalent w*h < 2^22 cap, apriltag_gpu.cu:774).
    assert 2 * w < 2048 and 2 * h < 2048, "image too large for 11-bit coords"

    def pack(x2, y2, gx, gy):
        return (x2 | (y2 << 11) | ((gx + 1) << 22) | ((gy + 1) << 24))

    payload = {
        "key_lo": flat(los), "key_hi": flat(his),
        "packed": flat([pack(x, y, gx_, gy_) for x, y, gx_, gy_ in
                        zip(x2s, y2s, gxs, gys)]),
    }
    fill = {"key_lo": _BIGI, "key_hi": _BIGI, "packed": jnp.int32(0)}
    return segs.compact(flat(valids), payload, cfg.max_points, fill)


def unpack_points(packed):
    x2 = packed & 0x7FF
    y2 = (packed >> 11) & 0x7FF
    gx = ((packed >> 22) & 0x3) - 1
    gy = ((packed >> 24) & 0x3) - 1
    return x2, y2, gx, gy


def _sort_by(keys, payloads, num_keys):
    ops = list(keys) + list(payloads)
    out = jax.lax.sort(ops, dimension=1, num_keys=num_keys, is_stable=True)
    return out[:len(keys)], out[len(keys):]


def cluster_and_fit(pts: dict, decim: jnp.ndarray, cfg: QuadFitConfig):
    """From compacted boundary points to quad corners.

    Returns dict with corners (B, NQ, 4, 2) in decimated pixel coords,
    quad_valid (B, NQ), n_quads (B,), plus stage taps.
    """
    b, k = pts["key_lo"].shape
    nseg = cfg.max_segments
    nseg1 = nseg + 1

    # ---- sort by blob-pair key, assign segment ids ----------------------
    (lo_s, hi_s), (packed,) = _sort_by(
        [pts["key_lo"], pts["key_hi"]], [pts["packed"]], num_keys=2)
    x2, y2, gx, gy = unpack_points(packed)
    valid_pt = lo_s < _BIGI
    seg = segs.segment_ids_from_sorted_keys(lo_s, hi_s, valid=valid_pt,
                                            max_segments=nseg)

    # ---- per-segment stats & filters (SelectBlobs, apriltag_gpu.cu:522-575)
    fx2 = x2.astype(jnp.float32)
    fy2 = y2.astype(jnp.float32)
    count = segs.batched_segment_sum(valid_pt.astype(jnp.int32), seg, nseg1)
    xmin = segs.batched_segment_min(jnp.where(valid_pt, x2, _BIGI), seg, nseg1)
    xmax = segs.batched_segment_max(jnp.where(valid_pt, x2, -_BIGI), seg, nseg1)
    ymin = segs.batched_segment_min(jnp.where(valid_pt, y2, _BIGI), seg, nseg1)
    ymax = segs.batched_segment_max(jnp.where(valid_pt, y2, -_BIGI), seg, nseg1)
    cx = (xmin + xmax).astype(jnp.float32) * 0.5 + 0.05118
    cy = (ymin + ymax).astype(jnp.float32) * 0.5 - 0.028581

    cx_pt = segs.take1(cx, seg)
    cy_pt = segs.take1(cy, seg)
    dxp = fx2 - cx_pt
    dyp = fy2 - cy_pt
    dot = segs.batched_segment_sum(
        jnp.where(valid_pt, dxp * gx + dyp * gy, 0.0), seg, nseg1)

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

    # ---- theta sort within segments (AddThetaToIndexPoint + radix sort,
    #      apriltag_gpu.cu:396-412, 944-956). One packed int32 key:
    #      seg (11 bits) << 20 | theta fixed-point (20 bits) — the same
    #      fixed-point-angle radix-sort trick as the reference's IndexPoint
    #      (points.h:169-279, 28-bit theta; 20 bits = 6e-6 rad resolution,
    #      far below boundary-point angular spacing) -------------------
    theta = jnp.arctan2(dyp, dxp)
    theta_fx = jnp.clip(((theta + math.pi) * (2 ** 20 / (2 * math.pi)))
                        .astype(jnp.int32), 0, 2 ** 20 - 1)
    seg_ok_pt = segs.take1(seg_ok, seg)
    seg_for_sort = jnp.where(seg_ok_pt & valid_pt, seg, nseg)
    sort_key = (seg_for_sort << 20) | theta_fx
    (sort_key_s,), (packed,) = _sort_by([sort_key], [packed], num_keys=1)
    seg = sort_key_s >> 20
    x2, y2, gx, gy = unpack_points(packed)
    valid_pt = seg < nseg

    # position within segment + segment start/size per point: build a
    # (B, NSEG1) start table by scatter, broadcast back by gather (cheaper
    # on TPU than a log-depth cummax scan over K)
    i_global = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (b, k))
    new_seg = jnp.concatenate(
        [jnp.ones((b, 1), jnp.bool_), seg[:, 1:] != seg[:, :-1]], axis=1)
    start_table = jnp.zeros((b, nseg1), jnp.int32)
    start_table = jax.vmap(lambda t, s, v: t.at[s].max(v))(
        start_table, jnp.where(new_seg, seg, nseg), i_global)
    start = segs.take1(start_table, seg)
    pos = i_global - start
    sz_pt = segs.take1(segs.batched_segment_sum(
        valid_pt.astype(jnp.int32), seg, nseg1), seg)

    # ---- line-fit moments, segmented prefix sums ------------------------
    # decimated-pixel coords with apriltag's +0.5 center convention
    px = x2.astype(jnp.float32) * 0.5 + 0.5
    py = y2.astype(jnp.float32) * 0.5 + 0.5
    # per-segment centering for f32 conditioning (translation-invariant)
    ccx = segs.take1(cx, seg) * 0.5 + 0.5
    ccy = segs.take1(cy, seg) * 0.5 + 0.5
    xc = px - ccx
    yc = py - ccy
    ix = (px).astype(jnp.int32)
    iy = (py).astype(jnp.int32)
    inb = (ix > 0) & (ix + 1 < w2) & (iy > 0) & (iy + 1 < h2)
    ixc = jnp.clip(ix, 1, w2 - 2)
    iyc = jnp.clip(iy, 1, h2 - 2)

    def img_at(dy, dx):
        flat = decim.reshape(b, -1).astype(jnp.float32)
        idx = (iyc + dy) * w2 + (ixc + dx)
        return jnp.take_along_axis(flat, idx, axis=1)

    gimx = img_at(0, 1) - img_at(0, -1)
    gimy = img_at(1, 0) - img_at(-1, 0)
    wgt = jnp.where(inb, jnp.sqrt(gimx * gimx + gimy * gimy) + 1.0, 1.0)
    wgt = wgt * WEIGHT_SCALE
    wgt = jnp.where(valid_pt, wgt, 0.0)
    mom = jnp.stack([wgt * xc, wgt * yc, wgt * xc * xc, wgt * xc * yc,
                     wgt * yc * yc, wgt], axis=-1)  # (B, K, 6)
    pref = scan.segmented_cumsum_from_starts(mom, start)

    # helpers: prefix lookup by position within this point's segment
    def pref_at(position):
        """Inclusive prefix at segment-relative position (clamped >= 0);
        returns 0 for position < 0."""
        posc = jnp.clip(position, 0, k - 1)
        gathered = segs.take1(pref, jnp.clip(start + posc, 0, k - 1))
        return jnp.where((position >= 0)[..., None], gathered, 0.0)

    total = pref_at(sz_pt - 1)

    def window_moments(a, bpos):
        """Circular window [a..bpos] within segment (positions mod sz)."""
        am = jnp.where(a < 0, a + sz_pt, a)
        bm = jnp.where(bpos >= sz_pt, bpos - sz_pt, bpos)
        direct = am <= bm
        m_direct = pref_at(bm) - pref_at(am - 1)
        m_wrap = total - (pref_at(am - 1) - pref_at(bm))
        n = jnp.where(direct, bm - am + 1, sz_pt - am + bm + 1)
        return jnp.where(direct[..., None], m_direct, m_wrap), \
            n.astype(jnp.float32)

    # ---- windowed errors (DoFitLines, line_fit_filter.cu:340-592) -------
    ksz = jnp.minimum(20, sz_pt // 12)
    fit_ok_pt = valid_pt & (ksz >= 2)
    mwin, nwin = window_moments(pos - ksz, pos + ksz)
    errs = fit_line_f32(mwin, nwin)["err"]
    errs = jnp.where(fit_ok_pt, errs, 0.0)

    # 7-tap circular gaussian smoothing (FilterCoefficients,
    # line_fit_filter.h:122-128)
    smoothed = jnp.zeros_like(errs)
    for j in range(-3, 4):
        f = math.exp(-j * j / 2.0)
        pj = jnp.where(sz_pt > 0, (pos + j) % jnp.maximum(sz_pt, 1), 0)
        ej = segs.take1(errs, jnp.clip(start + pj, 0, k - 1))
        smoothed = smoothed + f * ej
    errs = smoothed

    nxt = segs.take1(errs, jnp.clip(
        start + (pos + 1) % jnp.maximum(sz_pt, 1), 0, k - 1))
    prv = segs.take1(errs, jnp.clip(
        start + (pos - 1 + sz_pt) % jnp.maximum(sz_pt, 1), 0, k - 1))
    is_peak = fit_ok_pt & (errs > nxt) & (errs > prv)

    # ---- top-10 maxima per segment (peak select/sort/extents,
    #      apriltag_gpu.cu:1001-1078) -------------------------------------
    npeaks = segs.batched_segment_sum(is_peak.astype(jnp.int32), seg, nseg1)
    peak_seg = jnp.where(is_peak, seg, nseg)
    (pseg_s, _), (perr_s,) = _sort_by([peak_seg, -errs], [errs], num_keys=2)
    pnew = jnp.concatenate(
        [jnp.ones((b, 1), jnp.bool_), pseg_s[:, 1:] != pseg_s[:, :-1]],
        axis=1)
    pstart_table = jnp.zeros((b, nseg1), jnp.int32)
    pstart_table = jax.vmap(lambda t, s, v: t.at[s].max(v))(
        pstart_table, jnp.where(pnew, pseg_s, nseg), i_global)
    prank = i_global - segs.take1(pstart_table, pseg_s)
    # threshold value = error of the (MAX_NMAXIMA)-th ranked peak (0-based
    # rank 10 = 11th largest); keep strictly greater (apriltag semantics)
    thresh = jnp.full((b, nseg1), -jnp.inf, jnp.float32)
    is_thresh = (prank == MAX_NMAXIMA) & (pseg_s < nseg)
    thresh = jax.vmap(lambda t, s, v, m: t.at[jnp.where(m, s, nseg)].set(
        jnp.where(m, v, -jnp.inf), mode="drop"))(
            thresh, pseg_s, perr_s, is_thresh)
    use_thresh = segs.take1(npeaks, seg) > MAX_NMAXIMA
    qualify = is_peak & jnp.where(use_thresh,
                                  errs > segs.take1(thresh, seg), True)

    nmax = segs.batched_segment_sum(qualify.astype(jnp.int32), seg, nseg1)
    qrank = scan.segmented_cumsum_from_starts(
        qualify.astype(jnp.float32), start).astype(jnp.int32) - 1
    # scatter maxima positions into (B, NSEG1, 10)
    slots = jnp.full((b, nseg1 * MAX_NMAXIMA + 1), 0, jnp.int32)
    ok_slot = qualify & (qrank < MAX_NMAXIMA)
    slot_idx = jnp.where(ok_slot, seg * MAX_NMAXIMA + qrank,
                         nseg1 * MAX_NMAXIMA)
    slots = jax.vmap(lambda s, ix, v: s.at[ix].set(v))(
        slots, slot_idx, pos)
    maxima = slots[:, :nseg1 * MAX_NMAXIMA].reshape(b, nseg1, MAX_NMAXIMA)

    seg_quad_ok = seg_ok & (nmax >= 4)

    # ---- 45 pair fits + 210 combos (DoFitQuads,
    #      line_fit_filter.cu:1088-1212) ----------------------------------
    seg_starts = jnp.zeros((b, nseg1), jnp.int32)
    seg_starts = jax.vmap(lambda t, s, v, m: t.at[jnp.where(m, s, nseg)].set(
        jnp.where(m, v, 0), mode="drop"))(
            seg_starts, seg, i_global, new_seg & (seg < nseg))
    seg_sz = segs.batched_segment_sum(valid_pt.astype(jnp.int32), seg, nseg1)

    def pref_at_seg(position):
        """(B, NSEG1, 10) segment-relative position -> prefix (…, 6)."""
        posc = jnp.clip(position, 0, k - 1)
        gidx = jnp.clip(seg_starts[..., None] + posc, 0, k - 1)
        flatidx = gidx.reshape(b, -1)
        g = segs.take1(pref, flatidx).reshape(b, nseg1, -1, 6)
        return jnp.where((position >= 0)[..., None], g, 0.0)

    pb = pref_at_seg(maxima)                    # prefix at maxima pos
    pa = pref_at_seg(maxima - 1)                # prefix just before
    tot_seg = pref_at_seg(jnp.broadcast_to(
        (seg_sz - 1)[..., None], maxima.shape))[:, :, :1, :]  # (B,NSEG1,1,6)

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

    corners = jnp.zeros((b, nseg1, 4, 2), jnp.float32)
    det_ok = jnp.ones((b, nseg1), jnp.bool_)
    ccx_seg = cx * 0.5 + 0.5
    ccy_seg = cy * 0.5 + 0.5
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
        corners = corners.at[:, :, (i + 1) & 3, 0].set(px_c)
        corners = corners.at[:, :, (i + 1) & 3, 1].set(py_c)
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
