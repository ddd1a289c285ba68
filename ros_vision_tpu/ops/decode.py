"""On-device tag decode: refine-edges, homography, bit sampling, code match.

TPU-native replacement for the reference's host-side quad finish + decode
(apriltag_detect.cu:98-663: UpdateFitQuads / AdjustPixelCenters /
RefineEdges / DecodeTags via the apriltag C library's workerpool). Instead of
shipping quads back to a CPU thread pool, everything is dense batched math
over a fixed quad slot axis:

  - refine_edges: fixed sample grids per edge (the reference adapts sample
    count to edge length, max(16, len/8); we use a static superset), with the
    reference's undistort-fit-redistort scheme when calibration is given.
  - decode: batched DLT homography solve, border gray-model fit, bilinear
    bit sampling, 3x3 decode-sharpening, and code matching as ONE matmul
    against the family's (4*n_codes, nbits) bit matrix on the MXU
    (hamming(b, c) = |b| + |c| - 2 b.c).

All f32; the decode decision thresholds tolerate far more noise than the
f32/f64 difference.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ros_vision_tpu.apriltag.families import TagFamily

QUAD_DECIMATE = 2
DECODE_SHARPENING = 0.25
MAX_HAMMING = 2
REFINE_ALPHA_TIERS = (32, 64, 128)   # static sample-grid supersets; per
# edge the reference's length-adaptive count max(16, edge_len/8)
# (apriltag_detect.cu:428) is realized by masking samples beyond each
# edge's own count. A lax.switch picks the smallest tier covering the
# longest valid edge: 32 -> 256 full-res px, 64 -> 512 px (the 1080p tag
# regime, 300-500 px edges), 128 -> 1024 px (a tag filling a 1080p frame).
# Beyond 1024 px the count caps (spacing grows past the reference's ~8 px;
# no capturable tag is that large at the supported resolutions). The
# sample grid sits in the decode-gated narrow tail, so the wide tiers
# cost only the <= max_active_quads screened survivors, and only on
# frames that actually contain such an edge.
REFINE_ALPHA_SAMPLES = REFINE_ALPHA_TIERS[-1]
REFINE_NORMAL_STEPS = 25      # range ±(quad_decimate+1), step 0.25 -> 25


def adjust_pixel_centers(corners: jnp.ndarray) -> jnp.ndarray:
    """Decimated -> full-res coords (AdjustPixelCenters,
    apriltag_detect.cu:260-282)."""
    return (corners - 0.5) * QUAD_DECIMATE + 0.5


def _bilinear(gray_f: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Batched bilinear sample with apriltag's half-pixel convention
    (value_for_pixel). gray_f (B, H, W) float32; px/py (B, ...).
    Returns (value, in_bounds)."""
    b, h, w = gray_f.shape
    x1 = jnp.floor(px - 0.5)
    y1 = jnp.floor(py - 0.5)
    fx = px - 0.5 - x1
    fy = py - 0.5 - y1
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    ok = (x1i >= 0) & (x1i + 1 < w) & (y1i >= 0) & (y1i + 1 < h)
    x1c = jnp.clip(x1i, 0, w - 2)
    y1c = jnp.clip(y1i, 0, h - 2)
    flat = gray_f.reshape(b, -1)
    shp = px.shape

    def at(yy, xx):
        idx = (yy * w + xx).reshape(b, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(shp)

    v = (at(y1c, x1c) * (1 - fx) * (1 - fy) + at(y1c, x1c + 1) * fx * (1 - fy)
         + at(y1c + 1, x1c) * (1 - fx) * fy + at(y1c + 1, x1c + 1) * fx * fy)
    return v, ok


def _int_sample(gray_f: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Integer-truncation sample (the reference's int cast), with bounds."""
    b, h, w = gray_f.shape
    xi = px.astype(jnp.int32)
    yi = py.astype(jnp.int32)
    ok = (px >= 0) & (py >= 0) & (xi < w) & (yi < h)
    xc = jnp.clip(xi, 0, w - 1)
    yc = jnp.clip(yi, 0, h - 1)
    flat = gray_f.reshape(b, -1)
    idx = (yc * w + xc).reshape(b, -1)
    v = jnp.take_along_axis(flat, idx, axis=1).reshape(px.shape)
    return v, ok


def _bc_intr(intr, dist, ndim):
    """Broadcast intrinsics/distortion (scalars, (B,) or (B,5)) against
    sample arrays with `ndim` dims (leading batch axis)."""
    def bc(v):
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 0:
            return v
        return v.reshape(v.shape[:1] + (1,) * (ndim - 1))

    fx, fy, cx, cy = (bc(v) for v in intr)
    d = jnp.asarray(dist, jnp.float32)
    if d.ndim <= 1:
        ks = [d[i] for i in range(5)]
    else:
        ks = [bc(d[:, i]) for i in range(5)]
    return fx, fy, cx, cy, ks


def _undistort(px, py, intr, dist, iters=25):
    fx, fy, cx, cy, (k1, k2, p1, p2, k3) = _bc_intr(intr, dist, px.ndim)
    x0 = (px - cx) / fx
    y0 = (py - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        rad = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return (x0 - dx) / rad, (y0 - dy) / rad

    x, y = jax.lax.fori_loop(0, iters, body, (x0, y0))
    return x * fx + cx, y * fy + cy


def _distort(px, py, intr, dist):
    fx, fy, cx, cy, (k1, k2, p1, p2, k3) = _bc_intr(intr, dist, px.ndim)
    x = (px - cx) / fx
    y = (py - cy) / fy
    r2 = x * x + y * y
    rad = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return xd * fx + cx, yd * fy + cy


def refine_edges(gray: jnp.ndarray, corners: jnp.ndarray,
                 quad_valid: jnp.ndarray, intr=None, dist=None,
                 reversed_border: bool = False):
    """Batched subpixel edge refinement (refine_edges + the frc971
    undistortion variant). corners (B, NQ, 4, 2) full-res. Returns
    refined corners.

    The static sample grid is length-gated: edges <= 256 px need at most
    32 of the superset slots (the mask zeroes the rest, so every tier is
    bit-identical where it covers), and the masked-but-gathered extra
    slots cost ~2 ms/frame on the relay — a lax.switch picks the
    smallest REFINE_ALPHA_TIERS grid covering the longest valid edge."""
    pa_ = corners
    pb_ = jnp.roll(corners, -1, axis=2)
    mag_ = jnp.sqrt((pb_[..., 1] - pa_[..., 1]) ** 2
                    + (pb_[..., 0] - pa_[..., 0]) ** 2)
    longest = jnp.max(jnp.where(quad_valid[..., None], mag_, 0.0))
    tier = sum((longest > 8.0 * n).astype(jnp.int32)
               for n in REFINE_ALPHA_TIERS[:-1])
    return jax.lax.switch(
        tier,
        [functools.partial(_refine_edges_core, gray, corners, quad_valid,
                           intr, dist, n, reversed_border)
         for n in REFINE_ALPHA_TIERS])


def _refine_edges_core(gray, corners, quad_valid, intr, dist,
                       n_alpha: int, reversed_border: bool = False):
    b, nq = corners.shape[:2]
    gray_f = gray.astype(jnp.float32)
    have_dist = intr is not None and dist is not None

    pa = corners                                     # edge start (a = i)
    pb = jnp.roll(corners, -1, axis=2)               # edge end (b = i+1)
    nx = pb[..., 1] - pa[..., 1]
    ny = -pb[..., 0] + pa[..., 0]
    mag = jnp.sqrt(nx * nx + ny * ny)
    mag_safe = jnp.where(mag == 0, 1e-6, mag)
    nx = nx / mag_safe
    ny = ny / mag_safe

    # length-adaptive sample count per edge: nsamples = max(16, len/8)
    # (apriltag refine_edges; apriltag_detect.cu:428), realized on the
    # static n_alpha-sample grid by masking samples s >= nsamples
    s = jnp.arange(n_alpha, dtype=jnp.float32)
    ns = jnp.clip(jnp.maximum(16.0, jnp.floor(mag / 8.0)), 16,
                  n_alpha)                            # (B,NQ,4)
    alpha = (1.0 + s) / (ns[..., None] + 1)           # (B,NQ,4,S)
    s_ok = s < ns[..., None]
    x0 = (alpha * pa[..., 0:1] + (1 - alpha) * pb[..., 0:1])  # (B,NQ,4,S)
    y0 = (alpha * pa[..., 1:2] + (1 - alpha) * pb[..., 1:2])

    rng = QUAD_DECIMATE + 1
    n_off = -rng + 0.25 * jnp.arange(REFINE_NORMAL_STEPS, dtype=jnp.float32)
    grange = 1.0
    nxb = nx[..., None, None]
    nyb = ny[..., None, None]
    x0b = x0[..., None]
    y0b = y0[..., None]
    noffb = n_off[None, None, None, None, :]

    # g1/g2 sample at normal offsets (n + grange) and (n - grange); the
    # two 25-step rays overlap over [-2, 2], so ONE gather over the
    # 33-offset union [-rng-grange, rng+grange] replaces both (34% fewer
    # indices on the hot full-res gather). All offsets are dyadic and
    # small, so uoff[k + 8] == n_off[k] + grange EXACTLY in f32 and the
    # sliced samples are bit-identical to the two-gather form.
    gsteps = int(round(2 * grange / 0.25))            # 8
    n_union = REFINE_NORMAL_STEPS + gsteps            # 33
    uoff = (-rng - grange
            + 0.25 * jnp.arange(n_union, dtype=jnp.float32))
    uoffb = uoff[None, None, None, None, :]
    gu, oku = _int_sample(gray_f, x0b + uoffb * nxb, y0b + uoffb * nyb)
    g1 = gu[..., gsteps:]                   # (B,NQ,4,S,N) at n + grange
    ok1 = oku[..., gsteps:]
    g2 = gu[..., :REFINE_NORMAL_STEPS]      # at n - grange
    ok2 = oku[..., :REFINE_NORMAL_STEPS]
    # edge polarity gate: normal tags are darker INSIDE the quad
    # (g1 outside >= g2 inside); reversed-border families invert it
    pol = (g2 >= g1) if reversed_border else (g1 >= g2)
    ok = ok1 & ok2 & pol & s_ok[..., None]
    wgt = jnp.where(ok, (g2 - g1) * (g2 - g1), 0.0)
    xo = x0b + noffb * nxb
    yo = y0b + noffb * nyb
    if have_dist:
        xo, yo = _undistort(xo, yo, intr, dist)
    # accumulate moments about the edge midpoint: the covariance comes from
    # a cancellation (Mxx/N - Ex^2) that loses ~4 digits in f32 when
    # coordinates are in image units; centering makes the fit exact to f32
    # (translation-invariant, center added back to the line point below)
    emx = 0.5 * (pa[..., 0] + pb[..., 0])[..., None, None]
    emy = 0.5 * (pa[..., 1] + pb[..., 1])[..., None, None]
    xod = xo - emx
    yod = yo - emy
    mxy = jnp.stack([wgt * xod, wgt * yod, wgt * xod * xod, wgt * xod * yod,
                     wgt * yod * yod, wgt], axis=-1)
    m = mxy.sum(axis=(3, 4))                        # (B,NQ,4,6)
    n_tot = m[..., 5]
    usable = n_tot > 1e-9
    n_safe = jnp.where(usable, n_tot, 1.0)
    ex = m[..., 0] / n_safe + emx[..., 0, 0]
    ey = m[..., 1] / n_safe + emy[..., 0, 0]
    cxx = m[..., 2] / n_safe - (m[..., 0] / n_safe) ** 2
    cxy = (m[..., 3] / n_safe
           - (m[..., 0] / n_safe) * (m[..., 1] / n_safe))
    cyy = m[..., 4] / n_safe - (m[..., 1] / n_safe) ** 2
    theta = 0.5 * jnp.arctan2(-2 * cxy, cyy - cxx)
    lnx = jnp.cos(theta)
    lny = jnp.sin(theta)

    # intersect consecutive refined lines -> corner (i+1)&3
    out = corners
    for i in range(4):
        j = (i + 1) & 3
        a00, a01 = lny[..., i], -lny[..., j]
        a10, a11 = -lnx[..., i], lnx[..., j]
        b0 = -ex[..., i] + ex[..., j]
        b1 = -ey[..., i] + ey[..., j]
        det = a00 * a11 - a10 * a01
        good = (jnp.abs(det) > 1e-3) & usable[..., i] & usable[..., j] & \
            quad_valid
        l0 = (a11 * b0 - a01 * b1) / jnp.where(det == 0, 1e-12, det)
        px = ex[..., i] + l0 * a00
        py = ey[..., i] + l0 * a10
        if have_dist:
            px, py = _distort(px, py, intr, dist)
        out = out.at[:, :, j, 0].set(jnp.where(good, px, out[:, :, j, 0]))
        out = out.at[:, :, j, 1].set(jnp.where(good, py, out[:, :, j, 1]))
    return out


@functools.lru_cache(maxsize=1)
def _src_basis_inv() -> np.ndarray:
    """Constant S^-1 for the projective-basis homography: S maps the
    projective basis (e1, e2, e3, e1+e2+e3) to the tag-frame square
    (-1,-1),(1,-1),(1,1),(-1,1) (homogeneous); computed once in f64."""
    s = np.array([[-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
                 np.float64).T                      # columns s1..s4
    d = np.linalg.solve(s[:, :3], s[:, 3])
    S = s[:, :3] * d[None, :]
    return np.linalg.inv(S).astype(np.float32)


def quad_homographies(corners: jnp.ndarray) -> jnp.ndarray:
    """Batched DLT: tag frame (-1,-1),(1,-1),(1,1),(-1,1) -> corners.
    corners (..., 4, 2) -> H (..., 3, 3), normalized to H[2,2] = 1.

    Projective-basis closed form instead of the 8x8 DLT LU solve (the
    reference solves the same 4-point system host-side,
    homography_compute2): G = [c1*p1 | c2*p2 | c3*p3] maps the basis to
    the corner points (c = adj([p1 p2 p3]) @ p4, scale-free Cramer), and
    H = G @ S^-1 with S^-1 a constant. ~60 fused elementwise ops per
    quad versus a batched (B*NQ, 8, 8) LU — the solve ran in the
    all-quads screen stage at (B, 128) every frame."""
    u = corners[..., 0]                             # (..., 4)
    v = corners[..., 1]
    p = jnp.stack([u, v, jnp.ones_like(u)], -2)     # (..., 3, 4)
    m = p[..., :3]                                  # columns p1 p2 p3
    p4 = p[..., 3]
    # adj(M) @ p4 via cofactors (scale-free: H is projective)
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    adj = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1)], -2)
    cvec = jnp.einsum("...ij,...j->...i", adj, p4)  # (..., 3)
    G = m * cvec[..., None, :]                      # scale columns
    H = jnp.einsum("...ij,jk->...ik", G, jnp.asarray(_src_basis_inv()))
    h22 = H[..., 2:3, 2:3]
    h22 = jnp.where(jnp.abs(h22) < 1e-20,
                    jnp.where(h22 < 0, -1e-20, 1e-20), h22)
    return H / h22


def project(H: jnp.ndarray, tx, ty):
    """H (..., 3, 3); tx/ty (...,) or broadcastable with extra sample dims
    appended."""
    z = H[..., 2, 0] * tx + H[..., 2, 1] * ty + H[..., 2, 2]
    px = (H[..., 0, 0] * tx + H[..., 0, 1] * ty + H[..., 0, 2]) / z
    py = (H[..., 1, 0] * tx + H[..., 1, 1] * ty + H[..., 1, 2]) / z
    return px, py


_DECODE_TABLES_CACHE: dict = {}


def _decode_tables(family: TagFamily):
    """Static sample-coordinate tables for a family geometry. Reversed-
    border families (white ring inside the quad edge, black surround —
    apriltag_utils.cu:10-33 rcode families) flip each border pattern's
    white/black label; sample positions are identical. Data-bit sample
    coordinates come from the family's bit layout (dense row-major grid
    for classic families; arbitrary bit_x/bit_y for the official
    reversed-border families, whose bits sit partly OUTSIDE the border).
    Also returns the flat scatter indices placing each bit into the
    (total, total) sharpening grid (None for dense layouts, which use a
    free reshape instead)."""
    key = (family.name, family.nbits, family.border_size,
           family.total_width, family.reversed_border)
    hit = _DECODE_TABLES_CACHE.get(key)
    if hit is not None:
        return hit
    wb = family.border_size
    pats = [(-0.5, 0.5, 0, 1, 1), (0.5, 0.5, 0, 1, 0),
            (wb + 0.5, 0.5, 0, 1, 1), (wb - 0.5, 0.5, 0, 1, 0),
            (0.5, -0.5, 1, 0, 1), (0.5, 0.5, 1, 0, 0),
            (0.5, wb + 0.5, 1, 0, 1), (0.5, wb - 0.5, 1, 0, 0)]
    if family.reversed_border:
        pats = [(sx, sy, dx, dy, 1 - w) for sx, sy, dx, dy, w in pats]
    tx, ty, is_white = [], [], []
    for sx, sy, dx, dy, w in pats:
        for i in range(wb):
            tx.append(2 * ((sx + i * dx) / wb - 0.5))
            ty.append(2 * ((sy + i * dy) / wb - 0.5))
            is_white.append(w)
    border = (np.array(tx, np.float32), np.array(ty, np.float32),
              np.array(is_white, np.float32))
    bc = family.bit_coords()
    bx = bc[:, 0].astype(np.float32)
    by = bc[:, 1].astype(np.float32)
    bits = (2 * ((bx + 0.5) / wb - 0.5).astype(np.float32),
            2 * ((by + 0.5) / wb - 0.5).astype(np.float32))
    grid_idx = None
    if family.bit_xy is not None:
        total = family.total_width
        min_coord = (wb - total) // 2
        grid_idx = ((bc[:, 1] - min_coord) * total
                    + (bc[:, 0] - min_coord)).astype(np.int32)
        assert grid_idx.min() >= 0 and grid_idx.max() < total * total
    out = (border, bits, grid_idx)
    _DECODE_TABLES_CACHE[key] = out
    return out


def make_code_matrix(family: TagFamily) -> np.ndarray:
    """(n_codes*4, nbits) float32 bit matrix (static constant)."""
    n, nbits = family.n_codes, family.nbits
    codes = family.codes.reshape(-1)           # (n*4,)
    out = np.zeros((len(codes), nbits), np.float32)
    for i, c in enumerate(codes):
        for bit in range(nbits):
            out[i, bit] = (int(c) >> (nbits - 1 - bit)) & 1
    return out


def decode_quads(gray: jnp.ndarray, corners: jnp.ndarray,
                 quad_valid: jnp.ndarray, family: TagFamily,
                 code_matrix: jnp.ndarray):
    """Batched quad decode (apriltag.c quad_decode semantics).

    Returns dict: ok (B,NQ), tag_id, hamming, rotation (int32),
    margin (f32), H (B,NQ,3,3)."""
    b, nq = corners.shape[:2]
    gray_f = gray.astype(jnp.float32)
    H = quad_homographies(corners)
    wb = family.border_size
    (btx, bty, bwhite), (dtx, dty), grid_idx = _decode_tables(family)
    btx = jnp.asarray(btx)
    bty = jnp.asarray(bty)
    bwhite = jnp.asarray(bwhite)

    # --- border samples -> white/black gray models ----------------------
    Hb = H[:, :, None, :, :]
    pxs = (Hb[..., 0, 0] * btx + Hb[..., 0, 1] * bty + Hb[..., 0, 2])
    pys = (Hb[..., 1, 0] * btx + Hb[..., 1, 1] * bty + Hb[..., 1, 2])
    pzs = (Hb[..., 2, 0] * btx + Hb[..., 2, 1] * bty + Hb[..., 2, 2])
    pxs = pxs / pzs
    pys = pys / pzs
    v, ok = _int_sample(gray_f, pxs, pys)      # (B, NQ, 8*wb)
    wmask = (bwhite[None, None, :] > 0.5) & ok
    kmask = (bwhite[None, None, :] < 0.5) & ok

    def gray_model(mask):
        w = mask.astype(jnp.float32)
        rx, ry = btx[None, None, :], bty[None, None, :]
        sxx = (w * rx * rx).sum(-1) + 1e-6
        sxy = (w * rx * ry).sum(-1)
        sx = (w * rx).sum(-1)
        syy = (w * ry * ry).sum(-1) + 1e-6
        sy = (w * ry).sum(-1)
        s1 = w.sum(-1) + 1e-6
        bx = (w * rx * v).sum(-1)
        by = (w * ry * v).sum(-1)
        b1 = (w * v).sum(-1)
        # analytic symmetric-3x3 solve (adjugate/det): the batched
        # (B, NQ, 3, 3) LU ran over all 128 quad slots in the screen
        # stage; ~20 fused elementwise ops replace it. Same Tikhonov
        # regularization as before, f32 residual ~1e-6 relative.
        c00 = syy * s1 - sy * sy
        c01 = sx * sy - sxy * s1
        c02 = sxy * sy - syy * sx
        c11 = sxx * s1 - sx * sx
        c12 = sxy * sx - sxx * sy
        c22 = sxx * syy - sxy * sxy
        det = sxx * c00 + sxy * c01 + sx * c02
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        out = jnp.stack([c00 * bx + c01 * by + c02 * b1,
                         c01 * bx + c11 * by + c12 * b1,
                         c02 * bx + c12 * by + c22 * b1], -1)
        return out / det[..., None]                       # (B,NQ,3)

    cw = gray_model(wmask)
    ck = gray_model(kmask)
    ok_models = (cw[..., 2] - ck[..., 2]) >= 0   # white(0,0) - black(0,0)

    # --- data bit samples ------------------------------------------------
    dtxj = jnp.asarray(dtx)
    dtyj = jnp.asarray(dty)
    bx = (Hb[..., 0, 0] * dtxj + Hb[..., 0, 1] * dtyj + Hb[..., 0, 2])
    by = (Hb[..., 1, 0] * dtxj + Hb[..., 1, 1] * dtyj + Hb[..., 1, 2])
    bz = (Hb[..., 2, 0] * dtxj + Hb[..., 2, 1] * dtyj + Hb[..., 2, 2])
    bxp = bx / bz
    byp = by / bz
    bv, bok = _bilinear(gray_f, bxp, byp)        # (B, NQ, nbits)
    thr_w = cw[..., 0:1] * dtxj + cw[..., 1:2] * dtyj + cw[..., 2:3]
    thr_k = ck[..., 0:1] * dtxj + ck[..., 1:2] * dtyj + ck[..., 2:3]
    vals = jnp.where(bok, bv - (thr_w + thr_k) * 0.5, 0.0)

    # --- decode sharpening on the (total, total) grid --------------------
    total = family.total_width
    if grid_idx is None:
        # dense classic layout: the data grid embeds by a free reshape
        g = family.grid_size
        grid = jnp.zeros((b, nq, total, total), jnp.float32)
        grid = grid.at[:, :, 2:2 + g, 2:2 + g].set(vals.reshape(b, nq, g, g))
    else:
        # arbitrary layout (official reversed-border families): scatter
        # each bit at its static module coordinate (constant indices ->
        # XLA compiles this to a fixed permutation, and it only runs in
        # the <= max_active_quads narrow tail)
        grid = jnp.zeros((b, nq, total * total), jnp.float32)
        grid = grid.at[:, :, jnp.asarray(grid_idx)].set(vals)
        grid = grid.reshape(b, nq, total, total)
    kern = jnp.asarray([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], jnp.float32)
    sharp = jax.lax.conv_general_dilated(
        grid.reshape(b * nq, 1, total, total),
        kern[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW")).reshape(
            b, nq, total, total)
    grid = grid + DECODE_SHARPENING * sharp
    if grid_idx is None:
        g = family.grid_size
        vals = grid[:, :, 2:2 + g, 2:2 + g].reshape(b, nq, g * g)
    else:
        vals = grid.reshape(b, nq, total * total)[:, :, jnp.asarray(grid_idx)]

    bits = (vals > 0).astype(jnp.float32)        # (B, NQ, nbits)
    white_score = jnp.where(vals > 0, vals, 0.0).sum(-1)
    white_cnt = bits.sum(-1) + 1.0
    black_score = jnp.where(vals <= 0, -vals, 0.0).sum(-1)
    black_cnt = (family.nbits - bits.sum(-1)) + 1.0
    margin = jnp.minimum(white_score / white_cnt, black_score / black_cnt)

    # --- code match: one MXU matmul --------------------------------------
    cm = code_matrix                              # (n*4, nbits)
    code_pop = cm.sum(-1)                         # (n*4,)
    bits_pop = bits.sum(-1, keepdims=True)        # (B, NQ, 1)
    ham = (bits_pop + code_pop[None, None, :]
           - 2.0 * jnp.einsum("bqn,cn->bqc", bits, cm,
                              preferred_element_type=jnp.float32))
    best = jnp.argmin(ham, axis=-1)
    best_h = jnp.take_along_axis(ham, best[..., None], axis=-1)[..., 0]
    tag_id = (best // 4).astype(jnp.int32)
    rotation = (best % 4).astype(jnp.int32)
    ok_all = quad_valid & ok_models & (best_h <= MAX_HAMMING)

    # canonical-orientation homography: H' = H @ Rz(-rotation * 90deg)
    theta = -rotation.astype(jnp.float32) * (math.pi / 2)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    R = jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1)], -2)
    Hdet = jnp.einsum("bqij,bqjk->bqik", H, R)

    return {"ok": ok_all, "tag_id": tag_id,
            "hamming": best_h.astype(jnp.int32), "rotation": rotation,
            "margin": margin, "H": Hdet}
