"""Batched tag pose estimation on device (orthogonal iteration).

TPU equivalent of the reference's per-detection estimate_tag_pose call
(apriltag lib apriltag_pose.c, called from apriltags_cuda_detector.cu:433):
homography init + Lu-Hager-Mjolsness object-space refinement, with the
classical planar second candidate, evaluated for ALL quad slots of ALL frames
at once as dense (B, NQ, 3, 3) linear algebra. f32 is ample for centimeter-
scale FRC accuracy; the parity tests bound the difference against the f64
oracle.

Convention (apriltag): camera z out of the lens, x right, y down; tag z into
the tag. Detection corner order p[0..3] <-> tag corners
(-1,1),(1,1),(1,-1),(-1,-1) scaled by tag_size/2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ros_vision_tpu.ops.decode import project


def _inv3(m):
    """Closed-form batched 3x3 inverse (adjugate / det)."""
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]
    d = m[..., 1, 0]; e = m[..., 1, 1]; f = m[..., 1, 2]
    g = m[..., 2, 0]; h = m[..., 2, 1]; i = m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)], -2)
    return adj / det[..., None, None]


def _det3(m):
    return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2]
                            - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2]
                              - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1]
                              - m[..., 1, 1] * m[..., 2, 0]))


def polar_rotation(m, iters=8):
    """Nearest rotation matrix by Newton polar iteration
    X <- (X + X^-T)/2 — closed-form 3x3 ops only. XLA's batched small-SVD
    lowers to a slow host-style loop on TPU; this runs entirely on the VPU.
    det<0 inputs (degenerate/garbage quad slots only, in practice) get a
    z-axis reflection fix to return SOME proper rotation."""
    nrm = jnp.sqrt((m * m).sum((-1, -2), keepdims=True) / 3.0)
    x = m / jnp.where(nrm < 1e-20, 1e-20, nrm)

    def body(_, x):
        return 0.5 * (x + jnp.swapaxes(_inv3(x), -1, -2))

    p = jax.lax.fori_loop(0, iters, body, x)
    neg = (_det3(p) < 0)[..., None, None]
    flip = jnp.where(neg & (jnp.arange(3) == 2)[None, :], -1.0, 1.0)
    return p * flip


def _orthogonal_iteration(v, obj, r0, t0, n_steps=30):
    """v (..., 4, 3) sight rays; obj (4, 3) PLANAR (z == 0 — tag corners);
    r0 (..., 3, 3); t0 (..., 3)."""
    vv = (v[..., :, :, None] * v[..., :, None, :]) / \
        (v * v).sum(-1)[..., None, None]            # F_i (..., 4, 3, 3)
    eye = jnp.eye(3, dtype=v.dtype)
    G = _inv3(eye - vv.mean(-3)) / v.shape[-2]
    p_mean = obj.mean(0)
    p_res = obj - p_mean                              # (4, 3)

    def body(_, rt):
        r, _t = rt
        rp = jnp.einsum("...ij,nj->...ni", r, obj)    # (..., 4, 3)
        t = jnp.einsum("...ij,...j->...i", G,
                       jnp.einsum("...nij,...nj->...i", vv - eye, rp))
        q = jnp.einsum("...nij,...nj->...ni", vv, rp + t[..., None, :])
        q_mean = q.mean(-2, keepdims=True)
        m = jnp.einsum("...ni,nj->...ij", q - q_mean, p_res)
        # planar object: p_res[:, 2] == 0 makes m's third COLUMN exactly
        # zero, and the Newton polar iteration inverts its input — a
        # singular m filled R[:, 2] with adj/1e-20 garbage (~1e16) while
        # the first two columns still converged. The Procrustes-optimal
        # completion is the cross of the two data columns: e3 is m's
        # null right-singular vector, c0 x c1 spans the left null space,
        # and the polar factor is invariant to the (positive) scale of a
        # singular direction — scaled to the geometric mean of the data
        # columns' norms for Newton conditioning. (The f64 oracle's SVD
        # with the det sign fix handles rank-2 m natively,
        # geometry.py:234-235.)
        c0 = m[..., :, 0]
        c1 = m[..., :, 1]
        c2 = jnp.cross(c0, c1)
        n0 = jnp.sqrt((c0 * c0).sum(-1))
        n1 = jnp.sqrt((c1 * c1).sum(-1))
        c2n = jnp.sqrt((c2 * c2).sum(-1))
        scale = jnp.sqrt(n0 * n1) / jnp.maximum(c2n, 1e-30)
        m = jnp.stack([c0, c1, c2 * scale[..., None]], -1)
        r_new = polar_rotation(m)
        return r_new, t

    r, t = jax.lax.fori_loop(0, n_steps, body, (r0, t0))
    rp = jnp.einsum("...ij,nj->...ni", r, obj) + t[..., None, :]
    res = rp - jnp.einsum("...nij,...nj->...ni", vv, rp)
    err = (res * res).sum((-1, -2))
    return r, t, err


def _homography_init(H, fx, fy, cx, cy):
    r20 = H[..., 2, 0]
    r21 = H[..., 2, 1]
    tz = H[..., 2, 2]
    r00 = (H[..., 0, 0] - cx * r20) / fx
    r01 = (H[..., 0, 1] - cx * r21) / fx
    tx = (H[..., 0, 2] - cx * tz) / fx
    r10 = (H[..., 1, 0] - cy * r20) / fy
    r11 = (H[..., 1, 1] - cy * r21) / fy
    ty = (H[..., 1, 2] - cy * tz) / fy
    l1 = jnp.sqrt(r00 * r00 + r10 * r10 + r20 * r20)
    l2 = jnp.sqrt(r01 * r01 + r11 * r11 + r21 * r21)
    s = 1.0 / jnp.sqrt(jnp.maximum(l1 * l2, 1e-12))
    s = jnp.where(tz < 0, -s, s)
    c0 = jnp.stack([r00, r10, r20], -1) * s[..., None]
    c1 = jnp.stack([r01, r11, r21], -1) * s[..., None]
    c2 = jnp.cross(c0, c1)
    r = polar_rotation(jnp.stack([c0, c1, c2], -1))
    t = jnp.stack([tx, ty, tz], -1) * s[..., None]
    return r, t


def _axis_rotation(axis, ang):
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1)], -2)
    eye = jnp.eye(3, dtype=axis.dtype)
    s = jnp.sin(ang)[..., None, None]
    c = (1 - jnp.cos(ang))[..., None, None]
    return eye + s * K + c * jnp.einsum("...ij,...jk->...ik", K, K)


def estimate_poses(Hdet: jnp.ndarray, tag_size: float,
                   fx, fy, cx, cy, n_steps: int = 50):
    """Hdet (B, NQ, 3, 3) canonical detection homographies ->
    (R (B,NQ,3,3), t (B,NQ,3), err (B,NQ)).

    Intrinsics may be scalars or per-batch-row (B,) arrays (per-camera
    calibration: each row of the batch is a different camera)."""
    b = Hdet.shape[0]

    def per_row(v):
        v = jnp.asarray(v, jnp.float32)
        return jnp.broadcast_to(v.reshape(-1), (b,)) if v.ndim <= 1 else v

    fx1, fy1, cx1, cy1 = (per_row(v)[:, None] for v in (fx, fy, cx, cy))
    s = tag_size / 2.0
    obj = jnp.asarray([[-s, s, 0], [s, s, 0], [s, -s, 0], [-s, -s, 0]],
                      jnp.float32)
    # detection corners from the homography
    tcs = jnp.asarray([[-1, 1], [1, 1], [1, -1], [-1, -1]], jnp.float32)
    px, py = project(Hdet[..., None, :, :], tcs[:, 0], tcs[:, 1])
    v = jnp.stack([(px - cx1[..., None]) / fx1[..., None],
                   (py - cy1[..., None]) / fy1[..., None],
                   jnp.ones_like(px)], -1)

    r0, t0 = _homography_init(Hdet, fx1, fy1, cx1, cy1)
    t0 = t0 * s
    r1, t1, e1 = _orthogonal_iteration(v, obj, r0, t0, n_steps)

    # planar-ambiguity second candidate: mirror tilt about the sight line
    tn = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    normal = r1[..., :, 2]
    axis = jnp.cross(tn, normal)
    sin_a = jnp.linalg.norm(axis, axis=-1)
    cos_a = (tn * normal).sum(-1)
    ang = -2.0 * jnp.arctan2(sin_a, cos_a)
    axis = axis / jnp.maximum(sin_a, 1e-9)[..., None]
    rot = _axis_rotation(axis, ang)
    r2_init = jnp.einsum("...ij,...jk->...ik", rot, r1)
    r2, t2, e2 = _orthogonal_iteration(v, obj, r2_init, t1, n_steps)

    use2 = (e2 < e1) & (sin_a > 1e-8)
    r = jnp.where(use2[..., None, None], r2, r1)
    t = jnp.where(use2[..., None], t2, t1)
    err = jnp.where(use2, e2, e1)
    return r, t, err
