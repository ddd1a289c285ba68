"""Planar pose-ambiguity validation against an independent oracle.

The production paths (f64 mirror oracle geometry.estimate_tag_pose and the
f32 device path ops/pose.estimate_poses) share the mirror-seeded
second-candidate scheme, so their mutual parity says nothing about the
ambiguity branch itself. These tests check BOTH against
geometry.estimate_tag_pose_exhaustive — a dense multi-start f64 search
that provably covers every minimum the reference's fix_pose_ambiguities
quartic (apriltag_pose.c, Schweighofer & Pinz 2006) can return — over
high-tilt and off-axis ground-truth poses, with and without corner noise.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ros_vision_tpu.apriltag import geometry as geo
from ros_vision_tpu.ops import pose as poseops

TAG = 0.1651
FX = FY = 900.0
CX, CY = 640.0, 400.0


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def _project(R, t):
    obj = geo.pose_object_points(TAG)
    pc = obj @ R.T + t
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FY * pc[:, 1] / pc[:, 2] + CY], -1)


def _device_pose(corners):
    corr = np.array([
        [-1, 1, corners[0][0], corners[0][1]],
        [1, 1, corners[1][0], corners[1][1]],
        [1, -1, corners[2][0], corners[2][1]],
        [-1, -1, corners[3][0], corners[3][1]]], np.float64)
    H = geo.homography_compute(corr)
    R, t, err = poseops.estimate_poses(
        jnp.asarray(H, jnp.float32)[None, None], TAG, FX, FY, CX, CY)
    return np.asarray(R[0, 0], np.float64), np.asarray(t[0, 0], np.float64)


GT_POSES = [
    (tilt, yaw, off)
    for tilt in (0.0, 30.0, 50.0, 65.0, 72.0, 78.0)
    for yaw in (0.0, 40.0)
    for off in ((0.0, 0.0), (0.45, -0.35))
]


@pytest.mark.parametrize("tilt,yaw,off", GT_POSES)
def test_oracle_vs_exhaustive(tilt, yaw, off):
    """The mirror-seeded f64 oracle finds the same global minimum as the
    exhaustive multi-start search (clean corners)."""
    R_gt = _rot([1, 0.3, 0], tilt) @ _rot([0, 0, 1], yaw)
    t_gt = np.array([off[0], off[1], 1.5])
    corners = _project(R_gt, t_gt)
    Re, te, ee, e2 = geo.estimate_tag_pose_exhaustive(
        corners, TAG, FX, FY, CX, CY)
    Rm, tm, em = geo.estimate_tag_pose(corners, TAG, FX, FY, CX, CY)
    assert em <= ee * (1 + 1e-6) + 1e-15, (em, ee)
    np.testing.assert_allclose(tm, te, atol=1e-9)
    np.testing.assert_allclose(tm, t_gt, atol=2e-3)
    # ground-truth recovery: normals agree (no wrong-branch selection)
    assert float(Rm[:, 2] @ R_gt[:, 2]) > 0.999


@pytest.mark.parametrize("tilt,yaw,off", GT_POSES)
def test_device_vs_exhaustive(tilt, yaw, off):
    """The f32 device path lands in the exhaustive oracle's basin."""
    R_gt = _rot([1, 0.3, 0], tilt) @ _rot([0, 0, 1], yaw)
    t_gt = np.array([off[0], off[1], 1.5])
    corners = _project(R_gt, t_gt)
    Re, te, ee, _ = geo.estimate_tag_pose_exhaustive(
        corners, TAG, FX, FY, CX, CY)
    Rd, td = _device_pose(corners)
    np.testing.assert_allclose(td, te, atol=3e-3)
    assert float(Rd[:, 2] @ Re[:, 2]) > 0.99


def test_noisy_branch_selection():
    """With corner noise at high tilt (the ambiguity-flip regime), both
    production paths pick the exhaustive oracle's winning basin whenever
    the two minima are clearly separated (>=20% error gap); borderline
    cases — where f32 vs f64 may legitimately disagree — must be a small
    minority."""
    rng = np.random.default_rng(7)
    checked = borderline = 0
    mism_oracle = mism_device = 0
    for trial in range(60):
        tilt = rng.uniform(55.0, 78.0)
        yaw = rng.uniform(0.0, 90.0)
        off = rng.uniform(-0.5, 0.5, 2)
        R_gt = _rot([1, rng.uniform(-0.5, 0.5), 0], tilt) @ \
            _rot([0, 0, 1], yaw)
        t_gt = np.array([off[0], off[1], rng.uniform(1.0, 2.5)])
        corners = _project(R_gt, t_gt) + rng.normal(0, 0.3, (4, 2))
        Re, te, ee, e2 = geo.estimate_tag_pose_exhaustive(
            corners, TAG, FX, FY, CX, CY)
        if not np.isfinite(e2) or e2 < 1.2 * ee:
            borderline += 1
            continue
        checked += 1
        Rm, tm, em = geo.estimate_tag_pose(corners, TAG, FX, FY, CX, CY)
        if float(Rm[:, 2] @ Re[:, 2]) < 0.99:
            mism_oracle += 1
        Rd, td = _device_pose(corners)
        if float(Rd[:, 2] @ Re[:, 2]) < 0.99:
            mism_device += 1
    assert checked >= 30, (checked, borderline)
    assert mism_oracle == 0, f"{mism_oracle}/{checked} oracle branch misses"
    assert mism_device == 0, f"{mism_device}/{checked} device branch misses"


def test_device_pose_rotation_is_orthonormal():
    """Regression: the device OI's Procrustes matrix has an exactly-zero
    third column for planar tags, and the Newton polar iteration used to
    invert it — R[:, 2] came back as ~1e16 garbage (adj/1e-20) while
    pose_t stayed correct, so only R-consuming code saw it. The returned
    R must be a proper rotation matching the f64 oracle's normal."""
    rng = np.random.default_rng(3)
    for trial in range(8):
        tilt = rng.uniform(5, 60)
        R_true = _rot([1, rng.uniform(-0.5, 0.5), 0], tilt)
        t_true = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.08, 0.08),
                           rng.uniform(0.5, 1.2)])
        corners = _project(R_true, t_true)
        R, t = _device_pose(corners)
        assert np.abs(R @ R.T - np.eye(3)).max() < 1e-5, (trial, tilt)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5
        Ro, to, eo = geo.estimate_tag_pose(corners, TAG, FX, FY, CX, CY)
        assert np.abs(R[:, 2] - Ro[:, 2]).max() < 5e-3, (trial, tilt)
