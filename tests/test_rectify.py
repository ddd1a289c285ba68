"""Debayer + undistort/rectify preprocessing tests (BASELINE config 2)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ros_vision_tpu.apriltag import geometry as geo
from ros_vision_tpu.ops import rectify

FX = FY = 300.0
CX, CY = 160.0, 80.0
DIST = np.array([-0.25, 0.08, 0.001, -0.001, 0.0])


def test_undistort_map_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    m = rectify.build_undistort_map(320, 160, FX, FY, CX, CY, DIST)
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    mx, my = cv2.initUndistortRectifyMap(K, DIST, None, K, (320, 160),
                                         cv2.CV_32FC1)
    # cv2 maps integer-centered pixels; ours are +0.5-centered
    assert np.abs(m[..., 0] - 0.5 - mx).max() < 0.51
    assert np.abs(m[..., 1] - 0.5 - my).max() < 0.51


def test_rectified_detection():
    """A distortion-warped tag rendered through the lens model must detect
    UNDISTORTED (ideal pinhole corners) after remap."""
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    from ros_vision_tpu.apriltag.render import render_scene, \
        simple_square_corners

    ideal = simple_square_corners(160, 80, 40, angle_deg=10)
    warped = geo.distort_points(ideal, FX, FY, CX, CY, DIST)
    img, _ = render_scene([9], [warped], 320, 160)
    rec = rectify.Rectifier(320, 160, FX, FY, CX, CY, DIST)
    out = np.asarray(rec(jnp.asarray(img)[None])[0])
    res = OracleDetector().detect(out)
    assert [d.tag_id for d in res.detections] == [9]
    got = res.detections[0].corners[::-1]
    assert np.abs(got - ideal).max() < 1.0


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
def test_debayer_flat_field(pattern):
    """A flat gray scene mosaiced under any pattern must demosaic back to
    the flat value."""
    rgb = np.full((1, 64, 64, 3), 150, np.uint8)
    ry, rx = rectify._BAYER_OFFSETS[pattern]
    mosaic = np.zeros((1, 64, 64), np.uint8)
    ys, xs = np.mgrid[0:64, 0:64]
    r_m = (ys % 2 == ry) & (xs % 2 == rx)
    b_m = (ys % 2 == 1 - ry) & (xs % 2 == 1 - rx)
    mosaic[0][r_m] = rgb[0, ..., 0][r_m]
    mosaic[0][b_m] = rgb[0, ..., 2][b_m]
    mosaic[0][~(r_m | b_m)] = rgb[0, ..., 1][~(r_m | b_m)]
    gray = np.asarray(rectify.debayer(jnp.asarray(mosaic), pattern))
    assert np.abs(gray.astype(int) - 150).max() <= 1


def test_debayer_color_recovery():
    """A solid color mosaic must demosaic to that color."""
    color = np.array([200, 60, 120], np.uint8)
    ys, xs = np.mgrid[0:64, 0:64]
    mosaic = np.zeros((1, 64, 64), np.uint8)
    r_m = (ys % 2 == 0) & (xs % 2 == 0)     # RGGB
    b_m = (ys % 2 == 1) & (xs % 2 == 1)
    mosaic[0][r_m] = color[0]
    mosaic[0][b_m] = color[2]
    mosaic[0][~(r_m | b_m)] = color[1]
    rgb = np.asarray(rectify.debayer(jnp.asarray(mosaic), "RGGB",
                                     to_gray=False))
    inner = rgb[0, 8:-8, 8:-8]
    assert np.abs(inner.astype(int) - color[None, None]).max() <= 1
