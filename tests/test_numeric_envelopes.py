"""Pins for the two documented numeric divergences from the reference
(VERDICT r3 #8):

(a) undistort inner loop: the reference iterates the inverse-distortion
    fixpoint 100x to eps 1e-6 in f64 (apriltag_detect.cu:22-23); the
    device path uses 25 fixed f32 iterations (ops/decode.py:_undistort).
    These tests prove 25 iterations have converged to the f64 fixpoint
    across the WHOLE supported calibration envelope (the soak palette
    plus a worst-case calibration harsher than any rig artifact),
    sampled out to the frame corners where distortion is strongest.

(b) refine_edges beyond the largest static tier (128 samples = 1024
    full-res px at the reference's max(16, len/8) density,
    apriltag_detect.cu:428): edges longer than 1024 px keep FULL spatial
    coverage (the sample grid spans the whole edge; only the density
    drops below the reference's), and end-to-end corners on a
    tag with ~1300 px edges stay within tolerance of the uncapped f64
    oracle.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ros_vision_tpu.ops import decode as dec  # noqa: E402

FX, FY = 900.0, 905.0
CX, CY = 640.0, 400.0

# the supported calibration envelope: the soak palette (scripts/soak.py)
# plus a deliberately harsher worst case (strong barrel + real tangential
# + k3 — beyond any calibration artifact the rig produces)
ENVELOPE = [
    (-0.25, 0.08, 0.0, 0.0, 0.0),
    (-0.12, 0.03, 0.0, 0.0, 0.0),
    (0.08, -0.02, 0.0, 0.0, 0.0),
    (-0.35, 0.12, 0.01, 0.01, 0.02),
]


def _undistort_f64_fixpoint(px, py, dist, iters=100, eps=1e-6):
    """The reference's UndistortPoint loop: f64, up to `iters` iterations,
    early exit at eps (apriltag_detect.cu:22-23) — the parity oracle."""
    k1, k2, p1, p2, k3 = dist
    x0 = (px - CX) / FX
    y0 = (py - CY) / FY
    x, y = x0.copy(), y0.copy()
    for _ in range(iters):
        r2 = x * x + y * y
        rad = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        xn = (x0 - dx) / rad
        yn = (y0 - dy) / rad
        if max(np.abs(xn - x).max(), np.abs(yn - y).max()) < eps:
            x, y = xn, yn
            break
        x, y = xn, yn
    return x * FX + CX, y * FY + CY


@pytest.mark.parametrize("dist", ENVELOPE)
def test_undistort_25iter_matches_f64_fixpoint(dist):
    # sample the full frame including the corners (strongest distortion)
    xs = np.linspace(0.0, 1280.0, 9)
    ys = np.linspace(0.0, 800.0, 7)
    px, py = np.meshgrid(xs, ys)
    rx, ry = _undistort_f64_fixpoint(px, py, dist)

    ux, uy = dec._undistort(jnp.asarray(px[None], jnp.float32),
                            jnp.asarray(py[None], jnp.float32),
                            (FX, FY, CX, CY),
                            jnp.asarray(dist, jnp.float32))
    err = max(float(np.abs(np.asarray(ux)[0] - rx).max()),
              float(np.abs(np.asarray(uy)[0] - ry).max()))
    # converged: residual is f32 rounding (~1e-3 px at 1280 px coords),
    # two orders below quadfit's observed sub-0.1 px corner error
    assert err < 5e-3, (dist, err)

    # and 25 f64 iterations sit within the reference's OWN convergence
    # tolerance of the 100-iter fixpoint (eps 1e-6 in normalized coords
    # = ~9e-4 px at fx 900), proving the iteration count has converged
    # to reference precision, not just f32 luck
    rx25, ry25 = _undistort_f64_fixpoint(px, py, dist, iters=25, eps=0.0)
    it_err = max(np.abs(rx25 - rx).max(), np.abs(ry25 - ry).max())
    assert it_err < 1e-6 * max(FX, FY), (dist, it_err)


def test_refine_grid_covers_long_edges():
    """The 128-sample tier spans the WHOLE edge for any length: the
    sample positions alpha=(1+s)/(ns+1) cover (0,1) uniformly when ns
    saturates at 128, so >1024 px edges lose density, never coverage."""
    n_alpha = dec.REFINE_ALPHA_TIERS[-1]
    mag = 1600.0  # a tag nearly filling a 1080p frame
    ns = min(max(16.0, np.floor(mag / 8.0)), n_alpha)
    assert ns == n_alpha
    s = np.arange(n_alpha)
    alpha = (1.0 + s) / (ns + 1)
    assert alpha[0] < 0.01 and alpha[-1] > 0.99


def test_refine_edges_beyond_1024px_end_to_end():
    """A tag with ~1300 px edges (past the 1024 px density cap): device
    corners must stay within 0.2 px of the uncapped f64 oracle."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)

    w, h = 1920, 1920  # square canvas: a >1024 px tag + quiet zone
    # cannot fit a 1080p frame's height, and the sampling cap is a
    # function of EDGE length only
    img, placed = render_scene(
        [17], [simple_square_corners(960, 960, 560, angle_deg=8)],
        w, h, noise_sigma=0.5)
    edge = np.linalg.norm(placed[0].corners[1] - placed[0].corners[0])
    assert edge > 1024, edge

    ores = OracleDetector().detect(img).detections
    assert [d.tag_id for d in ores] == [17]
    det = TPUDetector(DetectorConfig(width=w, height=h, fx=1400.0,
                                     fy=1400.0, cx=960.0, cy=960.0))
    dets = det.detect(img)
    assert [d.tag_id for d in dets] == [17]
    delta = np.abs(np.asarray(dets[0].corners) - ores[0].corners).max()
    assert delta < 0.2, delta


def test_auto_max_points_recall_at_cliff_edge():
    """VERDICT r4 #5: pin the auto max_points rule's recall margin with a
    saturating scene IN-SUITE (the broader per-resolution sweep lives in
    scripts/sweep_max_points.py). At 640x480 the auto rule picks 16384; a
    heavy-noise 4-tag scene must (a) genuinely overflow a half-capacity
    detector (so uniform thinning is actually exercised) and (b) keep
    full recall at the auto capacity."""
    import numpy as np

    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, quadfit
    from ros_vision_tpu.ops import threshold as thr

    W, H = 640, 480
    img, placed = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(150, 125, 45),
         simple_square_corners(430, 150, 55, angle_deg=20),
         simple_square_corners(200, 340, 40, angle_deg=-35),
         simple_square_corners(480, 360, 42, angle_deg=50)],
        W, H, noise_sigma=3.5)

    det = TPUDetector(DetectorConfig(
        width=W, height=H, fx=600.0, fy=600.0, cx=320.0, cy=240.0))
    auto_k = det.config.max_points
    assert auto_k == 16384        # dp//8 rule at 640x480 (floor 16384)

    # true boundary-point demand of the scene (uncapped probe at the
    # auto capacity's own slots: count reports demand, not kept points)
    import jax

    @jax.jit
    def demand(g):
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        _, _, ranks = ccl.label_components(t)     # XLA path (CPU suite)
        _, counts = quadfit.boundary_points(
            t, ranks, det._qcfg)
        return counts

    dem = int(np.asarray(demand(img[None])).max())
    assert dem > auto_k // 2, dem   # the scene saturates a half-K detector

    got = sorted(d.tag_id for d in det.detect(img[None])[0])
    assert got == [0, 42, 100, 311], got
