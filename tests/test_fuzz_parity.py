"""Randomized parity + robustness fuzzing.

Property: on any synthetic scene the TPU detector and the f64 oracle decode
the SAME tag ids with hamming 0; under distortion both must recover ids and
poses; tags with up to 2 corrupted data bits must still decode (the
reference decodes with bits_corrected = 2).
"""
import numpy as np
import pytest

from ros_vision_tpu.apriltag import geometry as geo
from ros_vision_tpu.apriltag.families import get_family
from ros_vision_tpu.apriltag.oracle import OracleDetector
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners

W, H = 320, 160
FX = FY = 300.0
CX, CY = 160.0, 80.0


@pytest.fixture(scope="module")
def tpu_det():
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    # max_points sized so no fuzz scene overflows the cap: corner parity vs
    # the oracle (which has no cap) is only meaningful without truncation;
    # overflow robustness is covered separately (test_point_overflow_recall)
    return TPUDetector(DetectorConfig(
        width=W, height=H, max_points=16384, max_segments=128, max_quads=16,
        fx=FX, fy=FY, cx=CX, cy=CY, estimate_pose=True))


def _random_scene(rng, n_tags):
    ids = rng.choice(587, n_tags, replace=False).tolist()
    corners = []
    xs = np.linspace(60, W - 60, n_tags)
    for i in range(n_tags):
        corners.append(simple_square_corners(
            xs[i] + rng.uniform(-10, 10), rng.uniform(55, H - 55),
            rng.uniform(22, 34), angle_deg=rng.uniform(-45, 45)))
    return render_scene(ids, corners, W, H,
                        noise_sigma=rng.uniform(0, 4),
                        background=int(rng.uniform(120, 220)),
                        seed=int(rng.integers(1 << 30)))


@pytest.mark.parametrize("seed", list(range(20)))
def test_fuzz_tpu_matches_oracle(seed, tpu_det):
    # 20 seeds in-suite; scripts/soak.py runs the full 126+-seed sweep with
    # identical scene generation and assertions
    rng = np.random.default_rng(seed)
    img, placed = _random_scene(rng, int(rng.integers(1, 4)))
    oracle = OracleDetector(fx=FX, fy=FY, cx=CX, cy=CY,
                            estimate_pose=True).detect(img)
    tpu = tpu_det.detect(img)
    o_ids = [d.tag_id for d in oracle.detections]
    t_ids = [d.tag_id for d in tpu]
    assert t_ids == o_ids, f"seed {seed}: tpu {t_ids} vs oracle {o_ids}"
    for td, od in zip(tpu, oracle.detections):
        assert td.hamming == od.hamming
        assert np.abs(td.corners - od.corners).max() < 1.0
        if td.pose_t is not None and od.pose_t is not None:
            assert np.abs(td.pose_t - od.pose_t).max() < 0.02


def test_distorted_end_to_end():
    """Render through a distorting lens; detector configured with the same
    calibration must recover ids and accurate poses (the reference's
    undistortion-aware RefineEdges + calibrated pose path)."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import project_tag_corners
    from scipy.spatial.transform import Rotation
    dist = np.array([-0.25, 0.08, 0.0, 0.0, 0.0])
    tag = 0.1651
    rot = Rotation.from_euler("xyz", [10, -15, 30], degrees=True).as_matrix()
    t = np.array([0.05, -0.02, 1.1])
    corners = project_tag_corners(rot, t, tag, FX, FY, CX, CY, dist=dist)
    img, _ = render_scene([77], [corners], W, H)

    det = TPUDetector(DetectorConfig(
        width=W, height=H, max_points=8192, max_segments=128, max_quads=16,
        fx=FX, fy=FY, cx=CX, cy=CY, dist=tuple(dist), estimate_pose=True))
    res = det.detect(img)
    assert [d.tag_id for d in res] == [77]
    d = res[0]
    # pose computed from undistorted corners
    und = geo.undistort_points(np.asarray(d.corners, np.float64),
                               FX, FY, CX, CY, dist)
    R, tt, err = geo.estimate_tag_pose(und, tag, FX, FY, CX, CY)
    assert np.linalg.norm(tt - t) < 0.02
    # device pose (computed on distorted corners, like the reference's
    # estimate_tag_pose call) is close for this distortion level
    assert np.linalg.norm(np.asarray(d.pose_t) - t) < 0.06


@pytest.mark.parametrize("tilt_deg", [60, 66, 72])
def test_shallow_angle_pose_ambiguity(tilt_deg, tpu_det):
    """Shallow viewing angles are exactly where the planar pose ambiguity
    bites (the two error minima approach each other): the device pose must
    pick the same basin as the f64 oracle (50-step orthogonal iteration +
    second-candidate search) and land near ground truth."""
    from ros_vision_tpu.apriltag.render import project_tag_corners
    from scipy.spatial.transform import Rotation
    tag = 0.1651
    for yaw in (0, 25):
        rot = Rotation.from_euler("xyz", [tilt_deg, yaw, 0],
                                  degrees=True).as_matrix()
        t = np.array([0.02, -0.05, 0.9])
        corners = project_tag_corners(rot, t, tag, FX, FY, CX, CY)
        img, _ = render_scene([5], [corners], W, H)
        res = tpu_det.detect(img)
        if not res:      # extreme foreshortening can kill the decode;
            continue     # that's a recall question, not an ambiguity one
        d = res[0]
        assert d.tag_id == 5
        assert np.abs(np.asarray(d.pose_t) - t).max() < 0.02, \
            f"tilt {tilt_deg} yaw {yaw}: {d.pose_t} vs {t}"
        # the z-axis (tag normal) must not have flipped into the mirror
        # solution: compare against ground truth rotation
        dotz = float(np.asarray(d.pose_R)[:, 2] @ rot[:, 2])
        assert dotz > 0.9, f"normal flipped: dot={dotz}"


@pytest.mark.parametrize("n_flips", [1, 2])
def test_corrupted_bits_decode(n_flips, tpu_det):
    """Flip n data modules of a rendered tag; must decode with
    hamming == n (bits_corrected = 2, apriltag_detector_add_family)."""
    fam = get_family()
    tag_id = 123
    rng = np.random.default_rng(7)
    img, _ = render_scene([tag_id], [simple_square_corners(160, 80, 40)],
                          W, H)
    # flip modules by repainting them: the tag spans 10 modules over 80 px
    # -> 8 px per module; data grid starts 1 module inside the border
    grid = fam.code_grid(tag_id)
    flips = rng.choice(36, n_flips, replace=False)
    for f in flips:
        gy, gx = divmod(int(f), 6)
        x0 = int(160 - 40 + (1 + gx) * 10)
        y0 = int(80 - 40 + (1 + gy) * 10)
        img[y0 + 2:y0 + 8, x0 + 2:x0 + 8] = 0 if grid[gy, gx] else 255
    res = tpu_det.detect(img)
    assert [d.tag_id for d in res] == [tag_id]
    assert res[0].hamming == n_flips


def test_long_edge_refine_parity():
    """Edges > 256 full-res px used to clip to the 32-sample refine cap;
    the 64-sample superset covers the reference's max(16, len/8) exactly
    up to 512 px. A near-full-frame tag (~340 px edges) must match the
    uncapped f64 oracle's corners tightly."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    bw, bh = 640, 480
    det = TPUDetector(DetectorConfig(
        width=bw, height=bh, max_points=65536, max_segments=256,
        max_quads=16, fx=600.0, fy=600.0, cx=320.0, cy=240.0,
        estimate_pose=True))
    oracle = OracleDetector(fx=600.0, fy=600.0, cx=320.0, cy=240.0,
                            estimate_pose=True)
    img, _ = render_scene(
        [11], [simple_square_corners(320, 240, 170, angle_deg=12.0)],
        bw, bh, noise_sigma=1.0, seed=5)
    t = det.detect(img)
    o = oracle.detect(img).detections
    assert [d.tag_id for d in t] == [d.tag_id for d in o] == [11]
    dc = float(np.abs(t[0].corners - o[0].corners).max())
    assert dc < 0.1, dc
    dp = float(np.abs(np.asarray(t[0].pose_t)
                      - np.asarray(o[0].pose_t)).max())
    assert dp < 5e-3, dp


def test_very_long_edge_refine_parity():
    """Edges > 512 full-res px overflow the 64-sample tier; the 128-sample
    tier covers the reference's max(16, len/8) exactly up to 1024 px. A
    tag filling most of a 1280x800 production frame (~680 px edges) must
    match the uncapped f64 oracle's corners tightly."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    bw, bh = 1280, 800
    det = TPUDetector(DetectorConfig(
        width=bw, height=bh, max_points=65536, max_segments=256,
        max_quads=16, fx=900.0, fy=900.0, cx=640.0, cy=400.0,
        estimate_pose=True))
    oracle = OracleDetector(fx=900.0, fy=900.0, cx=640.0, cy=400.0,
                            estimate_pose=True)
    img, _ = render_scene(
        [29], [simple_square_corners(640, 400, 340, angle_deg=8.0)],
        bw, bh, noise_sigma=1.0, seed=9)
    t = det.detect(img)
    o = oracle.detect(img).detections
    assert [d.tag_id for d in t] == [d.tag_id for d in o] == [29]
    dc = float(np.abs(t[0].corners - o[0].corners).max())
    assert dc < 0.1, dc
    dp = float(np.abs(np.asarray(t[0].pose_t)
                      - np.asarray(o[0].pose_t)).max())
    assert dp < 5e-3, dp


def test_junk_quad_knife_edge_scene():
    """Soak seed 6019 (the 1-in-10,000 parity event): at noise sigma 3.1 a
    pure-noise quad refines onto a bit pattern within hamming 2 of code
    284 on the f32 path but not the f64 oracle — refine on a junk quad is
    noise-chasing, so the two legitimately diverge there (the decode
    stages agree bit-for-bit on identical quads; measured margin 2.1 vs
    150-300 for real tags). Pin the material invariants: every rendered
    tag detected with hamming 0 and oracle-matching corners, and any
    extra detection carries a junk-level margin (< 10)."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    seed = 6019
    rng = np.random.default_rng(seed)
    n_tags = int(rng.integers(1, 4))
    ids = rng.choice(587, n_tags, replace=False).tolist()
    corners = []
    xs = np.linspace(60, 320 - 60, n_tags)
    for i in range(n_tags):
        corners.append(simple_square_corners(
            xs[i] + rng.uniform(-10, 10), rng.uniform(55, 160 - 55),
            rng.uniform(22, 34), angle_deg=rng.uniform(-45, 45)))
    img, _ = render_scene(ids, corners, 320, 160,
                          noise_sigma=rng.uniform(0, 4),
                          background=int(rng.uniform(120, 220)),
                          seed=int(rng.integers(1 << 30)))
    det = TPUDetector(DetectorConfig(
        width=320, height=160, max_points=16384, max_segments=128,
        max_quads=16, fx=300.0, fy=300.0, cx=160.0, cy=80.0,
        estimate_pose=True))
    oracle = OracleDetector(fx=300.0, fy=300.0, cx=160.0, cy=80.0,
                            estimate_pose=True)
    t = det.detect(img)
    o = {d.tag_id: d for d in oracle.detect(img).detections}
    got = {d.tag_id: d for d in t}
    assert set(ids) <= set(got), (ids, sorted(got))
    for tag_id in ids:
        assert got[tag_id].hamming == 0
        assert tag_id in o
        assert np.abs(got[tag_id].corners - o[tag_id].corners).max() < 1.0
    for d in t:
        if d.tag_id not in ids:
            assert d.decision_margin < 10.0, \
                (d.tag_id, d.decision_margin)
