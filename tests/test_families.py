"""Tag family table tests.

Validates the committed family data against the families' published
guarantees, and cross-checks the renderer against OpenCV's aruco detector
(an independent implementation of 36h11 detection — the same role the CPU
apriltag library plays as oracle in the reference's gpu_detector_test.cu).
"""
import numpy as np
import pytest

from ros_vision_tpu.apriltag import get_family, list_families
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners


def popcount64(x):
    x = np.asarray(x, np.uint64).copy()
    c = np.zeros(x.shape, np.int64)
    for _ in range(64):
        c += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
        if not x.any():
            break
    return c


def test_families_present():
    assert set(list_families()) >= {"tag36h11", "tag25h9", "tag16h5"}


@pytest.mark.parametrize("name,n,h", [("tag36h11", 587, 11), ("tag25h9", 35, 9),
                                      ("tag16h5", 30, 5)])
def test_family_shape(name, n, h):
    fam = get_family(name)
    assert fam.n_codes == n
    assert fam.min_hamming == h
    assert fam.codes.shape == (n, 4)


def test_36h11_min_hamming_subsample():
    fam = get_family("tag36h11")
    flat = fam.codes.flatten()
    # spot-check a subsample (full check done at extraction time)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(flat), 64, replace=False)
    minh = 64
    for i in idx:
        ham = popcount64(flat ^ flat[i])
        ham[i] = 64
        minh = min(minh, int(ham.min()))
    assert minh >= 11


def test_rotation_consistency():
    fam = get_family("tag36h11")
    for tag_id in (0, 1, 100, 586):
        g0 = fam.code_grid(tag_id, 0)
        for r in range(1, 4):
            assert np.array_equal(fam.code_grid(tag_id, r), np.rot90(g0, r))


def test_render_roundtrip_against_opencv():
    cv2 = pytest.importorskip("cv2")
    fam = get_family("tag36h11")
    ids = [0, 42, 311]
    corners = [
        simple_square_corners(300, 250, 90),
        simple_square_corners(800, 400, 110, angle_deg=20),
        simple_square_corners(450, 600, 70, angle_deg=-35),
    ]
    img, placed = render_scene(ids, corners, 1280, 800)
    assert len(placed) == 3
    det = cv2.aruco.ArucoDetector(
        cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11))
    found_corners, found_ids, _ = det.detectMarkers(img)
    assert found_ids is not None
    assert sorted(found_ids.flatten().tolist()) == sorted(ids)
    # Corner accuracy: aruco corners are the outer black border corners
    for fid, fc in zip(found_ids.flatten(), found_corners):
        want = next(p.corners for p in placed if p.tag_id == fid)
        got = fc.reshape(4, 2)
        # match regardless of starting corner/winding
        d = min(
            np.abs(np.roll(got, k, axis=0) - want).max() for k in range(4))
        # aruco's default corner localization is ~pixel-accurate
        assert d < 1.5, f"corner mismatch for tag {fid}: {d}"


def test_tag36h10_family():
    fam = get_family("tag36h10")
    assert fam.n_codes == 2320 and fam.min_hamming == 10
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    img, _ = render_scene([1500], [simple_square_corners(160, 80, 40)],
                          320, 160, family=fam)
    res = OracleDetector(family="tag36h10").detect(img)
    assert [(d.tag_id, d.hamming) for d in res.detections] == [(1500, 0)]
