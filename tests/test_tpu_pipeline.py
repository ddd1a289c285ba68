"""TPU pipeline stage + end-to-end parity tests against the CPU oracle.

Mirrors the reference's stage-tap testing strategy (GpuDetector::Copy*To,
apriltag_gpu.h:98-183): every intermediate of the device pipeline is compared
against the oracle's intermediates. Runs on the CPU backend (conftest forces
JAX_PLATFORMS=cpu with 8 virtual devices); small frames keep XLA compile
times manageable.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ros_vision_tpu.apriltag import oracle as orc
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners
from ros_vision_tpu.ops import ccl, quadfit, threshold as thr

W, H = 320, 160  # small test frames


@pytest.fixture(scope="module")
def scene():
    # both tags rotated: an EXACTLY axis-aligned synthetic tag at integer
    # coordinates puts refine_edges sample points exactly ON the int()
    # truncation discontinuity, where the f64 oracle itself sits 1e-13 from
    # the boundary — corner parity there is ill-posed for any f32 pipeline
    # (and impossible for real camera geometry). Generic poses give a
    # well-posed <0.1 px corner-parity bound.
    img, placed = render_scene(
        [3, 77], [simple_square_corners(80, 60, 34, angle_deg=-7),
                  simple_square_corners(220, 90, 40, angle_deg=25)],
        W, H)
    return img, placed


def test_threshold_parity(scene):
    img, _ = scene
    decim = img[::2, ::2]
    o_thr, _, _ = orc.adaptive_threshold(decim)
    t_thr, _ = thr.adaptive_threshold(jnp.asarray(decim)[None])
    assert np.array_equal(o_thr, np.asarray(t_thr[0]))


def test_ccl_parity(scene):
    img, _ = scene
    decim = img[::2, ::2]
    o_thr, _, _ = orc.adaptive_threshold(decim)
    labels, _ = orc.connected_components(o_thr)
    h, w = o_thr.shape
    flat = np.arange(h * w).reshape(h, w)
    canon = np.full(labels.max() + 1, 1 << 30, np.int64)
    np.minimum.at(canon, labels.ravel(), flat.ravel())
    o_canon = canon[labels]
    t_labels, t_sizes, _ = ccl.label_components(jnp.asarray(o_thr)[None])
    t_labels = np.asarray(t_labels[0]).reshape(h, w)
    mask = o_thr != 127
    assert np.array_equal(o_canon[mask], t_labels[mask])
    o_sz = np.bincount(labels.ravel())
    t_sizes = np.asarray(t_sizes[0]).reshape(h, w)
    assert np.array_equal(o_sz[labels][mask], t_sizes[mask])


def test_quadfit_parity(scene):
    img, _ = scene
    ores = orc.OracleDetector().detect(img)
    g = jnp.asarray(img)[None]
    cfg = quadfit.QuadFitConfig(max_points=4096, max_segments=64,
                                max_quads=8)

    @jax.jit
    def pipe(g):
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        labels, sizes, ranks = ccl.label_components(t)
        pts, counts = quadfit.boundary_points(t, ranks, cfg)
        out = quadfit.cluster_and_fit(pts, decim, cfg)
        return counts, out["n_quads"], out["corners"]

    counts, nq, corners = jax.tree_util.tree_map(np.asarray, pipe(g))
    o_total = sum(len(v) for v in ores.clusters.values())
    assert counts[0] == o_total
    assert nq[0] == len(ores.quads)
    oq = np.array(sorted(np.asarray(q).flatten().tolist()
                         for q in ores.quads))
    tq = np.array(sorted(corners[0, i].flatten().tolist()
                         for i in range(nq[0])))
    assert np.abs(oq - tq).max() < 1e-3


@pytest.fixture(scope="module")
def tpu_detector():
    from ros_vision_tpu.apriltag.detector import TPUDetector, DetectorConfig
    return TPUDetector(DetectorConfig(
        width=W, height=H, max_points=4096, max_segments=64, max_quads=8,
        fx=300.0, fy=300.0, cx=160.0, cy=80.0, estimate_pose=True))


def test_end_to_end_parity(scene, tpu_detector):
    img, placed = scene
    ores = orc.OracleDetector(fx=300.0, fy=300.0, cx=160.0, cy=80.0,
                              estimate_pose=True).detect(img)
    dets = tpu_detector.detect(img)
    assert [d.tag_id for d in dets] == [d.tag_id for d in ores.detections]
    for d, o in zip(dets, ores.detections):
        assert d.hamming == o.hamming == 0
        # refine_edges now uses the reference's length-adaptive sample
        # count (max(16, len/8)) -> corner parity vs the f64 oracle is
        # tight; remaining delta is f32 accumulation
        assert np.abs(d.corners - o.corners).max() < 0.1
        truth = next(p.corners for p in placed if p.tag_id == d.tag_id)
        assert np.abs(d.corners[::-1] - truth).max() < 0.5
        assert abs(d.decision_margin - o.decision_margin) < 2.0
        assert np.abs(d.pose_t - o.pose_t).max() < 0.01


def test_batched_detection(scene, tpu_detector):
    img, _ = scene
    img2, _ = render_scene([123], [simple_square_corners(160, 80, 36, 10)],
                           W, H)
    blank = np.full((H, W), 128, np.uint8)
    batch = np.stack([img, img2, blank])
    res = tpu_detector.detect(batch)
    assert [d.tag_id for d in res[0]] == [3, 77]
    assert [d.tag_id for d in res[1]] == [123]
    assert res[2] == []


def test_blank_and_saturated_frames(tpu_detector):
    """Degenerate inputs must give empty output without NaN/crash (the
    no-tags golden assertion, generalized)."""
    for val in (0, 127, 255):
        frame = np.full((H, W), val, np.uint8)
        assert tpu_detector.detect(frame) == []


def test_non_multiple16_rows():
    """Heights whose decimated row count isn't divisible by the interleave
    must still work (adaptive interleave; e.g. 1080p -> 540 rows)."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    img, _ = render_scene([11], [simple_square_corners(160, 80, 30)],
                          320, 168)
    det = TPUDetector(DetectorConfig(
        width=320, height=168, max_points=4096, max_segments=64,
        max_quads=8))
    assert [d.tag_id for d in det.detect(img)] == [11]


def test_detect_yuyv(tpu_detector):
    img, _ = render_scene([42], [simple_square_corners(160, 80, 36)], W, H)
    yuyv = np.full((H, 2 * W), 128, np.uint8)
    yuyv[:, ::2] = img          # Y bytes carry the gray image
    dets = tpu_detector.detect_yuyv(yuyv)
    assert [d.tag_id for d in dets] == [42]


def test_per_camera_intrinsics(tpu_detector):
    """Identical frames with different per-row focal lengths must yield
    correspondingly different pose depths (each camera carries its own
    calibration, as in the reference's per-serial calibration files)."""
    img, _ = render_scene([42], [simple_square_corners(160, 80, 36)], W, H)
    batch = np.stack([img, img])
    intr = tpu_detector.default_intrinsics(2)
    intr[1, 0] *= 2.0    # camera 1: doubled fx
    intr[1, 1] *= 2.0
    res = tpu_detector.detect(batch, intrinsics=intr)
    t0 = res[0][0].pose_t
    t1 = res[1][0].pose_t
    # doubled focal length -> same pixels imply ~double the distance
    assert 1.8 < t1[2] / t0[2] < 2.2
