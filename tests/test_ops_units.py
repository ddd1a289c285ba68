"""Unit tests for the TPU op primitives (scan, segments, Pallas threshold,
pose math)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ros_vision_tpu.ops import scan, segments as segs


def test_cumsum_mxu_exact_counts():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 2, (2, 5000)).astype(np.float32)
    got = np.asarray(scan.cumsum_mxu(jnp.asarray(v)))
    want = np.cumsum(v, axis=1)
    assert np.array_equal(got, want)


def test_cumsum_mxu_float_accuracy():
    rng = np.random.default_rng(1)
    v = rng.normal(0, 10, (1, 3, 4096)).astype(np.float32)
    got = np.asarray(scan.cumsum_mxu(jnp.asarray(v)))
    want = np.cumsum(v.astype(np.float64), axis=-1)
    assert np.abs(got - want).max() < 1e-2


def test_segmented_cumsum_from_starts():
    rng = np.random.default_rng(2)
    k = 1024
    v = rng.normal(size=(1, k, 3)).astype(np.float32)
    starts_idx = np.zeros((1, k), np.int32)
    seg_bounds = sorted(rng.choice(np.arange(1, k), 7, replace=False))
    bounds = [0] + list(seg_bounds) + [k]
    for a, b in zip(bounds[:-1], bounds[1:]):
        starts_idx[0, a:b] = a
    got = np.asarray(scan.segmented_cumsum_from_starts(
        jnp.asarray(v), jnp.asarray(starts_idx)))
    want = np.zeros_like(v)
    for a, b in zip(bounds[:-1], bounds[1:]):
        want[0, a:b] = np.cumsum(v[0, a:b], axis=0)
    assert np.abs(got - want).max() < 1e-3


def test_segmented_cumsum_flagged():
    # the log-depth flagged variant (segment-local precision), kept as an
    # alternative to scan.segmented_cumsum_from_starts
    rng = np.random.default_rng(4)
    v = rng.normal(size=(1, 256, 2)).astype(np.float32)
    starts = np.zeros((1, 256), bool)
    starts[0, [0, 50, 200]] = True
    got = np.asarray(segs.segmented_cumsum(jnp.asarray(v),
                                           jnp.asarray(starts)))
    want = np.zeros_like(v)
    for a, b in zip([0, 50, 200], [50, 200, 256]):
        want[0, a:b] = np.cumsum(v[0, a:b], axis=0)
    assert np.abs(got - want).max() < 1e-4


def test_compact():
    valid = jnp.asarray([[False, True, False, True, True, False, True]])
    payload = {"x": jnp.arange(7)[None] * 10}
    out, counts = segs.compact(valid, payload, k=3,
                               fill={"x": jnp.int32(-1)})
    assert counts[0] == 3
    assert np.asarray(out["x"][0]).tolist() == [10, 30, 40]  # first K kept


def test_segment_ids():
    lo = jnp.asarray([[1, 1, 2, 2, 2, 9]])
    hi = jnp.asarray([[5, 5, 5, 6, 6, 9]])
    valid = jnp.asarray([[True] * 5 + [False]])
    seg = segs.segment_ids_from_sorted_keys(lo, hi, valid=valid,
                                            max_segments=4)
    assert np.asarray(seg[0]).tolist() == [0, 0, 1, 2, 2, 4]


def test_pallas_threshold_interpret():
    from ros_vision_tpu.apriltag import oracle as orc
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops.threshold_pallas import adaptive_threshold_fused
    img, _ = render_scene([7], [simple_square_corners(80, 60, 34)],
                          320, 160, noise_sigma=5)
    o_thr, _, _ = orc.adaptive_threshold(img[::2, ::2])
    d, t = adaptive_threshold_fused(jnp.asarray(img)[None], interpret=True)
    assert np.array_equal(np.asarray(d[0]), img[::2, ::2])
    assert np.array_equal(np.asarray(t[0]), o_thr)


def test_pallas_threshold_interpret_production_batch():
    """Production-resolution (1280x800) batched parity vs the XLA path —
    exercises the whole-frame grid and both output planes per frame."""
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import threshold as thr
    from ros_vision_tpu.ops.threshold_pallas import adaptive_threshold_fused
    img1, _ = render_scene([7, 42], [simple_square_corners(300, 250, 90),
                                     simple_square_corners(800, 400, 110,
                                                           angle_deg=20)],
                           1280, 800, noise_sigma=3)
    img2, _ = render_scene([0], [simple_square_corners(450, 600, 70,
                                                       angle_deg=-35)],
                           1280, 800, noise_sigma=1)
    g = jnp.stack([jnp.asarray(img1), jnp.asarray(img2)])
    decim_ref = thr.decimate2(g)
    thr_ref, _ = thr.adaptive_threshold(decim_ref)
    d, t = adaptive_threshold_fused(g, interpret=True)
    assert np.array_equal(np.asarray(d), np.asarray(decim_ref))
    assert np.array_equal(np.asarray(t), np.asarray(thr_ref))


def test_ccl_hybrid_interpret_matches_xla():
    """The Pallas-accelerated hybrid CCL (interpret mode on CPU) must agree
    exactly with the XLA CCL: labels, sizes and dense big-blob ranks."""
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl
    from ros_vision_tpu.ops import threshold as thr
    img, _ = render_scene([3, 11], [simple_square_corners(60, 60, 34),
                                    simple_square_corners(180, 80, 40)],
                          256, 128, noise_sigma=3)
    t, _ = thr.adaptive_threshold(thr.decimate2(jnp.asarray(img)[None]))
    l1, s1, r1 = ccl.label_components(t)
    l2, s2, r2 = ccl.label_components_hybrid(t, pallas_sweeps=96,
                                             verify_sweeps=16,
                                             interpret=True)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))


def test_polar_rotation():
    from ros_vision_tpu.ops.pose import polar_rotation
    rng = np.random.default_rng(3)
    # noisy near-rotations -> nearest rotation
    from scipy.spatial.transform import Rotation
    R = Rotation.random(8, random_state=1).as_matrix().astype(np.float32)
    noisy = R + rng.normal(0, 0.05, R.shape).astype(np.float32)
    P = np.asarray(polar_rotation(jnp.asarray(noisy)))
    # orthonormal, det +1, close to the original
    for i in range(8):
        assert np.abs(P[i] @ P[i].T - np.eye(3)).max() < 1e-4
        assert abs(np.linalg.det(P[i]) - 1) < 1e-4
        assert np.abs(P[i] - R[i]).max() < 0.15


def test_ccl_flood_interpret_matches_xla():
    """Stride-ladder fixpoint flood (the default TPU CCL) must match the
    XLA reference labeling exactly, including sizes and ranks."""
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, threshold as thr
    img, _ = render_scene(
        [3, 9], [simple_square_corners(70, 60, 34),
                 simple_square_corners(190, 90, 30, angle_deg=40)],
        256, 160, noise_sigma=2.0, seed=5)
    t = thr.adaptive_threshold(thr.decimate2(jnp.asarray(img[None])))[0]
    l1, s1, r1 = ccl.label_components(t)
    l2, s2, r2 = ccl.label_components_flood(t, interpret=True)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))


def test_gather_pallas_kernels_interpret():
    """One-hot MXU histogram/table-gather == jnp reference semantics
    (bit-exact; used for segment count tables in ops/quadfit.py)."""
    from ros_vision_tpu.ops import gather_pallas as gp
    rng = np.random.default_rng(0)
    b, k, s, c = 3, 4096, 1025, 4
    idx = jnp.asarray(rng.integers(0, s, (b, k)), jnp.int32)
    tbl = jnp.asarray(rng.random((b, s, c), np.float32))
    got = gp.value_histogram(idx, s, interpret=True)
    assert np.array_equal(np.asarray(got),
                          np.asarray(gp.value_histogram_ref(idx, s)))
    got2 = gp.table_take_cm(tbl, idx, interpret=True)
    assert np.array_equal(np.asarray(got2),
                          np.asarray(gp.table_take_cm_ref(tbl, idx)))


def test_label_histogram_interpret():
    from ros_vision_tpu.ops import ccl_pallas
    rng = np.random.default_rng(1)
    b, n = 2, 5000
    lab = jnp.asarray(rng.integers(0, n, (b, n)), jnp.int32)
    got = np.asarray(ccl_pallas.label_histogram(lab, interpret=True))
    want = np.stack([np.bincount(np.asarray(lab)[i], minlength=n)
                     for i in range(b)])
    assert np.array_equal(got, want)


def test_segment_min_max_matches_ref():
    import numpy as np
    from ros_vision_tpu.ops import gather_pallas as gp
    rng = np.random.default_rng(3)
    b, k, s = 2, 4096, 300
    seg = jnp.asarray(rng.integers(0, s, (b, k)), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2000, (b, k)), jnp.int32)
    mn, mx = gp.segment_min_max(seg, val, s, interpret=True)
    rmn, rmx = gp.segment_min_max_ref(seg, val, s)
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(rmn))
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(rmx))


def test_pick_tile_divides():
    from ros_vision_tpu.ops.gather_pallas import _pick_tile
    for k in (131072, 131200, 4096, 2048, 1000, 96, 7):
        t = _pick_tile(k)
        assert k % t == 0 and t <= 2048, (k, t)


def test_pack_outputs_roundtrip():
    import numpy as np
    from ros_vision_tpu.apriltag.detector import pack_outputs, unpack_outputs
    rng = np.random.default_rng(5)
    b, nq = 2, 8
    out = {
        "ok": jnp.asarray(rng.integers(0, 2, (b, nq)) > 0),
        "tag_id": jnp.asarray(rng.integers(0, 587, (b, nq)), jnp.int32),
        "hamming": jnp.asarray(rng.integers(0, 3, (b, nq)), jnp.int32),
        "margin": jnp.asarray(rng.normal(40, 5, (b, nq)), jnp.float32),
        "H": jnp.asarray(rng.normal(0, 1, (b, nq, 3, 3)), jnp.float32),
        "corners": jnp.asarray(rng.uniform(0, 1280, (b, nq, 4, 2)),
                               jnp.float32),
        "centers": jnp.asarray(rng.uniform(0, 1280, (b, nq, 2)),
                               jnp.float32),
        "pose_R": jnp.asarray(rng.normal(0, 1, (b, nq, 3, 3)), jnp.float32),
        "pose_t": jnp.asarray(rng.normal(0, 1, (b, nq, 3)), jnp.float32),
        "pose_err": jnp.asarray(rng.uniform(0, 1, (b, nq)), jnp.float32),
    }
    rt = unpack_outputs(np.asarray(pack_outputs(out)))
    for k, v in out.items():
        np.testing.assert_array_equal(rt[k], np.asarray(v), err_msg=k)


def test_rank_gather_matches_take():
    import numpy as np
    from ros_vision_tpu.ops import gather_pallas as gp
    rng = np.random.default_rng(11)
    b, n = 2, 8192
    labels = jnp.asarray(rng.integers(0, n, (b, n)), jnp.int32)
    rank_v = jnp.asarray(rng.integers(0, 2048, (b, n)), jnp.int32)
    got = gp.rank_gather(labels, rank_v, interpret=True)
    want = jnp.take_along_axis(rank_v, labels, axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_flood_ranks_matches_full_flood():
    import numpy as np
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, threshold as thr
    img, _ = render_scene(
        [7, 99], [simple_square_corners(70, 60, 40),
                  simple_square_corners(180, 70, 42, angle_deg=30)],
        256, 128, noise_sigma=2.0)
    t = thr.adaptive_threshold(thr.decimate2(jnp.asarray(img)[None]))[0]
    _, _, ranks_ref = ccl.label_components_flood(t, interpret=True)
    ranks = ccl.flood_ranks(t, interpret=True)
    np.testing.assert_array_equal(np.asarray(ranks), np.asarray(ranks_ref))
