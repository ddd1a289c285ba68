"""Parity tests for the fused Pallas frontend (ops/frontend_pallas.py):
interpret-mode kernels must match the XLA reference path bit-for-bit —
rank_image vs ccl.label_components_flood ranks, boundary_compact vs
quadfit.boundary_points, on both non-overflowing and overflowing scenes."""
import jax.numpy as jnp
import numpy as np
import pytest

from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners
from ros_vision_tpu.ops import ccl, frontend_pallas as fp, quadfit
from ros_vision_tpu.ops import threshold as thr


@pytest.fixture(scope="module")
def small_scene():
    img, _ = render_scene(
        [0, 42], [simple_square_corners(60, 60, 40),
                  simple_square_corners(180, 70, 45, angle_deg=25)],
        256, 128, noise_sigma=2.0)
    g = jnp.asarray(img)[None]
    threshim = thr.adaptive_threshold(thr.decimate2(g))[0]
    return threshim                           # (1, 64, 128)


def test_rank_image_parity(small_scene):
    threshim = small_scene
    _, _, ranks_ref = ccl.label_components_flood(threshim, interpret=True)
    ranks = fp.rank_image(threshim, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ranks).reshape(ranks.shape[0], -1),
        np.asarray(ranks_ref))


def test_rank_image_pad_width_parity():
    """Non-lane-aligned widths (w % 128 != 0, the 1080p-decimated case)
    go through the in-kernel 127-column padding — ranks must equal the
    XLA path's exactly."""
    img, _ = render_scene(
        [0, 42], [simple_square_corners(60, 56, 36),
                  simple_square_corners(150, 60, 38, angle_deg=30)],
        384, 104, noise_sigma=2.0)
    threshim = thr.adaptive_threshold(thr.decimate2(jnp.asarray(img)[None]))[0]
    assert threshim.shape[2] % 128 != 0         # (1, 52, 192)
    assert threshim.shape[1] % 8 != 0
    _, _, ranks_ref = ccl.label_components(threshim)
    ranks = fp.rank_image(threshim, interpret=True)
    assert ranks.shape == threshim.shape
    np.testing.assert_array_equal(
        np.asarray(ranks).reshape(ranks.shape[0], -1),
        np.asarray(ranks_ref))


def test_rank_image_split_u8_parity(small_scene):
    """The split-u8 output mode (two u8 planes, production frontend())
    must reassemble to exactly the int32 rank plane."""
    threshim = small_scene
    ranks = fp.rank_image(threshim, interpret=True)
    rhi, rlo = fp.rank_image(threshim, split_u8=True, interpret=True)
    assert rhi.dtype == jnp.uint8 and rlo.dtype == jnp.uint8
    re = (rhi.astype(jnp.int32) << 8) | rlo.astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(re), np.asarray(ranks))


@pytest.mark.parametrize("p_cap,k_cap", [
    (1536, 2048),      # no overflow at either stage
    (256, 2048),       # stage-A overflow (pixel thinning)
    (1536, 384),       # stage-B overflow (point thinning)
    (192, 256),        # both overflow
])
def test_boundary_compact_parity(small_scene, p_cap, k_cap):
    threshim = small_scene
    b, h, w = threshim.shape
    _, _, ranks_ref = ccl.label_components_flood(threshim, interpret=True)
    pts_ref, counts_ref = _boundary_ref(threshim, ranks_ref, p_cap, k_cap)

    ranks_img = jnp.asarray(np.asarray(ranks_ref)).reshape(b, h, w)
    key, pack2, counts = fp.boundary_compact(
        threshim, ranks_img, p_cap, k_cap, interpret=True)
    assert np.array_equal(np.asarray(counts), np.asarray(counts_ref))
    np.testing.assert_array_equal(np.asarray(key)[:, :k_cap],
                                  np.asarray(pts_ref["key"]))
    np.testing.assert_array_equal(np.asarray(pack2)[:, :k_cap],
                                  np.asarray(pts_ref["pack2"]))
    assert (np.asarray(key)[:, k_cap:] == quadfit.KEY_INVALID).all()




def _boundary_ref(threshim, ranks, p_cap, k_cap):
    """quadfit.boundary_points with an explicit stage-A cap (the config
    property pins it to 3k/4; these tests need arbitrary caps, so the two
    stages are mirrored inline)."""
    from ros_vision_tpu.ops import segments as segs
    b, h, w = threshim.shape
    n = h * w
    rimg = ranks.reshape(b, h, w)
    maskbits, keyimg = quadfit.boundary_masks(threshim, rimg)
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    pxy = ((ys[:, None] << 11) | xs[None, :]) + jnp.zeros((b, h, w),
                                                          jnp.int32)
    from ros_vision_tpu.ops.frontend_pallas import boundary_block_rows
    br = boundary_block_rows(p_cap, w)
    p_cap = br * w
    valid_a = (maskbits & 0xF).reshape(b, n) != 0
    keep_a, _ = segs.thin_uniform(valid_a, p_cap)
    pm, _ = segs.compact_monotone(
        keep_a, ((pxy << 8) | maskbits).reshape(b, n), p_cap,
        jnp.int32(-1))
    pvalid = pm >= 0
    pix = jnp.where(pvalid, ((pm >> 19) & 0x7FF) * w + ((pm >> 8) & 0x7FF),
                    0)
    dvalid = jnp.stack([pvalid & (((pm >> d) & 1) > 0) for d in range(4)],
                       axis=1)
    gbits = jnp.stack([(pm >> (4 + d)) & 1 for d in range(4)], axis=1)
    pp = (pm >> 8) & ((1 << 22) - 1)
    cand = (jnp.broadcast_to(((pp >> 11) << 14 | (pp & 0x7FF) << 3)
                             [:, None, :], (b, 4, br * w))
            | (gbits << 2) | jnp.arange(4, dtype=jnp.int32)[None, :, None])
    keyp = jnp.take_along_axis(keyimg.reshape(b, 4, n),
                               pix[:, None, :], axis=2)
    keep_b, _ = segs.thin_uniform(dvalid.reshape(b, -1), k_cap)
    pts, counts = segs.compact(
        keep_b, {"pgd": cand.reshape(b, -1), "key": keyp.reshape(b, -1)},
        k_cap, {"pgd": jnp.int32(-1), "key": jnp.int32(quadfit.KEY_INVALID)})
    return quadfit.finish_points(pts["pgd"], pts["key"], w), counts


def test_detector_fused_frontend_parity():
    """Detector-level: forcing the fused frontend on a small config gives
    the same detections as the XLA path (CPU, interpret-mode kernels)."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    img, _ = render_scene(
        [3, 17], [simple_square_corners(70, 60, 44),
                  simple_square_corners(180, 68, 40, angle_deg=-15)],
        256, 128, noise_sigma=1.0)
    kw = dict(width=256, height=128, fx=220.0, fy=220.0, cx=128.0, cy=64.0,
              max_points=4096, max_segments=256, max_quads=32,
              estimate_pose=True)
    det_ref = TPUDetector(DetectorConfig(use_fused_frontend=False, **kw))
    det_fused = TPUDetector(DetectorConfig(use_fused_frontend=True, **kw))
    det_rank = TPUDetector(DetectorConfig(use_fused_frontend="rank", **kw))
    r_ref = det_ref.detect(img)
    r_fused = det_fused.detect(img)
    r_rank = det_rank.detect(img)
    assert [d.tag_id for d in r_fused] == [d.tag_id for d in r_ref] == [3, 17]
    assert [d.tag_id for d in r_rank] == [3, 17]
    for a, rk, c in zip(r_fused, r_rank, r_ref):
        np.testing.assert_allclose(a.corners, c.corners, atol=1e-5)
        np.testing.assert_allclose(a.pose_t, c.pose_t, atol=1e-5)
        # rank mode = rank_image CCL + XLA boundary: same detections
        np.testing.assert_allclose(rk.corners, c.corners, atol=1e-5)
        np.testing.assert_allclose(rk.pose_t, c.pose_t, atol=1e-5)


def test_frontend_matches_full_path(small_scene):
    """End-to-end: frontend() == label_components_flood + boundary_points
    with the production cap ratio."""
    threshim = small_scene
    k_cap = 1024
    cfg = quadfit.QuadFitConfig(max_points=k_cap)
    _, _, ranks_ref = ccl.label_components_flood(threshim, interpret=True)
    pts_ref, counts_ref = quadfit.boundary_points(threshim, ranks_ref, cfg)
    pts, counts = fp.frontend(threshim, k_cap, cfg.max_boundary_pixels,
                              interpret=True)
    assert np.array_equal(np.asarray(counts), np.asarray(counts_ref))
    np.testing.assert_array_equal(np.asarray(pts["key"])[:, :k_cap],
                                  np.asarray(pts_ref["key"]))
    np.testing.assert_array_equal(np.asarray(pts["pack2"])[:, :k_cap],
                                  np.asarray(pts_ref["pack2"]))
