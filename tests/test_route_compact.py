"""Parity of the XLA monotone-routing compaction vs the sort-based one.

compact_route must be bit-identical to segments.compact / compact_monotone
whenever (keep, tgt) come from thin_uniform — including overflow (thinned)
streams, empty streams, and full boundary_points at both stages.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_vision_tpu.ops import segments as segs


@pytest.mark.parametrize("m,k,density", [
    (1000, 256, 0.9),      # overflow: thinning active
    (1000, 2048, 0.3),     # underflow: everything kept
    (4096, 512, 0.02),     # sparse
    (513, 64, 1.0),        # dense, non-power-of-2 M
])
def test_compact_route_parity(m, k, density):
    rng = np.random.default_rng(m + k)
    b = 3
    valid = jnp.asarray(rng.random((b, m)) < density)
    pay = {"a": jnp.asarray(rng.integers(0, 1 << 28, (b, m)), jnp.int32),
           "b": jnp.asarray(rng.integers(-5, 1 << 20, (b, m)), jnp.int32)}
    fill = {"a": jnp.int32(-1), "b": jnp.int32(7)}
    keep, tgt = segs.thin_uniform(valid, k)
    want, wcnt = segs.compact(keep, pay, k, fill)
    got, gcnt = segs.compact_route(keep, tgt, pay, k, fill)
    np.testing.assert_array_equal(np.asarray(wcnt), np.asarray(gcnt))
    for kk in pay:
        np.testing.assert_array_equal(np.asarray(want[kk]),
                                      np.asarray(got[kk]), err_msg=kk)


def test_compact_route_empty():
    keep = jnp.zeros((2, 100), bool)
    tgt = jnp.zeros((2, 100), jnp.int32)
    pay = {"a": jnp.arange(200, dtype=jnp.int32).reshape(2, 100)}
    got, cnt = segs.compact_route(keep, tgt, pay, 16, {"a": jnp.int32(-9)})
    assert np.asarray(cnt).tolist() == [0, 0]
    assert (np.asarray(got["a"]) == -9).all()


def _boundary(img, cfg):
    from ros_vision_tpu.ops import ccl, quadfit, threshold as thr

    @jax.jit
    def pipe(g):
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        _, _, ranks = ccl.label_components(t)
        return quadfit.boundary_points(t, ranks, cfg)

    return jax.tree_util.tree_map(np.asarray, pipe(img))


@pytest.mark.parametrize("max_points", [4096, 512])  # 512 = overflow regime
def test_boundary_points_route_parity(max_points):
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import quadfit

    img, _ = render_scene(
        [3, 77], [simple_square_corners(80, 60, 34, angle_deg=-7),
                  simple_square_corners(220, 90, 40, angle_deg=25)],
        320, 160, noise_sigma=2.0)
    g = jnp.asarray(img)[None]
    cfg = quadfit.QuadFitConfig(max_points=max_points, max_segments=64,
                                max_quads=8)
    base_pts, base_cnt = _boundary(g, cfg)
    cfg_r = dataclasses.replace(cfg, route_compaction=True)
    got_pts, got_cnt = _boundary(g, cfg_r)
    np.testing.assert_array_equal(base_cnt, got_cnt)
    for kk in base_pts:
        np.testing.assert_array_equal(base_pts[kk], got_pts[kk],
                                      err_msg=kk)


def test_detector_route_compaction_parity():
    """End-to-end: a TPUDetector with route_compaction=True returns the
    same detections as the default sort path."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)

    img, _ = render_scene(
        [5, 90], [simple_square_corners(90, 70, 36, angle_deg=11),
                  simple_square_corners(230, 90, 42, angle_deg=-28)],
        320, 160, noise_sigma=1.5, seed=2)
    kw = dict(width=320, height=160, max_points=16384, max_segments=256,
              max_quads=32, fx=300.0, fy=300.0, cx=160.0, cy=80.0,
              estimate_pose=True)
    base = TPUDetector(DetectorConfig(**kw)).detect(img)
    routed = TPUDetector(DetectorConfig(route_compaction=True,
                                        **kw)).detect(img)
    assert [d.tag_id for d in base] == [d.tag_id for d in routed] == [5, 90]
    for a, b in zip(base, routed):
        np.testing.assert_array_equal(a.corners, b.corners)
        np.testing.assert_array_equal(np.asarray(a.pose_t),
                                      np.asarray(b.pose_t))
