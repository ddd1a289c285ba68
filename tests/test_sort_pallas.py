"""Parity of the Pallas bitonic sort vs lax.sort (interpret mode on CPU).

Covers the three cluster_and_fit call shapes: 2-key (pair key + x-major
payload), 2-key theta, and keys-only ykey — plus padding (K not a power
of two), sentinel-heavy rows (mostly-KEY_INVALID streams), and duplicate
keys (ties must produce identical multisets; with all operands as keys
the full output must match lax.sort exactly).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_vision_tpu.ops.sort_pallas import sort_tpu


def _ref(ops, num_keys):
    return jax.lax.sort([jnp.asarray(o) for o in ops], dimension=1,
                        num_keys=num_keys, is_stable=True)


@pytest.mark.parametrize("k", [128, 512, 1000, 2048])
@pytest.mark.parametrize("num_keys,nops", [(1, 1), (2, 2)])
def test_sort_parity_random(k, num_keys, nops):
    rng = np.random.default_rng(k * 7 + nops)
    b = 3
    ops = [rng.integers(0, 1 << 22, (b, k)).astype(np.int32)
           for _ in range(nops)]
    got = sort_tpu([jnp.asarray(o) for o in ops], num_keys=num_keys,
                   interpret=True)
    want = _ref(ops, num_keys)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_parity_sentinel_heavy():
    """Mostly-invalid streams (the narrow-path regime): KEY_INVALID keys
    with zero payloads must compact all real points to the front."""
    from ros_vision_tpu.ops.quadfit import KEY_INVALID
    rng = np.random.default_rng(0)
    b, k = 2, 4096
    key = np.full((b, k), int(KEY_INVALID), np.int32)
    pack = np.zeros((b, k), np.int32)
    nreal = 37
    for bi in range(b):
        idx = rng.choice(k, nreal, replace=False)
        key[bi, idx] = rng.integers(0, 1 << 22, nreal)
        pack[bi, idx] = rng.integers(0, 1 << 28, nreal)
    got = sort_tpu([jnp.asarray(key), jnp.asarray(pack)], num_keys=2,
                   interpret=True)
    want = _ref([key, pack], 2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_parity_duplicate_keys():
    """Heavy ties across both key planes — exact match still required
    because with all operands as keys, equal tuples are identical."""
    rng = np.random.default_rng(1)
    b, k = 2, 2048
    key = rng.integers(0, 7, (b, k)).astype(np.int32)
    pack = rng.integers(0, 5, (b, k)).astype(np.int32)
    got = sort_tpu([jnp.asarray(key), jnp.asarray(pack)], num_keys=2,
                   interpret=True)
    want = _ref([key, pack], 2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_cluster_and_fit_bitonic_parity():
    """Full cluster_and_fit with the bitonic sorts (interpret mode on
    CPU) must match the lax.sort path bit-for-bit on a rendered scene."""
    import dataclasses
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, quadfit, threshold as thr

    img, _ = render_scene(
        [3, 77], [simple_square_corners(80, 60, 34, angle_deg=-7),
                  simple_square_corners(220, 90, 40, angle_deg=25)],
        320, 160)
    g = jnp.asarray(img)[None]
    cfg = quadfit.QuadFitConfig(max_points=4096, max_segments=64,
                                max_quads=8)

    @jax.jit
    def front(g):
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        _, _, ranks = ccl.label_components(t)
        pts, counts = quadfit.boundary_points(t, ranks, cfg)
        return decim, pts, counts

    decim, pts, _ = front(g)
    base = jax.jit(lambda p, d: quadfit.cluster_and_fit(p, d, cfg))(
        pts, decim)
    cfg_p = dataclasses.replace(cfg, use_pallas_sort=True)
    got = jax.jit(lambda p, d: quadfit.cluster_and_fit(p, d, cfg_p))(
        pts, decim)
    assert set(base) == set(got)
    for name in base:
        np.testing.assert_array_equal(np.asarray(base[name]),
                                      np.asarray(got[name]),
                                      err_msg=name)


def test_sort_cluster_shapes():
    """The exact (seg << 20 | theta, pack3) theta-sort pattern at a
    production-narrow K."""
    rng = np.random.default_rng(2)
    b, k, nseg = 2, 16384, 256
    seg = rng.integers(0, nseg + 1, (b, k)).astype(np.int32)
    theta = rng.integers(0, 1 << 20, (b, k)).astype(np.int32)
    sort_key = (seg << 20) | theta
    pack3 = rng.integers(0, 1 << 22, (b, k)).astype(np.int32)
    got = sort_tpu([jnp.asarray(sort_key), jnp.asarray(pack3)],
                   num_keys=2, interpret=True)
    want = _ref([sort_key, pack3], 2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
