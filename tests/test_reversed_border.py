"""Reversed-border family support (tagRevSyn25h7, SYNTHETIC).

The reference's setup_tag_family can load the official reversed-border
families (tagCircle21h7/49h12, tagStandard41h12/52h13, tagCustom48h12 —
apriltag_utils.cu:10-33). Their official code tables are unavailable
offline and cannot be regenerated bit-exactly, so these tests exercise
the complete reversed-border CODE PATH — gradient-filtered quad fit,
flipped border gray models, polarity-aware refine_edges, decode, render,
oracle — with a clearly-synthetic Hamming-verified family
(scripts/make_synthetic_family.py). Dropping official tables in later is
a data-only change.
"""
import numpy as np
import pytest

from ros_vision_tpu.apriltag.families import get_family, list_families
from ros_vision_tpu.apriltag.oracle import OracleDetector
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners

FAM = "tagRevSyn25h7"


def _scene(noise=1.0, seed=0):
    fam = get_family(FAM)
    return render_scene(
        [0, 7, 33],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35)],
        1280, 800, family=fam, noise_sigma=noise, seed=seed), fam


def _popcount(x):
    x = x.copy()
    c = np.zeros(x.shape, np.int64)
    while x.any():
        c += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return c


def test_family_table_properties():
    fam = get_family(FAM)
    assert fam.reversed_border
    assert fam.grid_size == 5 and fam.min_hamming == 7
    assert fam.n_codes >= 32
    # declared min hamming holds over ALL rotation pairs (incl. the
    # unique-orientation property: same id, different rotation)
    allc = fam.codes.flatten()
    minh = fam.nbits
    for i in range(len(allc)):
        ham = _popcount(allc ^ allc[i])
        ham[i] = fam.nbits
        minh = min(minh, int(ham.min()))
    assert minh >= fam.min_hamming
    assert FAM in list_families()
    # normal families keep reversed_border False (meta backward compat)
    assert not get_family("tag36h11").reversed_border


def test_render_inverts_rings():
    fam = get_family(FAM)
    img = fam.render(0, module_px=4)
    assert img[0, 0] == 0          # quiet zone black
    assert img[5, 5] == 255        # border ring white
    norm = get_family("tag16h5").render(0, module_px=4)
    assert norm[0, 0] == 255 and norm[5, 5] == 0


def test_oracle_detects_reversed_scene():
    (img, placed), fam = _scene()
    dets = OracleDetector(family=fam).detect(img).detections
    assert sorted(d.tag_id for d in dets) == [0, 7, 33]
    assert all(d.hamming == 0 for d in dets)
    # corner accuracy vs ground truth (detection corner convention is the
    # reverse cyclic order of the render's tl,tr,br,bl)
    gt = {p.tag_id: p.corners for p in placed}
    for d in dets:
        delta = np.abs(np.asarray(d.corners)[::-1] - gt[d.tag_id]).max()
        assert delta < 0.3, (d.tag_id, delta)


def test_tpu_detector_matches_oracle_reversed():
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    (img, placed), fam = _scene()
    ores = {d.tag_id: d
            for d in OracleDetector(family=fam).detect(img).detections}
    det = TPUDetector(DetectorConfig(
        width=1280, height=800, family=FAM,
        fx=900.0, fy=900.0, cx=640.0, cy=400.0))
    assert det._qcfg.reversed_border and not det._qcfg.normal_border
    dets = det.detect(img)
    assert sorted(d.tag_id for d in dets) == sorted(ores)
    for d in dets:
        assert d.hamming == 0
        delta = np.abs(np.asarray(d.corners) - ores[d.tag_id].corners).max()
        assert delta < 0.3, (d.tag_id, delta)


def test_normal_family_rejects_reversed_scene():
    # a normal-border detector must not fit the reversed-gradient quads
    (img, _), _ = _scene(noise=0.0)
    dets = OracleDetector(family="tag25h9").detect(img).detections
    assert dets == []
