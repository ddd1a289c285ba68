"""Drop-in external family tables (families.load_external_table).

The official reversed-border families (tagCircle21h7/49h12,
tagStandard41h12/52h13, tagCustom48h12 — reference roster at
/root/reference/src/apriltags_cuda/src/apriltag_utils.cu:10-33) cannot be
shipped (tables not regenerable offline), so closing that gap must be a pure
data drop: the user copies the official apriltag3 C source and loads it.
These tests prove the whole path with synthetic stand-ins serialized through
the SAME formats: a dense C table must reproduce the known tag36h11
all-rotation table bit-exactly (pinning the geometric rotation derivation),
and a tagStandard-style NON-DENSE reversed-border layout (data bits inside
AND outside the border) must detect end to end through both the f64 oracle
and the TPU detector.
"""
import numpy as np
import pytest

from ros_vision_tpu.apriltag import families as F
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners


def _write_c_table(path, name, codes0, bit_x, bit_y, wb, tw, reversed_border,
                   h, nbits, style="array"):
    """Serialize a family as apriltag3 C source (both generator styles)."""
    n = len(codes0)
    lines = ["#include <stdlib.h>",
             f"static uint64_t codedata[{n}] = {{"]
    lines += [f"   0x{int(c):016x}UL," for c in codes0] + ["};"]
    if style == "array":
        lines += [f"static uint32_t bit_x[{nbits}] = {{"
                  + ", ".join(str(int(v)) for v in bit_x) + "};",
                  f"static int32_t bit_y[{nbits}] = {{"
                  + ", ".join(str(int(v)) for v in bit_y) + "};"]
    lines += [f"apriltag_family_t *{name}_create() {{",
              f'   tf->name = strdup("{name}");',
              f"   tf->h = {h};",
              f"   tf->ncodes = {n};",
              "   tf->codes = codedata;",
              f"   tf->nbits = {nbits};"]
    if style == "assign":
        lines += [f"   tf->bit_x[{i}] = {int(bit_x[i])};\n"
                  f"   tf->bit_y[{i}] = {int(bit_y[i])};"
                  for i in range(nbits)]
    lines += [f"   tf->width_at_border = {wb};",
              f"   tf->total_width = {tw};",
              f"   tf->reversed_border = "
              f"{'true' if reversed_border else 'false'};",
              "   return tf;", "}"]
    path.write_text("\n".join(lines))
    return str(path)


@pytest.mark.parametrize("style", ["array", "assign"])
def test_dense_c_table_reproduces_builtin_rotations(tmp_path, style):
    """Loading a rotation-0-only official-style C table must reproduce the
    builtin all-rotation table bit-exactly (pins the geometric rotation
    permutation against OpenCV's official 4-rotation data)."""
    fam = F._get_builtin("tag36h11")
    g = fam.grid_size
    bx = [1 + i % g for i in range(g * g)]
    by = [1 + i // g for i in range(g * g)]
    p = _write_c_table(tmp_path / "tag36h11.c", "tag36h11", fam.codes[:, 0],
                       bx, by, 8, 10, False, 11, 36, style=style)
    loaded = F.load_external_table(p, register=False)
    assert loaded.name == "tag36h11"
    assert loaded.grid_size == 6 and loaded.bit_xy is None
    assert loaded.min_hamming == 11
    assert (loaded.codes == fam.codes).all()
    assert loaded.total_width == 10 and loaded.border_size == 8


def test_csv_table_round_trip_registers_and_detects(tmp_path):
    """The synthetic reversed-border family serialized as CSV loads,
    registers under its name, and the registered family detects a rendered
    tag end to end through the oracle."""
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    fam = F._get_builtin("tagRevSyn25h7")
    name = "tagRevCsv25h7"
    lines = [f"# name: {name}", "# nbits: 25", "# width_at_border: 7",
             "# reversed_border: true", "# h: 7"]
    lines += [f"0x{int(c):x}" for c in fam.codes[:, 0]]
    p = tmp_path / "fam.csv"
    p.write_text("\n".join(lines))
    loaded = F.load_external_table(str(p))
    try:
        assert F.get_family(name) is loaded
        assert (loaded.codes == fam.codes).all()       # rotation derivation
        assert loaded.reversed_border
        img, placed = render_scene(
            [3], [simple_square_corners(160, 120, 70, angle_deg=15)],
            320, 240, family=loaded)
        dets = OracleDetector(family=loaded).detect(img).detections
        assert [d.tag_id for d in dets] == [3]
    finally:
        F._EXTERNAL.pop(name, None)


def _make_nondense_family(name="tagNdSyn41h5", n_codes=12, seed=41_005):
    """tagStandard41h12's exact geometry with synthetic codes: wb=5 WHITE
    border (reversed), data bits on the inner 3x3 (coords 1..3) AND the
    32-module ring at distance 2 outside the border (coords -2..6; the
    adjacent ring stays quiet) — 9 + 32 = 41 bits, total_width 9. Codes
    greedily accepted at min pairwise Hamming 5 over all rotation pairs
    (same construction as scripts/make_synthetic_family.py)."""
    inner = [(x, y) for y in range(1, 4) for x in range(1, 4)]
    ring = [(x, y) for y in range(-2, 7) for x in range(-2, 7)
            if x in (-2, 6) or y in (-2, 6)]
    bit_xy = np.array(inner + ring, np.int64)
    nbits, wb, h = len(bit_xy), 5, 5
    assert nbits == 41
    rng = np.random.default_rng(seed)
    accepted = []
    pool = np.zeros((0,), np.uint64)
    while len(accepted) < n_codes:
        code = np.uint64(rng.integers(0, 1 << 41, dtype=np.uint64))
        rots = F._codes_all_rotations(np.array([code], np.uint64),
                                      bit_xy, wb)[0]
        cand = np.concatenate([pool, rots])
        xor = cand[:, None] ^ cand[None, :]
        ham = np.zeros(xor.shape, np.int64)
        x = xor.copy()
        for _ in range(nbits):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        ham[np.arange(len(cand)), np.arange(len(cand))] = nbits
        bits = int(bin(int(code)).count("1"))
        if ham.min() >= h and 8 <= bits <= nbits - 8:
            accepted.append(rots)
            pool = cand
    codes = np.stack(accepted)
    return name, codes, bit_xy, wb, 9, h, nbits


def test_nondense_reversed_family_end_to_end(tmp_path):
    """A tagStandard-style layout (bits OUTSIDE the border) loaded from C
    source detects end to end: f64 oracle AND the TPU detector both decode
    the rendered ids with hamming 0. This is the full official-table
    drop-in path minus only the official bits."""
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    from ros_vision_tpu.apriltag.oracle import OracleDetector
    name, codes, bit_xy, wb, tw, h, nbits = _make_nondense_family()
    p = _write_c_table(tmp_path / f"{name}.c", name, codes[:, 0],
                       bit_xy[:, 0], bit_xy[:, 1], wb, tw, True, h, nbits)
    fam = F.load_external_table(p)
    try:
        assert fam.bit_xy is not None and fam.reversed_border
        assert (fam.codes == codes).all()
        assert fam.total_width == 9 and fam.border_size == 5
        # NOTE the full pattern footprint is 11/5 = 2.2x the border square
        # (quiet + outer data ring), so the two tags need generous spacing
        img, placed = render_scene(
            [2, 7], [simple_square_corners(120, 130, 45, angle_deg=10),
                     simple_square_corners(350, 170, 45, angle_deg=-30)],
            480, 320, family=fam)
        got_o = {d.tag_id: d for d in
                 OracleDetector(family=fam).detect(img).detections}
        assert set(got_o) == {2, 7}
        assert all(d.hamming == 0 for d in got_o.values())
        det = TPUDetector(DetectorConfig(
            width=480, height=320, family=name, max_points=16384,
            max_segments=128, max_quads=16,
            fx=400.0, fy=400.0, cx=240.0, cy=160.0))
        (dets,) = det.detect(img[None])
        got_t = {d.tag_id: d for d in dets}
        assert set(got_t) == {2, 7}
        assert all(d.hamming == 0 for d in got_t.values())
        for tid, pl in zip([2, 7], placed):
            # reversed-border detection corner convention is the reverse
            # cyclic order of the render's tl,tr,br,bl (test_reversed_border)
            err = np.abs(np.asarray(got_t[tid].corners)[::-1]
                         - pl.corners).max()
            assert err < 0.6, (tid, err)
    finally:
        F._EXTERNAL.pop(name, None)


def test_min_hamming_verification_rejects_corrupt_table(tmp_path):
    """A corrupted table (duplicate code -> Hamming 0) must fail loudly at
    load, never silently misdecode."""
    fam = F._get_builtin("tagRevSyn25h7")
    codes0 = fam.codes[:, 0].copy()
    codes0[1] = codes0[0]            # corrupt: duplicate
    lines = ["# name: tagBad25h7", "# nbits: 25", "# width_at_border: 7",
             "# reversed_border: true", "# h: 7"]
    lines += [f"0x{int(c):x}" for c in codes0]
    p = tmp_path / "bad.csv"
    p.write_text("\n".join(lines))
    with pytest.raises(ValueError, match="min Hamming"):
        F.load_external_table(str(p), register=False)
    assert "tagBad25h7" not in F._EXTERNAL


def test_rotation_permutation_requires_closed_layout():
    bad = np.array([[1, 1], [2, 1], [1, 2]], np.int64)   # not rotationally
    with pytest.raises(ValueError, match="not closed"):
        F._rotation_permutation(bad, 5)
