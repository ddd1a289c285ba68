#!/usr/bin/env python
"""Generate the SYNTHETIC reversed-border family `tagRevSyn25h7`.

The reference's `setup_tag_family` can load the official reversed-border
families (tagCircle21h7/49h12, tagStandard41h12/52h13, tagCustom48h12 —
/root/reference/src/apriltags_cuda/src/apriltag_utils.cu:10-33), but the
official code tables exist nowhere on this system and cannot be
regenerated bit-exactly offline (the lexicode search is seeded + pruned
in unpublished ways). Rather than ship non-official bits under an
official name (which would silently fail on real tags), we ship a
clearly-synthetic family that exercises the full reversed-border code
path — quad gradient filter, flipped border gray models, decode, render,
oracle — so dropping the official tables in later is a data-only change.

Layout: inverted-classic — 5x5 data grid inside a 1-module WHITE border
(7 modules at the detected quad edge), black quiet zone outside. This is
the reversed-polarity analogue of tag25h9's geometry: the detected quad
is the white border's outer edge, gradient pointing INTO the tag
(`dot < 0` in fit_quad, oracle.py:299 / ops/quadfit.py:373).

Codes: greedy accept from a seeded PRNG stream with min pairwise Hamming
distance 7 over ALL rotation pairs (distinct ids at any rotation AND the
same id at different rotations — the unique-orientation property), plus
a complexity floor (>= 6 bits of each color) to avoid degenerate
near-uniform grids. Deterministic: same seed -> same table.

Output: appends tagRevSyn25h7_{codes,meta} to
ros_vision_tpu/apriltag/_families_data.npz. Meta is [n, grid, hamming,
reversed] (4 elements; the loader treats 3-element metas as normal-
border families).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = 5
NBITS = GRID * GRID
MIN_HAMMING = 7
N_CODES = 64
SEED = 25_007


def grid_of(code: int) -> np.ndarray:
    bits = [(code >> (NBITS - 1 - i)) & 1 for i in range(NBITS)]
    return np.array(bits, np.uint8).reshape(GRID, GRID)


def code_of(g: np.ndarray) -> int:
    v = 0
    for b in g.reshape(-1):
        v = (v << 1) | int(b)
    return v


def rotations(code: int) -> np.ndarray:
    """All four rotation readings, matching extract_tag_families.py's
    convention (rot r = np.rot90(grid, r))."""
    g = grid_of(code)
    return np.array([code_of(np.rot90(g, r)) for r in range(4)], np.uint64)


def popcount_u64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    c = np.zeros(x.shape, np.int64)
    while x.any():
        c += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return c


def main() -> None:
    rng = np.random.default_rng(SEED)
    accepted = []          # list of (4,) uint64 rotation rows
    pool = np.zeros((0,), np.uint64)
    tries = 0
    while len(accepted) < N_CODES:
        tries += 1
        assert tries < 2_000_000, "search did not converge"
        cand = int(rng.integers(0, 1 << NBITS, dtype=np.uint64))
        ones = bin(cand).count("1")
        if not (6 <= ones <= NBITS - 6):
            continue
        rots = rotations(cand)
        # unique-orientation property: the code's own rotations must be
        # mutually >= MIN_HAMMING apart (rules out rotational symmetry)
        self_ok = True
        for a in range(4):
            for b in range(a + 1, 4):
                if int(popcount_u64(np.array(
                        [rots[a] ^ rots[b]], np.uint64))[0]) < MIN_HAMMING:
                    self_ok = False
        if not self_ok:
            continue
        if pool.size:
            d = popcount_u64(pool[None, :] ^ rots[:, None])
            if int(d.min()) < MIN_HAMMING:
                continue
        accepted.append(rots)
        pool = np.concatenate([pool, rots])
    codes = np.stack(accepted)                       # (N, 4) uint64

    # independent verification pass (mirrors extract_tag_families.py)
    allc = codes.flatten()
    minh = NBITS
    for i in range(len(allc)):
        ham = popcount_u64(allc ^ allc[i])
        ham[i] = NBITS
        minh = min(minh, int(ham.min()))
    assert minh >= MIN_HAMMING, f"min hamming {minh} < {MIN_HAMMING}"
    print(f"tagRevSyn25h7: n={len(codes)} bits={NBITS} min_hamming={minh} "
          f"(declared {MIN_HAMMING}) tries={tries}")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "ros_vision_tpu", "apriltag", "_families_data.npz")
    existing = dict(np.load(path)) if os.path.exists(path) else {}
    existing["tagRevSyn25h7_codes"] = codes
    existing["tagRevSyn25h7_meta"] = np.array(
        [len(codes), GRID, MIN_HAMMING, 1], np.int64)
    np.savez(path, **existing)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
