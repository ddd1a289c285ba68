#!/usr/bin/env python
"""Extract AprilTag code-family tables from OpenCV's aruco module.

The reference system uses the AprilTag 36h11 family (frc971-patched apriltag
3.3.0 vendored at /root/reference/src/external/CMakeLists.txt; detector setup at
src/apriltags_cuda/src/apriltags_cuda_detector.cu:137-193). We regenerate the
same *data tables* (not code) from OpenCV's predefined aruco dictionaries, which
ship the identical official family bit patterns with identical tag IDs.

OpenCV 5 bytesList layout (empirically verified): per marker, 4 consecutive
blocks of ceil(nbits/8) raw bytes, one per 90° rotation (rot r = np.rot90(g,r)
of the rotation-0 grid); full bytes are MSB-first, the final partial byte is
LSB-aligned. Bit value 1 = white module. We store, per family, a (n_codes, 4)
uint64 array of row-major codes (MSB = top-left module, reading order row-major
over the data grid) for all four rotations, and verify the family's guaranteed
minimum Hamming distance before writing.

Output: ros_vision_tpu/apriltag/_families_data.npz  (committed artifact)
"""
import numpy as np
import cv2

FAMILIES = {
    # name: (cv2 dict id, grid size, guaranteed min hamming)
    "tag36h11": (cv2.aruco.DICT_APRILTAG_36h11, 6, 11),
    "tag25h9": (cv2.aruco.DICT_APRILTAG_25h9, 5, 9),
    "tag16h5": (cv2.aruco.DICT_APRILTAG_16h5, 4, 5),
    "tag36h10": (cv2.aruco.DICT_APRILTAG_36h10, 6, 10),
}


def code_from_bytes(block: np.ndarray, nbits: int) -> int:
    """Decode one rotation block (ceil(nbits/8) bytes) to a row-major int."""
    nfull, rem = divmod(nbits, 8)
    v = int.from_bytes(bytes(block[:nfull].tolist()), "big")
    if rem:
        v = (v << rem) | (int(block[nfull]) & ((1 << rem) - 1))
    return v


def popcount_u64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    c = np.zeros(x.shape, np.int64)
    while x.any():
        c += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return c


def main() -> None:
    out = {}
    for name, (dict_id, ms, h) in FAMILIES.items():
        d = cv2.aruco.getPredefinedDictionary(dict_id)
        bl = d.bytesList
        n = bl.shape[0]
        nbits = ms * ms
        nbytes = (nbits + 7) // 8
        codes = np.zeros((n, 4), np.uint64)
        for i in range(n):
            flat = bl[i].flatten()
            for r in range(4):
                codes[i, r] = code_from_bytes(flat[r * nbytes:(r + 1) * nbytes], nbits)
        # Verify: min hamming between any two codes over all rotations
        # (distinct ids at any rotation, and same id at different rotations).
        allc = codes.flatten()
        minh = nbits
        for i in range(len(allc)):
            ham = popcount_u64(allc ^ allc[i])
            ham[i] = nbits
            # same-id different-rotation pairs also count (unique-orientation property)
            minh = min(minh, int(ham.min()))
        assert minh == h, f"{name}: min hamming {minh} != expected {h}"
        print(f"{name}: n={n} bits={nbits} min_hamming={minh} OK")
        out[f"{name}_codes"] = codes
        out[f"{name}_meta"] = np.array([n, ms, h], np.int64)
    np.savez(
        "ros_vision_tpu/apriltag/_families_data.npz", **out)
    print("wrote ros_vision_tpu/apriltag/_families_data.npz")


if __name__ == "__main__":
    main()
