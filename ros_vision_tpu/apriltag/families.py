"""AprilTag code families (36h11 / 25h9 / 16h5).

Capability parity with the vendored apriltag library's tag family tables used by
the reference detector (family selected at
/root/reference/src/apriltags_cuda/src/apriltags_cuda_detector.cu:137-193,
tag36h11). Tables regenerated from OpenCV's official aruco dictionaries and
verified against each family's guaranteed minimum Hamming distance
(see scripts/extract_tag_families.py).

Conventions:
  - A "code" is the row-major reading of the data grid (MSB = top-left module),
    bit value 1 = white module.
  - ``codes[:, r]`` is the code observed when the physical tag appears rotated
    by r*90deg counterclockwise in the sampled grid; decoding against all four
    rotations yields the tag's orientation.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

_DATA_PATH = os.path.join(os.path.dirname(__file__), "_families_data.npz")


@dataclasses.dataclass(frozen=True)
class TagFamily:
    name: str
    grid_size: int            # modules per side of the data grid (6 for 36h11)
    min_hamming: int          # guaranteed min distance of the family
    codes: np.ndarray         # (n_codes, 4) uint64, all four rotations
    reversed_border: bool = False   # border ring is WHITE inside a black
    # surround (the reference's rcode families, apriltag_utils.cu:10-33:
    # tagCircle*/tagStandard*/tagCustom*); the detected quad's gradient
    # points INTO the tag and the border gray models swap polarity.
    # Total tag side in modules incl. the 1-module black border ring and the
    # 1-module white quiet zone is grid_size + 2 (+2); the detected quad spans
    # the outer edge of the black border: grid_size + 2 modules.
    @property
    def n_codes(self) -> int:
        return int(self.codes.shape[0])

    @property
    def nbits(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def border_size(self) -> int:
        """Modules per side of the black-border square (the detected quad)."""
        return self.grid_size + 2

    def code_grid(self, tag_id: int, rotation: int = 0) -> np.ndarray:
        """(grid_size, grid_size) 0/1 array, 1 = white module."""
        v = int(self.codes[tag_id, rotation])
        bits = [(v >> (self.nbits - 1 - i)) & 1 for i in range(self.nbits)]
        return np.array(bits, np.uint8).reshape(self.grid_size, self.grid_size)

    def render(self, tag_id: int, module_px: int = 1) -> np.ndarray:
        """Render the canonical tag image (incl. border + quiet zone),
        uint8 {0, 255}. Total side = (grid_size + 4) * module_px.
        Normal families: black border, white quiet zone; reversed
        families invert both ring colors (data bits stay 1 = white)."""
        g = self.grid_size
        img = np.zeros((g + 4, g + 4), np.uint8)
        img[:] = 0 if self.reversed_border else 255     # quiet zone
        img[1:-1, 1:-1] = 255 if self.reversed_border else 0   # border
        img[2:-2, 2:-2] = self.code_grid(tag_id) * 255
        if module_px != 1:
            img = np.kron(img, np.ones((module_px, module_px), np.uint8))
        return img


@functools.lru_cache(maxsize=None)
def get_family(name: str = "tag36h11") -> TagFamily:
    data = np.load(_DATA_PATH)
    try:
        codes = data[f"{name}_codes"]
        meta = data[f"{name}_meta"]
    except KeyError as e:
        raise ValueError(f"unknown tag family {name!r}") from e
    ms, h = int(meta[1]), int(meta[2])
    rev = bool(meta[3]) if len(meta) > 3 else False
    return TagFamily(name=name, grid_size=ms, min_hamming=h, codes=codes,
                     reversed_border=rev)


def list_families() -> list[str]:
    data = np.load(_DATA_PATH)
    return sorted(k[: -len("_codes")] for k in data.files if k.endswith("_codes"))
