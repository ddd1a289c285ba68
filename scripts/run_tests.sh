#!/usr/bin/env bash
# Test runner (run_tests.sh equivalent). The suite always runs on the CPU
# backend with a virtual 8-device mesh (conftest), mirroring the reference's
# GPU-less CI gate (its --cpu-only mode). Pass --tpu-smoke to additionally
# run a single-detection smoke test on the real chip.
set -euo pipefail
cd "$(dirname "$0")/.."

TPU_SMOKE=0
ARGS=()
for a in "$@"; do
  if [[ "$a" == "--tpu-smoke" ]]; then TPU_SMOKE=1; else ARGS+=("$a"); fi
done

python -m pytest tests/ -q "${ARGS[@]}"

if [[ "$TPU_SMOKE" == 1 ]]; then
  python - <<'EOF'
import numpy as np
from ros_vision_tpu.apriltag.detector import TPUDetector, DetectorConfig
from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners
img, _ = render_scene([42], [simple_square_corners(160, 80, 36)], 320, 160)
det = TPUDetector(DetectorConfig(width=320, height=160, max_points=4096,
                                 max_segments=64, max_quads=8))
res = det.detect(img)
assert [d.tag_id for d in res] == [42], res
print("TPU smoke OK")
EOF
fi
