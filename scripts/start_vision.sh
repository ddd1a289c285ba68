#!/usr/bin/env bash
# Launch the vision system (start_vision.bsh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/var/tmp/ros_vision_tpu_jaxcache}"
exec python -m ros_vision_tpu.launch "$@"
