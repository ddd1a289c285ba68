#!/usr/bin/env bash
# Versioned RUNTIME deployment bundle (the reference's create_bundle.sh:
# tarball of the colcon install tree with dereferenced symlinks and
# graceful handling of missing pieces). Our install tree is the Python
# package + built native lib + configs + systemd unit + launch scripts —
# everything a robot host needs to run without the source checkout.
#
# Usage: scripts/create_bundle.sh [output.tar.gz]
set -uo pipefail
cd "$(dirname "$0")/.."

VER=$(cat VERSION 2>/dev/null || echo "0.1")
OUT="${1:-ros_vision_tpu_bundle-v${VER}.tar.gz}"

STAGE=$(mktemp -d)
trap 'rm -rf "$STAGE"' EXIT
mkdir -p "$STAGE/ros_vision_tpu_install"
cd_stage="$STAGE/ros_vision_tpu_install"

echo "Creating bundle (version $VER) -> $OUT"

# package source (runtime needs it: pure-python + pallas kernels)
cp -r ros_vision_tpu "$cd_stage/"
find "$cd_stage/ros_vision_tpu" -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null

# native frame ring: build if the toolchain is present, bundle if built
if [ ! -f native/libframe_ring.so ] && command -v make >/dev/null; then
    make -C native >/dev/null 2>&1 || echo "WARN: native build failed" \
        "(runtime falls back to the Python ring)"
fi
if ls native/*.so >/dev/null 2>&1; then
    mkdir -p "$cd_stage/native"
    cp native/*.so "$cd_stage/native/"
else
    echo "WARN: no native lib bundled (Python ring fallback will be used)"
fi

# configs, entry points, service unit, host scripts
mkdir -p "$cd_stage/deploy" "$cd_stage/scripts"
cp deploy/ros_vision_tpu.service "$cd_stage/deploy/" 2>/dev/null || true
cp scripts/start_vision.sh scripts/install_service.sh \
   scripts/bootstrap.sh "$cd_stage/scripts/" 2>/dev/null || true
cp VERSION "$cd_stage/" 2>/dev/null || echo "$VER" > "$cd_stage/VERSION"
cp pyproject.toml README.md "$cd_stage/" 2>/dev/null || true

# dereference symlinks, ignore unreadable files (reference semantics)
if tar -h --ignore-failed-read -czf "$OUT" -C "$STAGE" \
        ros_vision_tpu_install 2>/dev/null; then
    echo "Bundle created successfully: $OUT"
else
    [ -f "$OUT" ] && echo "Bundle created with warnings: $OUT" || {
        echo "Failed to create bundle"; exit 1; }
fi
ls -lh "$OUT"
