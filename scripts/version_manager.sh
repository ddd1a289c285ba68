#!/usr/bin/env bash
# Two-level versioning + release bundles (version_manager.sh / release.sh /
# create_bundle.sh equivalents): VERSION holds MAJOR.MINOR; `release` tags
# the repo and writes a tar bundle.
set -euo pipefail
cd "$(dirname "$0")/.."
CMD="${1:-show}"
VERSION_FILE=VERSION
[[ -f $VERSION_FILE ]] || echo "0.1" > $VERSION_FILE
VER=$(cat $VERSION_FILE)

case "$CMD" in
  show) echo "$VER" ;;
  bump-minor)
    MAJ="${VER%%.*}"; MIN="${VER##*.}"
    echo "$MAJ.$((MIN+1))" > $VERSION_FILE
    echo "version -> $(cat $VERSION_FILE)" ;;
  bump-major)
    MAJ="${VER%%.*}"
    echo "$((MAJ+1)).0" > $VERSION_FILE
    echo "version -> $(cat $VERSION_FILE)" ;;
  release)
    git tag -f "v$VER"
    OUT="/tmp/ros_vision_tpu_v${VER}.tar.gz"
    git archive --format=tar.gz -o "$OUT" HEAD
    echo "bundle: $OUT (tag v$VER)" ;;
  *) echo "usage: $0 {show|bump-minor|bump-major|release}"; exit 1 ;;
esac
