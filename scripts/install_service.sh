#!/usr/bin/env bash
# Install the systemd service (install_service.bsh equivalent).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DEST=/opt/ros_vision_tpu
sudo mkdir -p "$DEST"
sudo cp -r "$REPO"/ros_vision_tpu "$REPO"/scripts "$REPO"/native \
    "$REPO"/pyproject.toml "$DEST"/
sudo cp "$REPO"/deploy/ros_vision_tpu.service /etc/systemd/system/
sudo systemctl daemon-reload
sudo systemctl enable ros_vision_tpu.service
echo "Installed. Start with: sudo systemctl start ros_vision_tpu"
