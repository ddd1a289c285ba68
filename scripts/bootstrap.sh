#!/usr/bin/env bash
# Environment bootstrap (bootstrap.sh equivalent): verify the Python stack,
# build the native frame ring, prime the JAX compilation cache.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== checking python dependencies =="
python - <<'EOF'
import importlib
missing = []
for mod in ("jax", "flax", "optax", "numpy", "cv2", "websockets",
            "google.protobuf", "pandas", "matplotlib", "scipy"):
    try:
        importlib.import_module(mod)
    except ImportError:
        missing.append(mod)
if missing:
    raise SystemExit(f"missing dependencies: {missing}")
print("all dependencies present")
import jax
print("jax backend:", jax.default_backend(), jax.devices())
EOF

echo "== building native frame ring =="
make -C native

echo "== running the CPU test suite =="
python -m pytest tests/ -q -x

echo "bootstrap complete"
