"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding paths are
exercised without TPU hardware (mirrors the reference's `run_tests.sh
--cpu-only` mode, /root/reference/run_tests.sh:46-56). Pallas kernels detect
the CPU backend and run in interpret mode.
"""
import os

# Force CPU regardless of the ambient platform (the axon TPU plugin sets
# JAX_PLATFORMS=axon globally; tests must not claim the chip)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/ros_vision_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


REFERENCE_DATA = "/root/reference/src/apriltags_cuda/test/data"


@pytest.fixture(scope="session")
def reference_golden_image():
    """The reference repo's golden test photo (1280x720, exactly one 36h11
    tag), if the reference checkout is present. Mirrors
    gpu_detector_test.cu:39-44."""
    path = os.path.join(REFERENCE_DATA, "colorimage.jpg")
    if not os.path.exists(path):
        pytest.skip("reference golden images not available")
    import cv2

    img = cv2.imread(path)
    assert img is not None
    return img


@pytest.fixture(scope="session")
def reference_notags_image():
    path = os.path.join(REFERENCE_DATA, "colorimage_notags.jpg")
    if not os.path.exists(path):
        pytest.skip("reference golden images not available")
    import cv2

    img = cv2.imread(path)
    assert img is not None
    return img


@pytest.fixture(scope="session")
def reference_grayimage():
    """grayimage.jpg — the reference's only 1280x800 photo, i.e. the exact
    production camera resolution the perf targets are built on
    (gpu_detector_test.cu:39-44 data set)."""
    path = os.path.join(REFERENCE_DATA, "grayimage.jpg")
    if not os.path.exists(path):
        pytest.skip("reference golden images not available")
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape == (800, 1280)
    return img
