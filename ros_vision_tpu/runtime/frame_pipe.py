"""FramePipe: zero-copy host frame transport + double-buffered device feed.

Replaces the reference's DDS image topic hot path (depth-1 best-effort QoS,
camera_publisher.cpp:112-118) with the native SPSC ring
(native/frame_ring.cpp) — capture thread pushes, the TPU feeder pulls the
newest frame and overlaps jnp.device_put of frame N+1 with detection of
frame N (the role CUDA pinned memory + MemcpyAsync plays in the reference,
cuda_frc971.h:107-145).

Falls back to a pure-Python ring (threading) when the native library isn't
built — same API, same drop-oldest semantics.
"""
from __future__ import annotations

import ctypes
import os
import threading
import time

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libframe_ring.so"),
    os.path.join(os.path.dirname(__file__), "libframe_ring.so"),
)


def _load_native():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.frame_ring_create.restype = ctypes.c_void_p
            lib.frame_ring_create.argtypes = [ctypes.c_uint32,
                                              ctypes.c_uint32]
            lib.frame_ring_destroy.argtypes = [ctypes.c_void_p]
            lib.frame_ring_push.restype = ctypes.c_uint64
            lib.frame_ring_push.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
                ctypes.c_int64]
            lib.frame_ring_latest.restype = ctypes.c_uint32
            lib.frame_ring_latest.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.frame_ring_head.restype = ctypes.c_uint64
            lib.frame_ring_head.argtypes = [ctypes.c_void_p]
            return lib
    return None


_NATIVE = _load_native()


class FrameRing:
    """SPSC drop-oldest frame ring. One per camera."""

    def __init__(self, frame_bytes: int, n_slots: int = 4,
                 force_python: bool = False):
        self.frame_bytes = frame_bytes
        self._native = None
        if _NATIVE is not None and not force_python:
            h = _NATIVE.frame_ring_create(n_slots, frame_bytes)
            if h:
                self._native = ctypes.c_void_p(h)
        if self._native is None:
            self._slots = [None] * n_slots
            self._meta = [None] * n_slots
            self._head = 0
            self._lock = threading.Lock()
        self._n_slots = n_slots

    @property
    def is_native(self) -> bool:
        return self._native is not None

    def push(self, frame: np.ndarray, timestamp_ns: int = 0) -> int:
        buf = np.ascontiguousarray(frame)
        if self._native is not None:
            return int(_NATIVE.frame_ring_push(
                self._native, buf.tobytes(), buf.nbytes,
                int(timestamp_ns)))
        with self._lock:
            fid = self._head
            self._slots[fid % self._n_slots] = buf.copy()
            self._meta[fid % self._n_slots] = (
                fid, timestamp_ns or time.monotonic_ns())
            self._head += 1
            return fid

    def latest(self, last_seen_id: int = -1):
        """Newest frame newer than last_seen_id, or None.
        Returns (frame bytes-1D uint8, frame_id, timestamp_ns)."""
        if self._native is not None:
            out = np.empty(self.frame_bytes, np.uint8)
            fid = ctypes.c_uint64()
            ts = ctypes.c_int64()
            n = _NATIVE.frame_ring_latest(
                self._native, out.ctypes.data_as(ctypes.c_void_p),
                self.frame_bytes, last_seen_id, ctypes.byref(fid),
                ctypes.byref(ts))
            if n == 0:
                return None
            return out[:n], int(fid.value), int(ts.value)
        with self._lock:
            if self._head == 0:
                return None
            fid = self._head - 1
            if fid == last_seen_id:
                return None
            buf = self._slots[fid % self._n_slots]
            meta = self._meta[fid % self._n_slots]
            return buf.reshape(-1), meta[0], meta[1]

    @property
    def head(self) -> int:
        if self._native is not None:
            return int(_NATIVE.frame_ring_head(self._native))
        return self._head

    def close(self):
        if self._native is not None:
            _NATIVE.frame_ring_destroy(self._native)
            self._native = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FramePipe:
    """Multi-camera frame assembly: one ring per camera, batched pull.

    pull_batch() gathers the newest frame of every camera into the (B, H, W)
    batch tensor the detector consumes — the point where the reference's
    per-camera processes become one batched device program."""

    def __init__(self, n_cameras: int, height: int, width: int,
                 n_slots: int = 4):
        self.shape = (height, width)
        self.rings = [FrameRing(height * width, n_slots)
                      for _ in range(n_cameras)]
        self._last = [-1] * n_cameras
        self._stamps = [0] * n_cameras

    def push(self, cam: int, frame: np.ndarray, timestamp_ns: int = 0):
        return self.rings[cam].push(frame, timestamp_ns)

    def pull_batch(self, wait_new: bool = False, timeout_s: float = 0.1):
        """(B, H, W) uint8 batch of the newest frames + per-camera
        (frame_id, timestamp) lists. Cameras with no frame yet give zeros."""
        h, w = self.shape
        batch = np.zeros((len(self.rings), h, w), np.uint8)
        ids = [-1] * len(self.rings)
        deadline = time.monotonic() + timeout_s
        while True:
            got_new = False
            for i, ring in enumerate(self.rings):
                r = ring.latest(self._last[i] if wait_new else -1)
                if r is not None:
                    buf, fid, ts = r
                    batch[i] = buf[:h * w].reshape(h, w)
                    ids[i] = fid
                    self._last[i] = fid
                    self._stamps[i] = ts
                    got_new = True
            if got_new or not wait_new or time.monotonic() > deadline:
                break
            time.sleep(0.0005)
        return batch, ids, list(self._stamps)
