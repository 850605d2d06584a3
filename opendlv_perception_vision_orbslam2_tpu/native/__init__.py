"""ctypes bindings for the C++ host runtime (native/src/native.cpp).

Loads ``liborbslam2_native.so`` if built (``make -C native``); every consumer
has a pure-Python fallback, so the package works without the native build —
but the native paths are the production ones (fast PNG decode, shared-memory
camera ingest compatible with unmodified OpenDLV camera proxies, native UDP
publisher).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "liborbslam2_native.so")
_lib = None


def _try_build() -> None:
    makefile_dir = os.path.join(
        os.path.dirname(__file__), os.pardir, os.pardir, "native"
    )
    if os.path.isdir(makefile_dir):
        subprocess.run(
            ["make", "-C", makefile_dir], capture_output=True, check=False
        )


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.png_decode_gray.restype = ctypes.c_int
    lib.png_decode_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.shm_attach.restype = ctypes.c_void_p
    lib.shm_attach.argtypes = [ctypes.c_char_p]
    lib.shm_size.restype = ctypes.c_uint32
    lib.shm_size.argtypes = [ctypes.c_void_p]
    lib.shm_wait.argtypes = [ctypes.c_void_p]
    lib.shm_read.restype = ctypes.c_int64
    lib.shm_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64
    ]
    lib.shm_detach.argtypes = [ctypes.c_void_p]
    lib.udp_multicast_open.restype = ctypes.c_void_p
    lib.udp_multicast_open.argtypes = [ctypes.c_char_p, ctypes.c_uint16]
    lib.udp_send.restype = ctypes.c_int64
    lib.udp_send.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64
    ]
    lib.udp_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class png_native:
    """Namespace-style accessor used by io/kitti.py."""

    _MAX_BYTES = 4096 * 2048 * 4

    @staticmethod
    def decode_gray(path: str):
        lib = get_lib()
        if lib is None:
            return None
        buf = np.empty(png_native._MAX_BYTES // 4, dtype=np.float32)
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        rc = lib.png_decode_gray(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            buf.nbytes, ctypes.byref(w), ctypes.byref(h),
        )
        if rc != 0:
            return None
        return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class SharedMemoryClient:
    """cluon-compatible shared-memory frame source (native path)."""

    def __init__(self, name: str):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._handle = self._lib.shm_attach(name.encode())
        if not self._handle:
            raise FileNotFoundError(f"shared memory '{name}' not found")
        self.size = self._lib.shm_size(self._handle)

    def wait(self) -> None:
        self._lib.shm_wait(self._handle)

    def read(self) -> np.ndarray:
        buf = np.empty(self.size, dtype=np.uint8)
        self._lib.shm_read(
            self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.nbytes,
        )
        return buf

    def close(self) -> None:
        if self._handle:
            self._lib.shm_detach(self._handle)
            self._handle = None


class UdpMulticastSender:
    def __init__(self, group: str, port: int):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library not built")
        self._handle = self._lib.udp_multicast_open(group.encode(), port)

    def send(self, data: bytes) -> int:
        arr = np.frombuffer(data, dtype=np.uint8)
        return self._lib.udp_send(
            self._handle, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(data),
        )

    def close(self) -> None:
        if self._handle:
            self._lib.udp_close(self._handle)
            self._handle = None
