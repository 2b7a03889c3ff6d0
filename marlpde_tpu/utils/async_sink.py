"""Python binding (ctypes) for the C++ async trajectory sink (csrc/sink.cpp).

Builds the shared library on first use if g++ is available; otherwise falls
back to a synchronous numpy writer with the same interface, so training code
never has a hard native dependency.

Usage:
    sink = AsyncSink(out_dir)
    sink.write("relError_3", np_array)     # returns immediately
    ...
    sink.flush()                           # barrier before reading the files
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DTYPE_CODES = {
    np.dtype("float32"): 0,
    np.dtype("float64"): 1,
    np.dtype("int32"): 2,
    np.dtype("int64"): 3,
    np.dtype("uint8"): 4,
}

_LIB_LOCK = threading.Lock()
_LIB = None
_LIB_TRIED = False


def _csrc_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _load_lib():
    global _LIB, _LIB_TRIED
    with _LIB_LOCK:
        if _LIB_TRIED:
            return _LIB
        _LIB_TRIED = True
        so = os.path.join(_csrc_dir(), "libmarlpde_sink.so")
        if not os.path.exists(so):
            try:
                subprocess.run(["make", "-C", _csrc_dir()], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.sink_create.restype = ctypes.c_void_p
        lib.sink_create.argtypes = [ctypes.c_char_p]
        lib.sink_write.restype = ctypes.c_int
        lib.sink_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_long)]
        lib.sink_pending.restype = ctypes.c_long
        lib.sink_pending.argtypes = [ctypes.c_void_p]
        lib.sink_flush.argtypes = [ctypes.c_void_p]
        lib.sink_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


class AsyncSink:
    """Non-blocking .npy writer backed by the C++ worker thread."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self._lib = _load_lib()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.sink_create(out_dir.encode())

    @property
    def native(self) -> bool:
        return self._handle is not None

    def write(self, name: str, array) -> None:
        arr = np.ascontiguousarray(np.asarray(array))
        if arr.dtype not in _DTYPE_CODES:
            arr = arr.astype(np.float32)
        if self._handle is None:
            np.save(os.path.join(self.out_dir, f"{name}.npy"), arr)
            return
        shape = (ctypes.c_long * arr.ndim)(*arr.shape)
        rc = self._lib.sink_write(
            self._handle, name.encode(),
            arr.ctypes.data_as(ctypes.c_void_p),
            _DTYPE_CODES[arr.dtype], arr.ndim, shape)
        if rc != 0:
            raise RuntimeError(f"[async_sink] native write failed rc={rc}")

    def pending(self) -> int:
        if self._handle is None:
            return 0
        return int(self._lib.sink_pending(self._handle))

    def flush(self) -> None:
        if self._handle is not None:
            self._lib.sink_flush(self._handle)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.sink_flush(self._handle)
            self._lib.sink_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
