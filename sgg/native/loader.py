"""ctypes binding + on-demand build of the native JPEG loader."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpeg_loader.cc")
_SO = os.path.join(_DIR, "libsggjpeg.so")

_lock = threading.Lock()
_lib = None
_error: str | None = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-ljpeg", "-lpthread",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if out.returncode != 0:
        raise NativeUnavailable(f"native build failed:\n{out.stderr[-1500:]}")


def _load():
    global _lib, _error
    with _lock:
        if _lib is not None:
            return _lib
        if _error is not None:
            raise NativeUnavailable(_error)
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.sgg_decode_resize_file.restype = ctypes.c_int
            lib.sgg_decode_resize_file.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.sgg_decode_batch.restype = ctypes.c_int
            lib.sgg_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _lib = lib
            return _lib
        except (OSError, NativeUnavailable) as e:
            _error = str(e)
            raise NativeUnavailable(_error) from e


def native_available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def decode_file(path: str, size: int) -> np.ndarray:
    """JPEG file → uint8 [size, size, 3] via the native loader."""
    lib = _load()
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.sgg_decode_resize_file(
        path.encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    )
    if rc:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def decode_batch(paths: list[str], size: int, n_threads: int = 0) -> np.ndarray:
    """Threaded batch decode → uint8 [N, size, size, 3]."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.sgg_decode_batch(
        arr, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    if failures:
        bad = [paths[i] for i in np.nonzero(status)[0][:5]]
        raise IOError(f"native decode failed for {failures} files, e.g. {bad}")
    return out
