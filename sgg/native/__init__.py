"""sgg.native — C++ runtime components (ctypes-bound; no pybind11).

Currently: the JPEG decode+resize batch loader (``jpeg_loader.cc``). The
shared library compiles on first use with g++ (cached next to the source);
callers should catch :class:`NativeUnavailable` and fall back to PIL.
"""

from sgg.native.loader import (
    NativeUnavailable,
    decode_batch,
    decode_file,
    native_available,
)

__all__ = [
    "NativeUnavailable",
    "decode_batch",
    "decode_file",
    "native_available",
]
