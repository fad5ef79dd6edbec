"""Native blosc decoding for the zarr ingest path.

Resolution order for blosc_decompress():
1. the in-tree C++ decoder (libvqax_native.so, built automatically with
   the adjacent Makefile on first use — g++ + zlib only);
2. a system libblosc (blosc_decompress_ctx via ctypes);
3. RuntimeError with build instructions.

Both paths expose blosc_decompress(frame: bytes, nbytes: int) -> bytes.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvqax_native.so")

_native = None
_system = None


def _load_native() -> Optional[ctypes.CDLL]:
    global _native
    if _native is not None:
        return _native
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.vqax_blosc_decompress.restype = ctypes.c_int
        lib.vqax_blosc_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
        ]
        _native = lib
        return lib
    except OSError:
        return None


def _load_system() -> Optional[ctypes.CDLL]:
    global _system
    if _system is not None:
        return _system
    for name in ("blosc", "libblosc.so.1", "libblosc.so"):
        path = ctypes.util.find_library(name) or name
        try:
            lib = ctypes.CDLL(path)
            lib.blosc_decompress_ctx.restype = ctypes.c_int
            _system = lib
            return lib
        except OSError:
            continue
    return None


def native_blosc_decompress(frame: bytes, nbytes: int) -> bytes:
    """Decode via the in-tree C++ decoder (raises if unavailable)."""
    lib = _load_native()
    if lib is None:
        raise RuntimeError("libvqax_native.so not built and build failed")
    out = ctypes.create_string_buffer(nbytes)
    rc = lib.vqax_blosc_decompress(frame, len(frame), out, nbytes)
    if rc < 0:
        raise ValueError(f"native blosc decode failed (code {rc})")
    return out.raw[:rc]


def system_blosc_decompress(frame: bytes, nbytes: int) -> bytes:
    """Decode via a system libblosc (raises if unavailable)."""
    lib = _load_system()
    if lib is None:
        raise RuntimeError("no system libblosc found")
    out = ctypes.create_string_buffer(nbytes)
    rc = lib.blosc_decompress_ctx(frame, out, ctypes.c_size_t(nbytes),
                                  ctypes.c_int(1))
    if rc < 0:
        raise ValueError(f"libblosc decode failed (code {rc})")
    return out.raw[:rc]


def blosc_decompress(frame: bytes, nbytes: int) -> bytes:
    """Decode a blosc frame; nbytes is the uncompressed size (from the
    zarr chunk metadata). Prefers the in-tree decoder."""
    if _load_native() is not None:
        return native_blosc_decompress(frame, nbytes)
    return system_blosc_decompress(frame, nbytes)
