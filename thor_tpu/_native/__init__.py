"""Native (C) host-side entropy tier with automatic build + fallback.

The bit-serial VLC coefficient scan dominates host time; this module
compiles entropy.c on first use (plain cc, no external deps) and exposes
ctypes wrappers.  If the toolchain is unavailable the pure-Python
implementations remain the source of truth.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libthorentropy.so")
_SRC = os.path.join(_DIR, "entropy.c")

_lib = None


def _build():
    subprocess.run(["cc", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                   check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO) or
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
        _lib.get_vlc.restype = ctypes.c_int
        return _lib
    except Exception:
        return None


class BrStruct(ctypes.Structure):
    _fields_ = [("data", ctypes.c_char_p), ("nbytes", ctypes.c_long),
                ("bitpos", ctypes.c_long)]


class BwStruct(ctypes.Structure):
    _fields_ = [("buf", ctypes.c_void_p), ("cap", ctypes.c_long),
                ("bytepos", ctypes.c_long), ("bitbuf", ctypes.c_uint32),
                ("bitrest", ctypes.c_int)]
