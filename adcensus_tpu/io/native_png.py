"""ctypes binding for the native PNG codec (native/png_codec.cpp).

The reference's only native I/O dependency is OpenCV's imread/imwrite
(main.cpp:12-17); this module is the engine's equivalent: a small C++
codec over the system zlib, compiled on first use into build/ and loaded
via ctypes. Callers fall back to PIL when the native path is
unavailable (e.g. no compiler) or the file uses an unsupported PNG
flavor (palette/interlaced).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_ROOT, "native", "png_codec.cpp")
_SO = os.path.join(_ROOT, "build", "libpng_codec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", _SRC, "-lz",
                     "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.png_probe.restype = ctypes.c_int
            lib.png_decode.restype = ctypes.c_int
            lib.png_encode.restype = ctypes.c_long
            lib.png_encode_bound.restype = ctypes.c_long
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def decode(path: str) -> Optional[np.ndarray]:
    """Decode a PNG natively. Returns (H, W) uint8, (H, W) uint16,
    or (H, W, 3) uint8 — or None when unsupported (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    n = len(buf)
    w = ctypes.c_int()
    h = ctypes.c_int()
    depth = ctypes.c_int()
    ctype = ctypes.c_int()
    out_ch = ctypes.c_int()
    rc = lib.png_probe(
        buf, ctypes.c_long(n),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(depth),
        ctypes.byref(ctype), ctypes.byref(out_ch),
    )
    if rc != 0:
        return None
    ch = out_ch.value
    out = np.empty(h.value * w.value * ch, dtype=np.uint8)
    rc = lib.png_decode(
        buf, ctypes.c_long(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    if ch == 2:  # gray16, native endian
        return out.view(np.uint16).reshape(h.value, w.value)
    if ch == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, 3)


def encode(img: np.ndarray, path: str) -> bool:
    """Encode (H, W) or (H, W, 3) uint8 to a PNG file natively.
    Returns False when the native path is unavailable."""
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        ch = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, ch = img.shape
    else:
        return False
    bound = lib.png_encode_bound(w, h, ch)
    out = np.empty(int(bound), dtype=np.uint8)
    n = lib.png_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n <= 0:
        return False
    with open(path, "wb") as f:
        f.write(out[:n].tobytes())
    return True
