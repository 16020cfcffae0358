"""Native host-side kernels (C, built on demand, ctypes-bound).

Build: `cc -O3 -shared -fPIC rle.c` at first import; falls back to the
pure-Python implementations in `sam6d_tpu.ops.masks` if no compiler is
available. `python -m sam6d_tpu.native.build` prebuilds explicitly.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_rle.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> Optional[str]:
    src = os.path.join(_HERE, "rle.c")
    if os.path.exists(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(src):
        return _SO
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cc, "-O3", "-shared", "-fPIC", "-o", _SO, src],
                           check=True, capture_output=True)
            return _SO
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.rle_encode_fortran.restype = ctypes.c_long
    lib.rle_encode_fortran.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long]
    lib.rle_decode_fortran.restype = None
    lib.rle_decode_fortran.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p]
    _lib = lib
    return lib


def rle_encode_counts(mask: np.ndarray):
    """(H, W) binary -> {'counts': [...], 'size': [H, W]} (fortran order,
    leading zero-run). Native with Python fallback."""
    lib = _load()
    h, w = mask.shape
    if lib is None:
        from ..ops.masks import mask_to_rle_counts
        return mask_to_rle_counts(mask)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    cap = h * w + 2
    out = np.empty(cap, np.uint32)
    n = lib.rle_encode_fortran(m.ctypes.data, h, w, out.ctypes.data, cap)
    assert n > 0
    return {"counts": out[:n].tolist(), "size": [h, w]}


def rle_decode_counts(rle) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..ops.masks import rle_counts_to_mask
        return rle_counts_to_mask(rle)
    h, w = rle["size"]
    counts = np.ascontiguousarray(np.asarray(rle["counts"], np.uint32))
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode_fortran(counts.ctypes.data, len(counts), h, w,
                           out.ctypes.data)
    return out.astype(bool)
