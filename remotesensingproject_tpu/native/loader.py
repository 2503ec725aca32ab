"""ctypes bindings for the native stack loader (librslf_native.so).

Falls back to returning None when the shared library has not been built
or cannot decode the format; callers then use the PIL path.  Build with
``make -C remotesensingproject_tpu/native``.

The C side decodes into float32 but reports the source dtype so Python
can restore it — the reference's normalization depends on it (u8 / 255
vs float / global max, rslf_depth_computation.hpp:269-289).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False

_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.float32}


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "librslf_native.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.rslf_read_stack.restype = ctypes.c_int
            lib.rslf_read_stack.argtypes = [
                ctypes.c_char_p,                  # folder
                ctypes.POINTER(ctypes.c_char_p),  # names
                ctypes.c_int,                     # count
                ctypes.c_char_p,                  # extension
                ctypes.c_void_p,                  # out buffer (float32)
                ctypes.POINTER(ctypes.c_int),     # dims [H, W, C, dtype]
                ctypes.c_int,                     # probe_only
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def read_stack(folder: str, names: List[str],
               extension: str) -> Optional[np.ndarray]:
    """Read a stack ``[S, H, W, C]`` via the native loader, in the
    SOURCE dtype (uint8 / uint16 / float32).

    Returns None when unavailable or undecodable (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None
    cnames = (ctypes.c_char_p * len(names))(*[n.encode() for n in names])
    dims = (ctypes.c_int * 4)()
    rc = lib.rslf_read_stack(folder.encode(), cnames, len(names),
                             extension.encode(), None, dims, 1)
    if rc != 0:
        return None
    H, W, C, dtype_code = dims[0], dims[1], dims[2], dims[3]
    out = np.empty((len(names), H, W, C), np.float32)
    rc = lib.rslf_read_stack(folder.encode(), cnames, len(names),
                             extension.encode(),
                             out.ctypes.data_as(ctypes.c_void_p), dims, 0)
    if rc != 0:
        return None
    dt = _DTYPES.get(dtype_code, np.float32)
    return out if dt is np.float32 else out.astype(dt)
