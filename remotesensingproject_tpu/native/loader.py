"""ctypes bindings for the native stack loader (librslf_native.so).

Falls back to returning None when the shared library has not been built;
callers then use the PIL path.  Build with ``make -C native`` from the
package directory (see native/Makefile).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False


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
                ctypes.c_char_p,              # folder
                ctypes.POINTER(ctypes.c_char_p),  # names
                ctypes.c_int,                 # count
                ctypes.c_char_p,              # extension
                ctypes.c_void_p,              # out buffer (float32)
                ctypes.POINTER(ctypes.c_int),  # out dims [H, W, C]
                ctypes.c_int,                 # probe_only
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def read_stack(folder: str, names: List[str],
               extension: str) -> Optional[np.ndarray]:
    """Read a stack ``[S, H, W, C]`` float32 via the native loader.

    Returns None when the native library is unavailable or cannot decode
    the format (caller falls back to PIL).
    """
    lib = _load()
    if lib is None:
        return None
    cnames = (ctypes.c_char_p * len(names))(
        *[n.encode() for n in names])
    dims = (ctypes.c_int * 3)()
    rc = lib.rslf_read_stack(folder.encode(), cnames, len(names),
                             extension.encode(), None, dims, 1)
    if rc != 0:
        return None
    H, W, C = dims[0], dims[1], dims[2]
    out = np.empty((len(names), H, W, C), np.float32)
    rc = lib.rslf_read_stack(folder.encode(), cnames, len(names),
                             extension.encode(),
                             out.ctypes.data_as(ctypes.c_void_p), dims, 0)
    if rc != 0:
        return None
    return out
