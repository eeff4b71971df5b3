"""ctypes bindings for the native host-side graph kernels (csrc/fastgraph.cpp).

The native library accelerates one-time host preprocessing that is awkward to
vectorize in numpy: Vose alias-table construction over millions of rows and
bulk parsing of reference text dumps.  Pure-numpy fallbacks exist for every
entry point, so the library is optional; ``make -C pathnet_tpu/csrc`` builds
``libfastgraph.so`` next to this file.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libfastgraph.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.build_alias_tables.restype = None
    lib.build_alias_tables.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_alias_tables(nbr: np.ndarray, prob: np.ndarray, deg: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    n, D = prob.shape
    nbr = np.ascontiguousarray(nbr, np.int32)
    prob32 = np.ascontiguousarray(prob, np.float32)
    deg = np.ascontiguousarray(deg, np.int32)
    lo = np.ascontiguousarray(nbr.copy())
    hi = np.ascontiguousarray(nbr.copy())
    split = np.ones((n, D), np.float32)
    lib.build_alias_tables(n, D, nbr, prob32, deg, lo, hi, split)
    return lo, hi, split
