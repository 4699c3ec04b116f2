"""Native (C++) host kernels, built on demand with g++ and loaded via
ctypes (the image has no pybind11; the C ABI + ctypes is the bridge, like
the reference's PYTHON/pdbridge ctypes layer)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "symbolic.cpp")
_lib = None
_tried = False


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("SLU_TPU_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(),
                                        "slu_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"symbolic-{digest}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return so


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SLU_TPU_NATIVE", "1") == "0":
        return None
    try:
        lib = ctypes.CDLL(_build())
    except Exception:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.slu_block_symbolic.restype = ctypes.c_void_p
    lib.slu_block_symbolic.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                       i64p, i64p]
    lib.slu_sym_size.restype = ctypes.c_int64
    lib.slu_sym_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.slu_sym_copy.restype = None
    lib.slu_sym_copy.argtypes = [ctypes.c_void_p, ctypes.c_int, i64p]
    lib.slu_sym_free.restype = None
    lib.slu_sym_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


_FIELDS = [
    "diag_slot", "l_ptr", "l_slots", "u_ptr", "u_slots",
    "g_ptr", "g_l", "g_u", "g_t",
    "slot_row", "slot_col", "slot_step", "step_level", "block_parent",
    "lsol_gptr", "lsol_gslot", "lsol_gsrc", "lsol_gdst", "lsol_dptr",
    "lsol_diag",
    "usol_gptr", "usol_gslot", "usol_gsrc", "usol_gdst", "usol_dptr",
    "usol_diag",
]


def native_block_symbolic(nb: int, ab_i: np.ndarray, ab_j: np.ndarray):
    """Run the C++ fill simulation + tape generation. Returns a dict of
    int64 arrays (see _FIELDS), or None if the native library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    ab_i = np.ascontiguousarray(ab_i, dtype=np.int64)
    ab_j = np.ascontiguousarray(ab_j, dtype=np.int64)
    h = lib.slu_block_symbolic(nb, len(ab_i), ab_i, ab_j)
    try:
        out = {}
        for w, name in enumerate(_FIELDS):
            n = lib.slu_sym_size(h, w)
            arr = np.empty(n, dtype=np.int64)
            if n:
                lib.slu_sym_copy(h, w, arr)
            out[name] = arr
        return out
    finally:
        lib.slu_sym_free(h)
