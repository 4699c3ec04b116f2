"""Python side of the C ABI bridge (pdbridge parity).

The reference ships a plain-C handle API so non-Python hosts can drive the
solver (reference: PYTHON/pdbridge.h:27-37 — pdbridge_init / factor /
solve / logdet / free). Here the library core is Python/JAX, so the C
surface is a thin embedded-CPython shim (ops/host/native/bridge.cpp) that
marshals raw pointers into numpy arrays and calls the handle registry in
this module.

Build the shared library with :func:`build_bridge`; link a C program
against it (see tests/test_cbridge.py for a complete C consumer that
solves the reference's g20.rua through the shim).
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys

import numpy as np

_HANDLES: dict[int, dict] = {}
_NEXT = itertools.count(1)
_LAST_ERROR = ""


def last_error() -> str:
    return _LAST_ERROR


def _set_error(msg: str) -> None:
    global _LAST_ERROR
    _LAST_ERROR = msg


def init(n: int, colptr, rowind, nzval_re, nzval_im=None) -> int:
    """Register a CSC matrix; returns a positive handle (0 on error)."""
    import scipy.sparse as sp
    try:
        colptr = np.asarray(colptr, dtype=np.int64)
        rowind = np.asarray(rowind, dtype=np.int64)
        vals = np.asarray(nzval_re, dtype=np.float64)
        if nzval_im is not None:
            vals = vals + 1j * np.asarray(nzval_im, dtype=np.float64)
        A = sp.csc_matrix((vals.copy(), rowind.copy(), colptr.copy()),
                          shape=(int(n), int(n)))
        h = next(_NEXT)
        _HANDLES[h] = dict(A=A, lu=None)
        return h
    except Exception as e:          # noqa: BLE001 — crosses the C ABI
        _set_error(f"{type(e).__name__}: {e}")
        return 0


def factor(h: int, options_json: str = "") -> int:
    """Factor the handle's matrix. Returns 0 on success, the singular
    pivot index (info > 0) for singular matrices, -1 on error."""
    from ..models.driver import SparseLU
    from .options import Options
    try:
        entry = _HANDLES[int(h)]
        kw = json.loads(options_json) if options_json else {}
        if "dtype" not in kw:
            kw["dtype"] = ("complex64" if entry["A"].dtype.kind == "c"
                           else "float32")
        entry["lu"] = SparseLU(entry["A"], Options(**kw))
        return int(entry["lu"].info)
    except Exception as e:          # noqa: BLE001
        _set_error(f"{type(e).__name__}: {e}")
        return -1


def solve(h: int, b: np.ndarray, nrhs: int, trans: int = 0,
          refine: bool = True) -> int:
    """Solve in place: b (nrhs*n, flattened column-major per RHS) is
    overwritten with x. trans: 0/1/2 = N/T/H. Returns 0 or -1."""
    from .options import Trans
    try:
        entry = _HANDLES[int(h)]
        lu = entry["lu"]
        if lu is None:
            raise RuntimeError("factor() must precede solve()")
        n = lu.n
        B = b[: n * nrhs].reshape(nrhs, n).T
        tr = (Trans.NOTRANS, Trans.TRANS, Trans.CONJ)[int(trans)]
        x = lu.solve(B, trans=tr)
        if refine and tr == Trans.NOTRANS:
            x, _berr = lu.refine(B, x)
        b[: n * nrhs] = np.ascontiguousarray(x.T).reshape(-1)
        return 0
    except Exception as e:          # noqa: BLE001
        _set_error(f"{type(e).__name__}: {e}")
        return -1


def logdet(h: int) -> tuple:
    """(sign_re, sign_im, logabs) of det(A); (0, 0, nan) on error."""
    try:
        lu = _HANDLES[int(h)]["lu"]
        if lu is None:
            raise RuntimeError("factor() must precede logdet()")
        sign, logabs = lu.logdet()
        sign = complex(sign)
        return (float(sign.real), float(sign.imag), float(logabs))
    except Exception as e:          # noqa: BLE001
        _set_error(f"{type(e).__name__}: {e}")
        return (0.0, 0.0, float("nan"))


def read_matrix(path: str) -> int:
    """Load a Harwell-Boeing/Rutherford-Boeing/MatrixMarket file into a
    fresh handle (the dcreate_matrix role for C consumers)."""
    from .io import read_matrix as _read
    try:
        A = _read(path).tocsc()
        h = next(_NEXT)
        _HANDLES[h] = dict(A=A, lu=None)
        return h
    except Exception as e:          # noqa: BLE001
        _set_error(f"{type(e).__name__}: {e}")
        return 0


def handle_n(h: int) -> int:
    try:
        return int(_HANDLES[int(h)]["A"].shape[0])
    except Exception as e:          # noqa: BLE001
        _set_error(f"{type(e).__name__}: {e}")
        return -1


def matvec(h: int, x: np.ndarray, out: np.ndarray) -> int:
    """out = A @ x (for C-side residual checks)."""
    try:
        A = _HANDLES[int(h)]["A"]
        out[: A.shape[0]] = np.asarray(A @ x[: A.shape[1]]).real
        return 0
    except Exception as e:          # noqa: BLE001
        _set_error(f"{type(e).__name__}: {e}")
        return -1


def free(h: int) -> None:
    _HANDLES.pop(int(h), None)


# ---------------------------------------------------------------------------
# building the C shim
# ---------------------------------------------------------------------------


def build_bridge(cache_dir: str | None = None) -> str:
    """Compile ops/host/native/bridge.cpp into libsuperlu_dist_tpu.so
    (embedded-CPython). Returns the .so path."""
    import hashlib
    import sysconfig
    src = os.path.join(os.path.dirname(__file__), "..", "ops", "host",
                       "native", "bridge.cpp")
    src = os.path.abspath(src)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = cache_dir or os.environ.get(
        "SLU_TPU_NATIVE_CACHE", "/tmp/slu_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"libsuperlu_dist_tpu-{digest}.so")
    if os.path.exists(so):
        return so
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = sysconfig.get_config_var("LDVERSION") or \
        f"{sys.version_info.major}.{sys.version_info.minor}"
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{inc}", src, "-o", tmp,
           f"-L{libdir}", f"-Wl,-rpath,{libdir}", f"-lpython{ver}"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)
    return so


def bridge_header() -> str:
    """Path of the public C header (superlu_dist_tpu.h)."""
    return os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "ops", "host", "native",
        "superlu_dist_tpu.h"))
