"""Native (C++) runtime components, loaded via ctypes.

The compute path of perphil-tpu is pure JAX/XLA/Pallas; the native layer
covers host-side runtime work that is inherently sequential — currently the
ILU(0) factorization (``csrc/structured_ilu.cpp``), the analogue of PETSc's
C factorization kernels. Everything degrades gracefully to numpy when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).parent
_CSRC = _NATIVE_DIR.parent.parent / "csrc"
_LIB_PATH = _NATIVE_DIR / "libperphil_native.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _CSRC / "structured_ilu.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(src), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.ilu0_factorize.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # vals
            i64p,                              # deltas
            ctypes.POINTER(ctypes.c_uint8),    # valid
            ctypes.c_int64,                    # nrows
            ctypes.c_int64,                    # noffs
            i64p,                              # lower_order
            ctypes.c_int64,                    # nlower
            i64p,                              # mmap
            i64p,                              # uppers
            i64p,                              # uppers_ptr
            ctypes.c_int64,                    # center
        ]
        lib.ilu0_factorize.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib
