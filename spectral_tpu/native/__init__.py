"""spectral_tpu.native — C++ host runtime (ctypes-loaded).

Builds lazily with the system compiler on first import; every entry point has
a numpy fallback in spectral_tpu.train.data, so the package works without a
toolchain (mirroring the reference's optional-CUDA-extension design,
README.md:301-308).

Build manually:  python -m spectral_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_HERE = Path(__file__).parent
_LIB = _HERE / "libspectral_host.so"


def build(force: bool = False) -> bool:
    """Compile corpus.cpp into libspectral_host.so.  Returns success."""
    src = _HERE / "corpus.cpp"
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= src.stat().st_mtime:
        return True
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC", str(src), "-o", str(_LIB)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except Exception:
            continue
    return False


def _load():
    if not _LIB.exists():
        if not build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    u8 = ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.sanitize_ascii.argtypes = [u8, u8, ctypes.c_int64]
    lib.gather_windows_i32.argtypes = [u8, ctypes.c_int64, i64, ctypes.c_int64, ctypes.c_int64, i32]
    lib.lm_batch_i32.argtypes = [u8, ctypes.c_int64, i64, ctypes.c_int64, ctypes.c_int64, i32, i32]
    lib.word_boundaries.argtypes = [i32, ctypes.c_int64, ctypes.c_int64, f32]
    return lib


_lib = _load()
NATIVE_AVAILABLE = _lib is not None
