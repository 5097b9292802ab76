"""Native (C++) data-staging runtime, with pure-Python fallback.

Builds `loader.cpp` into a shared library on first use (g++ -O3, cached
next to the source) and binds it via ctypes — the environment ships no
pybind11, and the ABI is 4 flat C functions, so ctypes is the right-sized
binding. Falls back to a numpy loop when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED:
            return None
        src = Path(__file__).parent / "loader.cpp"
        out_dir = Path(
            os.environ.get("UMHS_NATIVE_CACHE", Path.home() / ".cache" / "umhs_tpu")
        )
        out_dir.mkdir(parents=True, exist_ok=True)
        lib_path = out_dir / "libumhs_loader.so"
        if not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime:
            try:
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-std=c++17",
                        "-shared",
                        "-fPIC",
                        "-pthread",
                        str(src),
                        "-o",
                        str(lib_path),
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _BUILD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(str(lib_path))
            lib.umhs_load_npy_f32.restype = ctypes.c_int
            lib.umhs_load_npy_f32.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_int,
                ctypes.c_int,
            ]
            _LIB = lib
            return lib
        except OSError:
            _BUILD_FAILED = True
            return None


def parallel_load_cubes(
    paths: Sequence,
    item_shape: Sequence[int],
    clamp01: bool = True,
    n_threads: Optional[int] = None,
) -> np.ndarray:
    """Load N same-shape .npy arrays into one (N, *item_shape) float32 stack.

    Uses the native multithreaded loader when available; numpy fallback
    otherwise. All arrays must match `item_shape` exactly.
    """
    n = len(paths)
    out = np.empty((n, *item_shape), dtype=np.float32)
    elems = int(np.prod(item_shape))
    lib = _build_lib()
    if lib is not None and n > 0:
        c_paths = (ctypes.c_char_p * n)(
            *[str(p).encode() for p in paths]
        )
        threads = n_threads or min(os.cpu_count() or 4, 16)
        rc = lib.umhs_load_npy_f32(
            c_paths,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            elems,
            threads,
            1 if clamp01 else 0,
        )
        if rc == 0:
            return out
        # fall through to numpy on failure (unsupported dtype etc.)
    for i, p in enumerate(paths):
        raw = np.load(p)
        if raw.shape != tuple(item_shape):
            raise ValueError(f"{p}: shape {raw.shape} != {tuple(item_shape)}")
        arr = raw.astype(np.float32)
        if np.issubdtype(raw.dtype, np.integer):
            arr = arr / float(np.iinfo(raw.dtype).max)
        out[i] = np.clip(arr, 0.0, 1.0) if clamp01 else arr
    return out
