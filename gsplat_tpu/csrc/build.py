"""Lazy JIT build of the native IO extension.

Analog of the reference's lazy backend (gsplat/cuda/_backend.py:28-41 /
gsplat/_lazy_backend.py): the shared library is compiled with the host
toolchain on first use and cached next to the sources, keyed by a source
hash, so wheels need no prebuilt binaries. Falls back gracefully (callers
check `load() is None`) when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "io.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "GSPLAT_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gsplat_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"gsplat_tpu_io_{h}.so")


def load() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native IO library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            so = _cache_path()
            if not os.path.exists(so):
                tmp = so + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            c = ctypes.c_char_p
            ll = ctypes.c_longlong
            vp = ctypes.c_void_p
            lib.colmap_points3d_count.restype = ll
            lib.colmap_points3d_count.argtypes = [c]
            lib.colmap_points3d_read.restype = ll
            lib.colmap_points3d_read.argtypes = [c, vp, vp, vp]
            lib.colmap_images_count.restype = ll
            lib.colmap_images_count.argtypes = [c]
            lib.colmap_images_read.restype = ll
            lib.colmap_images_read.argtypes = [c, vp, vp, vp, vp, vp, ll]
            lib.colmap_cameras_count.restype = ll
            lib.colmap_cameras_count.argtypes = [c]
            lib.colmap_cameras_read.restype = ll
            lib.colmap_cameras_read.argtypes = [c, vp, vp, vp, vp, vp, vp]
            lib.ply_header.restype = ll
            lib.ply_header.argtypes = [c, vp, vp, ll, vp]
            lib.ply_read_vertices.restype = ll
            lib.ply_read_vertices.argtypes = [
                c, ctypes.c_int64, ll, ctypes.c_int32, vp,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB
