"""ctypes binding for the native CPU rasterizer (built on demand with g++).

Host-side counterpart of render.rasterizer (the TPU path): same buffer
semantics, C ABI, no Cython/pybind dependency. Use when rendering must run on
the host (e.g. CLI visualization without a TPU attached) — call
``native_available()`` first; everything degrades to the JAX path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rasterizer.cpp")
_LIB = os.path.join(_DIR, "libdad3d_raster.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-march=native",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.dad3d_rasterize_buffers.argtypes = [
            f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p, f32p,
        ]
        lib.dad3d_shade.argtypes = [
            i32p, f32p, f32p, i32p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.dad3d_vertex_normals.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int, f32p]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


def rasterize_buffers_native(
    vertices: np.ndarray, faces: np.ndarray, height: int, width: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None, "native rasterizer unavailable (g++ build failed)"
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    depth = np.full((height, width), -1e8, np.float32)
    tri_id = np.full((height, width), -1, np.int32)
    bary = np.zeros((height, width, 3), np.float32)
    lib.dad3d_rasterize_buffers(
        vertices, len(vertices), faces, len(faces), height, width, depth, tri_id, bary
    )
    return depth, tri_id, bary


def rasterize_native(
    vertices: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray,
    bg: Optional[np.ndarray] = None,
    height: int = 256,
    width: int = 256,
    alpha: float = 1.0,
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native rasterizer unavailable (g++ build failed)"
    if bg is None:
        bg = np.zeros((height, width, 3), np.uint8)
    image = np.ascontiguousarray(bg.copy(), np.uint8)
    height, width, channels = image.shape
    depth, tri_id, bary = rasterize_buffers_native(vertices, faces, height, width)
    colors = np.ascontiguousarray(colors, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    lib.dad3d_shade(faces, colors, bary, tri_id, image, height, width, channels, alpha)
    return image


def vertex_normals_native(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native rasterizer unavailable (g++ build failed)"
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    normals = np.zeros_like(vertices)
    lib.dad3d_vertex_normals(vertices, len(vertices), faces, len(faces), normals)
    return normals
