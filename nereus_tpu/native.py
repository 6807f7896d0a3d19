"""ctypes loader for the native C++ components (``native/``).

The library is compiled on demand with g++ (cached next to the source) and
every entry point has a pure-Python fallback, so the package works with no
toolchain present. ``nereus_tpu.native.available()`` reports which path is
active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "nereus_native.cpp")
_LIB_PATH = os.path.splitext(_SRC)[0] + ".so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.nereus_sample_box.restype = ctypes.c_int64
        lib.nereus_sample_box.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_void_p]
        lib.nereus_compute_vbi.restype = None
        lib.nereus_compute_vbi.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
        lib.nereus_rasterize.restype = None
        lib.nereus_rasterize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def sample_box(box_min, box_max, radius) -> np.ndarray | None:
    """Native AABB-shell sampling; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    lo = np.ascontiguousarray(box_min, dtype=np.float64)
    hi = np.ascontiguousarray(box_max, dtype=np.float64)
    count = lib.nereus_sample_box(_dptr(lo), _dptr(hi), float(radius), None)
    out = np.empty((count, 3), dtype=np.float64)
    lib.nereus_sample_box(_dptr(lo), _dptr(hi), float(radius),
                          out.ctypes.data_as(ctypes.c_void_p))
    return out


def compute_vbi(positions, interaction_radius, kernel_set_id: int
                ) -> np.ndarray | None:
    """Native Akinci volume computation; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    m = pos.shape[0]
    out = np.empty((m,), dtype=np.float64)
    lib.nereus_compute_vbi(_dptr(pos), m, float(interaction_radius),
                           int(kernel_set_id), _dptr(out))
    return out


def rasterize(pos, colors, view, proj, width, height, particle_radius,
              point_scale, max_sprite, fov_deg, img) -> bool:
    """Native z-buffered point-sprite rasterization into ``img`` (in place).

    Returns False if the library is unavailable (caller falls back).
    """
    lib = _load()
    if lib is None:
        return False
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    colors = np.ascontiguousarray(colors, dtype=np.float32)
    view = np.ascontiguousarray(view, dtype=np.float64)
    proj = np.ascontiguousarray(proj, dtype=np.float64)
    assert img.flags["C_CONTIGUOUS"] and img.dtype == np.uint8
    lib.nereus_rasterize(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.shape[0], _dptr(view), _dptr(proj), int(width), int(height),
        float(particle_radius), float(point_scale), int(max_sprite),
        float(fov_deg), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return True
