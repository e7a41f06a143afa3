"""ctypes bindings for the native IO library (native/pcseg_io.cpp).

Builds the shared object on first use with g++ (cached next to the source);
every entry point has a pure-numpy fallback so the framework works without
a toolchain. pybind11 is not available in this environment — plain C ABI +
ctypes instead.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parents[1] / "native" / "pcseg_io.cpp"
_SO = _SRC.parent / "libpcseg_io.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.is_file() and _SRC.is_file():
        _build()
    if not _SO.is_file():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.load_kitti_scan.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int]
    lib.load_kitti_scan.restype = ctypes.c_int
    lib.load_kitti_labels.argtypes = [
        ctypes.c_char_p, i32p, ctypes.c_int, i32p, ctypes.c_int]
    lib.load_kitti_labels.restype = ctypes.c_int
    lib.aug_points_xyz.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.aug_points_xyz.restype = None
    lib.range_project.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_void_p, f32p, ctypes.c_void_p, f32p,
        i32p, i32p]
    lib.range_project.restype = None
    _lib = lib
    return _lib


def load_kitti_scan(path: str, cap: int = 200_000) -> Optional[np.ndarray]:
    """[N, 4] float32 or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty((cap, 4), np.float32)
    n = lib.load_kitti_scan(path.encode(), buf, cap)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:min(n, cap)].copy()


def load_kitti_labels(path: str, lut: np.ndarray,
                      cap: int = 200_000) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    lut32 = np.ascontiguousarray(lut, np.int32)
    buf = np.empty(cap, np.int32)
    n = lib.load_kitti_labels(path.encode(), lut32, len(lut32), buf, cap)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:min(n, cap)].copy()


def range_project_native(
    pts: np.ndarray,        # [N, 4] float32 xyzi
    labels: Optional[np.ndarray],
    h: int, w: int,
    fov_up: float = 3.0, fov_down: float = -25.0,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """(scan [H,W,6], label [H,W], mask [H,W], px [N], py [N]) or None."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    n = len(pts)
    scan = np.empty((h, w, 6), np.float32)
    mask = np.empty((h, w), np.float32)
    label_img = np.empty((h, w), np.int32)
    px = np.empty(n, np.int32)
    py = np.empty(n, np.int32)
    lab_ptr = None
    if labels is not None:
        labels = np.ascontiguousarray(labels, np.int32)
        lab_ptr = labels.ctypes.data_as(ctypes.c_void_p)
    lib.range_project(
        pts, n, h, w, np.float32(fov_up), np.float32(fov_down),
        lab_ptr, scan,
        label_img.ctypes.data_as(ctypes.c_void_p), mask, px, py)
    return scan, label_img, mask, px, py
