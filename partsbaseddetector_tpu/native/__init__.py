"""ctypes bindings for the native C++ kernel library (native/pbd_kernels.cc).

The library is built on first use with g++ (-O3 -march=native -fopenmp)
and cached next to the source; `available()` reports whether a compiler
/ binary is usable so callers can fall back to the NumPy reference
implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..utils.rounding import cround

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "pbd_kernels.cc",
)
_SO = os.path.join(os.path.dirname(_SRC), "libpbd_kernels.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        i64, f32p, f64p, i32p, u8p = (
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
        )
        lib.pbd_hog.argtypes = [f32p, i64, i64, i64, f32p]
        lib.pbd_resize.argtypes = [f32p, i64, i64, i64, ctypes.c_double, f32p, f32p]
        lib.pbd_reduce.argtypes = [f32p, i64, i64, i64, f32p, f32p]
        lib.pbd_shiftdt.argtypes = [
            f64p, i64, i64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i64, i64, i64, i64, i64, f64p, i32p, i32p,
        ]
        lib.pbd_fconv_valid.argtypes = [f32p, i64, i64, i64, f32p, i64, i64, f32p]
        lib.pbd_paint_nms.argtypes = [f64p, i64, i64, i64, ctypes.c_double, u8p]
        lib.pbd_version.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def hog(im: np.ndarray, sbin: int) -> np.ndarray:
    lib = _load()
    im = np.ascontiguousarray(im, dtype=np.float32)
    h, w, _ = im.shape
    bh, bw = cround(h / sbin), cround(w / sbin)
    out = np.zeros((max(bh - 2, 0), max(bw - 2, 0), 32), dtype=np.float32)
    lib.pbd_hog(im, h, w, sbin, out)
    return out


def resize(im: np.ndarray, scale: float) -> np.ndarray:
    lib = _load()
    im = np.ascontiguousarray(im, dtype=np.float32)
    h, w, c = im.shape
    dh, dw = cround(h * scale), cround(w * scale)
    out = np.zeros((dh, dw, c), dtype=np.float32)
    tmp = np.zeros((dh, w, c), dtype=np.float32)
    lib.pbd_resize(im, h, w, c, scale, out, tmp)
    return out


def reduce(im: np.ndarray) -> np.ndarray:
    lib = _load()
    im = np.ascontiguousarray(im, dtype=np.float32)
    h, w, c = im.shape
    dh, dw = cround(h * 0.5), cround(w * 0.5)
    out = np.zeros((dh, dw, c), dtype=np.float32)
    tmp = np.zeros((dh, w, c), dtype=np.float32)
    lib.pbd_reduce(im, h, w, c, out, tmp)
    return out


def shiftdt(score, w, shift_x, shift_y, dlen_x, dlen_y, step=1):
    lib = _load()
    score = np.ascontiguousarray(score, dtype=np.float64)
    h, wd = score.shape
    msg = np.zeros((dlen_y, dlen_x), dtype=np.float64)
    ix = np.zeros((dlen_y, dlen_x), dtype=np.int32)
    iy = np.zeros((dlen_y, dlen_x), dtype=np.int32)
    lib.pbd_shiftdt(
        score, h, wd,
        float(w[0]), float(w[1]), float(w[2]), float(w[3]),
        int(shift_x), int(shift_y), int(dlen_x), int(dlen_y), int(step),
        msg, ix, iy,
    )
    return msg, ix, iy


def fconv_valid(feat: np.ndarray, filt: np.ndarray) -> np.ndarray:
    lib = _load()
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    filt = np.ascontiguousarray(filt, dtype=np.float32)
    h, w, c = feat.shape
    fh, fw, fc = filt.shape
    assert c == fc
    out = np.zeros((h - fh + 1, w - fw + 1), dtype=np.float32)
    lib.pbd_fconv_valid(feat, h, w, c, filt, fh, fw, out)
    return out


def paint_nms(boxes: np.ndarray, im_shape, overlap: float = 0.0) -> np.ndarray:
    """boxes (N, 4) sorted by descending score -> bool keep mask."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    keep = np.zeros(len(boxes), dtype=np.uint8)
    lib.pbd_paint_nms(boxes, len(boxes), im_shape[0], im_shape[1], overlap, keep)
    return keep.astype(bool)


# reference-pipeline-compatible alias
def shift_dt_2d(score, w, shift_x, shift_y, dlen_x, dlen_y, step=1):
    return shiftdt(score, w, shift_x, shift_y, dlen_x, dlen_y, step)
