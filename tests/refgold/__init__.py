"""Golden oracle: the reference's own MEX kernels, compiled in place.

Builds libre fgold.so from /root/reference/matlab/mex/{shiftdt,features,
resize,reduce,fconv}.cc (compiled directly from the read-only reference
tree — never copied) against the minimal mex.h shim in this directory,
and exposes NumPy-friendly wrappers that return row-major HWC arrays so
tests can compare this repo's kernels against the actual reference code
bit-for-bit.

If the reference tree or a compiler is unavailable, ``available()``
returns False and the parity tests skip.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from partsbaseddetector_tpu.utils.rounding import cround

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF_MEX = "/root/reference/matlab/mex"
_SO = os.path.join(_HERE, "librefgold.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False

# (source file, extra -D renames to avoid cross-TU symbol collisions)
_SOURCES = [
    ("shiftdt.cc", ["-DmexFunction=mex_shiftdt"]),
    ("features.cc", ["-DmexFunction=mex_features", "-Dprocess=process_features"]),
    ("resize.cc", ["-DmexFunction=mex_resize"]),
    ("reduce.cc", ["-DmexFunction=mex_reduce"]),
    # fconv.cc's process() is declared void* but never returns a value —
    # UB that g++ -O1+ compiles to a trap; -O0 emits a normal epilogue.
    ("fconv.cc", ["-DmexFunction=mex_fconv", "-Dprocess=process_fconv", "-O0"]),
]


def _build() -> bool:
    if not os.path.isdir(_REF_MEX):
        return False
    objs = []
    try:
        for src, defs in _SOURCES:
            obj = os.path.join(_HERE, src.replace(".cc", ".o"))
            cmd = [
                "g++", "-O2", "-fPIC", "-std=c++14", "-w", "-I", _HERE,
                *defs, "-c", os.path.join(_REF_MEX, src), "-o", obj,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            objs.append(obj)
        wrap_obj = os.path.join(_HERE, "wrap.o")
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++14", "-I", _HERE, "-c",
             os.path.join(_HERE, "wrap.cc"), "-o", wrap_obj],
            check=True, capture_output=True, timeout=120,
        )
        objs.append(wrap_obj)
        subprocess.run(
            ["g++", "-shared", *objs, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False
    finally:
        for obj in objs:
            if os.path.exists(obj):
                os.remove(obj)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        deps = [os.path.join(_HERE, "wrap.cc"), os.path.join(_HERE, "mex.h")]
        stale = not os.path.exists(_SO) or any(
            os.path.getmtime(_SO) < os.path.getmtime(d) for d in deps
        )
        if stale and not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        ci, cd = ctypes.c_int, ctypes.c_double
        lib.refgold_shiftdt.argtypes = [
            f64p, ci, ci, cd, cd, cd, cd, ci, ci, ci, ci, cd, f64p, i32p, i32p,
        ]
        lib.refgold_features.argtypes = [f64p, ci, ci, ci, f64p, i32p]
        lib.refgold_resize.argtypes = [f64p, ci, ci, ci, cd, f64p, i32p]
        lib.refgold_reduce.argtypes = [f64p, ci, ci, ci, f64p, i32p]
        lib.refgold_fconv.argtypes = [f64p, ci, ci, ci, f64p, ci, ci, f64p]
        lib.refgold_version.restype = ci
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _to_colmajor(hwc: np.ndarray) -> np.ndarray:
    """(H, W, C) row-major -> MATLAB column-major buffer, C contiguous."""
    return np.ascontiguousarray(hwc.transpose(2, 1, 0)).astype(
        np.float64, copy=False
    ).ravel()


def _from_colmajor(buf: np.ndarray, dims: Tuple[int, int, int]) -> np.ndarray:
    d0, d1, d2 = dims
    return buf[: d0 * d1 * d2].reshape(d2, d1, d0).transpose(2, 1, 0)


def shiftdt(
    vals: np.ndarray,
    w: np.ndarray,
    shift_x: int,
    shift_y: int,
    dlen_x: int,
    dlen_y: int,
    step: float = 1.0,
):
    """Run the reference shiftdt MEX on a (H, W) score map.

    w = [wx2, wx1, wy2, wy1] positive deformation costs exactly as the
    model stores them (the MEX negates internally). shift_* are 0-based
    here; the MEX takes 1-based offsets and emits 1-based pointers —
    both adjusted so outputs are 0-based (msg, Ix, Iy) row-major.
    Ref: matlab/mex/shiftdt.cc:57-116.
    """
    lib = _load()
    assert lib is not None
    h, wd = vals.shape
    vals_cm = np.ascontiguousarray(vals.T).astype(np.float64).ravel()
    M = np.zeros(dlen_y * dlen_x, dtype=np.float64)
    Ix = np.zeros(dlen_y * dlen_x, dtype=np.int32)
    Iy = np.zeros(dlen_y * dlen_x, dtype=np.int32)
    lib.refgold_shiftdt(
        vals_cm, h, wd,
        float(w[0]), float(w[1]), float(w[2]), float(w[3]),
        int(shift_x) + 1, int(shift_y) + 1, int(dlen_x), int(dlen_y),
        float(step), M, Ix, Iy,
    )
    msg = M.reshape(dlen_x, dlen_y).T
    ix = Ix.reshape(dlen_x, dlen_y).T - 1
    iy = Iy.reshape(dlen_x, dlen_y).T - 1
    return msg, ix, iy


def features(im_hwc: np.ndarray, sbin: int) -> np.ndarray:
    """Reference HOG (matlab/mex/features.cc) -> (bh, bw, 32) row-major."""
    lib = _load()
    assert lib is not None
    h, w, c = im_hwc.shape
    assert c == 3
    bh = max(cround(h / sbin) - 2, 0)
    bw = max(cround(w / sbin) - 2, 0)
    out = np.zeros(max(bh * bw * 32, 1), dtype=np.float64)
    odims = np.zeros(3, dtype=np.int32)
    lib.refgold_features(_to_colmajor(im_hwc), h, w, int(sbin), out, odims)
    assert tuple(odims) == (bh, bw, 32), (tuple(odims), (bh, bw, 32))
    return _from_colmajor(out, (bh, bw, 32))


def resize(im_hwc: np.ndarray, scale: float) -> np.ndarray:
    """Reference resize (matlab/mex/resize.cc) -> row-major HWC."""
    lib = _load()
    assert lib is not None
    h, w, c = im_hwc.shape
    dh, dw = cround(h * scale), cround(w * scale)
    out = np.zeros(max(dh * dw * c, 1), dtype=np.float64)
    odims = np.zeros(3, dtype=np.int32)
    lib.refgold_resize(_to_colmajor(im_hwc), h, w, c, float(scale), out, odims)
    assert tuple(odims) == (dh, dw, c)
    return _from_colmajor(out, (dh, dw, c))


def reduce(im_hwc: np.ndarray) -> np.ndarray:
    """Reference half-size reduce (matlab/mex/reduce.cc) -> row-major HWC."""
    lib = _load()
    assert lib is not None
    h, w, c = im_hwc.shape
    dh, dw = cround(h * 0.5), cround(w * 0.5)
    out = np.zeros(max(dh * dw * c, 1), dtype=np.float64)
    odims = np.zeros(3, dtype=np.int32)
    lib.refgold_reduce(_to_colmajor(im_hwc), h, w, c, out, odims)
    assert tuple(odims) == (dh, dw, c)
    return _from_colmajor(out, (dh, dw, c))


def fconv(feat_hwc: np.ndarray, filt_hwc: np.ndarray) -> np.ndarray:
    """Reference valid correlation (matlab/mex/fconv.cc) -> (oh, ow)."""
    lib = _load()
    assert lib is not None
    h, w, c = feat_hwc.shape
    fh, fw, fc = filt_hwc.shape
    assert c == fc
    oh, ow = h - fh + 1, w - fw + 1
    out = np.zeros(oh * ow, dtype=np.float64)
    lib.refgold_fconv(
        _to_colmajor(feat_hwc), h, w, c, _to_colmajor(filt_hwc), fh, fw, out
    )
    return out.reshape(ow, oh).T
