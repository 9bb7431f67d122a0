"""ctypes bindings for the native C++ host utilities (native/cg_native.cpp).

The shared library is built lazily (``make -C native``) on first use; every
entry point has a pure-numpy fallback so the package works without a
toolchain.  ``available()`` reports whether the fast path is active.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["available", "construct_chunks", "spline_eval",
           "paint_radial_chunks", "trilinear"]

_LIB_PATH = Path(__file__).parent / "libcg_native.so"
_NATIVE_DIR = Path(__file__).parents[2] / "native"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.cg_construct_chunks.restype = ctypes.c_int64
    lib.cg_construct_chunks.argtypes = [u32p, ctypes.c_uint32, u32p]
    lib.cg_spline_eval.restype = None
    lib.cg_spline_eval.argtypes = [f64p] * 5 + [ctypes.c_int64, f64p,
                                                ctypes.c_int64, f64p]
    lib.cg_paint_radial_chunks.restype = None
    lib.cg_paint_radial_chunks.argtypes = [f64p] * 5 + [
        ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64, f64p, f64p,
        f64p]
    lib.cg_trilinear.restype = None
    lib.cg_trilinear.argtypes = [f64p, ctypes.c_int64, f64p, ctypes.c_int64,
                                 f64p, ctypes.c_int64, f64p, f64p,
                                 ctypes.c_int64, f64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def construct_chunks(domain_dimensions, chunksize: int) -> np.ndarray:
    """Chunkmap uint32[3, 2, N] (see data_structures.construct_chunks)."""
    lib = _load()
    dd = np.ascontiguousarray(domain_dimensions, dtype=np.uint32)
    n = int(np.prod(dd // np.uint32(chunksize)))
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty(3 * 2 * n, dtype=np.uint32)
    got = lib.cg_construct_chunks(dd, np.uint32(chunksize), out)
    assert got == n
    return out.reshape(3, 2, n)


def _spline_arrays(sp):
    """Flatten a core.interp.CubicSpline into contiguous f64 arrays."""
    return tuple(np.ascontiguousarray(np.asarray(v), dtype=np.float64)
                 for v in (sp.x, sp.a, sp.b, sp.c, sp.d))


def spline_eval(sp, q) -> np.ndarray:
    """Evaluate a CubicSpline at points q on the host (multithreaded)."""
    lib = _load()
    xs, a, b, c, d = _spline_arrays(sp)
    q = np.ascontiguousarray(q, dtype=np.float64)
    if lib is None:
        from ..core.interp import spline_eval as jse

        return np.asarray(jse(sp, q))
    out = np.empty(q.size, dtype=np.float64)
    lib.cg_spline_eval(xs, a, b, c, d, xs.size, q.ravel(), q.size, out)
    return out.reshape(q.shape)


def paint_radial_chunks(sp, starts, chunksize, deltas, left,
                        out=None) -> np.ndarray:
    """Evaluate a radial spline field on chunk cell centers.

    starts: (N, 3) first-cell indices; returns (N, cs, cs, cs) blocks in
    the on-disk z-first layout block[k, j, i] = f(x_i, y_j, z_k) (matching
    data_structures._paint_chunk and the reference reader's transpose,
    reference frontend/io.py:81).

    ``out``: optional preallocated (N, cs, cs, cs) f64 buffer.  A fresh
    ~100 MB allocation per batch is first-touch page faults each call
    (measured 3-4x the paint cost at 512^3); streaming callers should
    allocate once and pass it back in."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xs, a, b, c, d = _spline_arrays(sp)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = starts.shape[0]
    cs = int(chunksize)
    deltas = np.ascontiguousarray(deltas, dtype=np.float64)
    left = np.ascontiguousarray(left, dtype=np.float64)
    if out is None:
        out = np.empty((n, cs, cs, cs), dtype=np.float64)
    else:
        assert out.dtype == np.float64 and out.flags.c_contiguous \
            and out.shape == (n, cs, cs, cs), \
            f"out buffer must be C-contiguous f64 {(n, cs, cs, cs)}"
    lib.cg_paint_radial_chunks(xs, a, b, c, d, xs.size, starts.ravel(), n,
                               cs, deltas, left,
                               out.reshape(-1))
    return out


def trilinear(xs, ys, zs, field, pts) -> np.ndarray:
    """Trilinear sample of field[(nx,ny,nz)] at pts[(N,3)]; 0 outside."""
    lib = _load()
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    ys = np.ascontiguousarray(ys, dtype=np.float64)
    zs = np.ascontiguousarray(zs, dtype=np.float64)
    field = np.ascontiguousarray(field, dtype=np.float64)
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    if lib is None:
        from scipy.interpolate import RegularGridInterpolator

        rgi = RegularGridInterpolator((xs, ys, zs), field,
                                      bounds_error=False, fill_value=0.0)
        return rgi(pts)
    out = np.empty(pts.shape[0], dtype=np.float64)
    lib.cg_trilinear(xs, xs.size, ys, ys.size, zs, zs.size, field.ravel(),
                     pts.ravel(), pts.shape[0], out)
    return out
