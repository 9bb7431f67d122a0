"""ctypes bindings for the native C++ host utilities (native/cg_native.cpp).

The shared library is built lazily (``make -C native``) on first use.
``spline_eval`` and ``trilinear`` fall back to jax/scipy when no
toolchain is available; ``construct_chunks`` and ``paint_radial_chunks``
are the *opt-in* fast engines behind higher-level numpy/device paths
(``data_structures.construct_chunks`` / ``add_model(engine="device")``)
and raise a pointer to those paths instead.  ``available()`` reports
whether the fast path is active.

Build discipline: ``make`` runs on every first load (its mtime rule
makes it a no-op when fresh), so a stale ``libcg_native.so`` left over
from an older source tree is rebuilt rather than dlopen'd; a symbol
missing from a loaded library downgrades to unavailable instead of
raising.  Builds and loads take an exclusive file lock so concurrent
first-use processes cannot CDLL a half-written .so.
"""

from __future__ import annotations

import contextlib
import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["available", "construct_chunks", "spline_eval",
           "paint_radial_chunks", "trilinear"]

_LIB_PATH = Path(__file__).parent / "libcg_native.so"
_NATIVE_DIR = Path(__file__).parents[2] / "native"
_lib = None
_tried = False


@contextlib.contextmanager
def _build_lock():
    """Exclusive lock serializing build+first-load across processes."""
    try:
        import fcntl

        fd = os.open(str(_LIB_PATH.parent / ".build.lock"),
                     os.O_CREAT | os.O_RDWR, 0o644)
    except OSError:  # pragma: no cover - read-only install
        yield
        return
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _bind(lib):
    """Declare signatures; raises AttributeError on a stale .so that
    predates a symbol."""
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


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    with _build_lock():
        # always run make when a toolchain is present: its cg_native.cpp
        # mtime rule is a no-op on a fresh .so and REBUILDS a stale one
        # (dlopening a library older than the source is how missing
        # symbols / silently-divergent native code happen)
        if (_NATIVE_DIR / "Makefile").exists():
            try:
                subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                pass  # fall through: a prebuilt .so may still be usable
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            _bind(lib)
        except (OSError, AttributeError):
            # torn write from a non-cooperating process, or a stale .so
            # with no toolchain to rebuild it: downgrade, don't crash
            return None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def construct_chunks(domain_dimensions, chunksize: int) -> np.ndarray:
    """Chunkmap uint32[3, 2, N] (see data_structures.construct_chunks,
    which holds the numpy fallback and picks the engine)."""
    lib = _load()
    dd = np.ascontiguousarray(domain_dimensions, dtype=np.uint32)
    if dd.shape != (3,):
        raise ValueError(f"domain_dimensions must be 3 values, got "
                         f"shape {dd.shape}")  # C++ reads exactly dd[0..2]
    n = int(np.prod(dd // np.uint32(chunksize)))
    if lib is None:
        raise RuntimeError("native library unavailable — use "
                           "data_structures.construct_chunks (numpy)")
    out = np.empty(3 * 2 * n, dtype=np.uint32)
    got = lib.cg_construct_chunks(dd, np.uint32(chunksize), out)
    if got != n:
        raise RuntimeError(f"native chunk count {got} != expected {n}")
    return out.reshape(3, 2, n)


def _spline_arrays(sp):
    """Flatten a core.interp.CubicSpline into contiguous f64 arrays."""
    xs, a, b, c, d = (np.ascontiguousarray(np.asarray(v), dtype=np.float64)
                      for v in (sp.x, sp.a, sp.b, sp.c, sp.d))
    if xs.size < 2:  # the C++ evaluators index interval 0 unconditionally
        raise ValueError("spline needs at least 2 knots")
    return xs, a, b, c, d


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
        raise RuntimeError("native library unavailable — use "
                           "add_model(engine=\"device\")")
    xs, a, b, c, d = _spline_arrays(sp)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = starts.shape[0]
    cs = int(chunksize)
    deltas = np.ascontiguousarray(deltas, dtype=np.float64)
    left = np.ascontiguousarray(left, dtype=np.float64)
    if out is None:
        out = np.empty((n, cs, cs, cs), dtype=np.float64)
    elif (out.dtype != np.float64 or not out.flags.c_contiguous
          or out.shape != (n, cs, cs, cs)):
        # a real exception, not an assert: an undersized buffer handed
        # to the C++ painter is heap corruption, and asserts vanish
        # under python -O
        raise ValueError(
            f"out buffer must be C-contiguous f64 {(n, cs, cs, cs)}, got "
            f"{out.dtype} {out.shape} contiguous={out.flags.c_contiguous}")
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
    if field.shape != (xs.size, ys.size, zs.size):
        raise ValueError(f"field shape {field.shape} != grid "
                         f"{(xs.size, ys.size, zs.size)}")
    if min(xs.size, ys.size, zs.size) < 2:
        # no interval exists on a 1-point axis; the scipy fallback and
        # the C++ kernel would otherwise disagree (error vs all-outside)
        raise ValueError("trilinear needs >= 2 coordinates per axis")
    if lib is None:
        from scipy.interpolate import RegularGridInterpolator

        rgi = RegularGridInterpolator((xs, ys, zs), field,
                                      bounds_error=False, fill_value=0.0)
        return rgi(pts)
    out = np.empty(pts.shape[0], dtype=np.float64)
    lib.cg_trilinear(xs, xs.size, ys, ys.size, zs, zs.size, field.ravel(),
                     pts.ravel(), pts.shape[0], out)
    return out
