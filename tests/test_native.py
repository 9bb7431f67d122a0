"""Native C++ host utilities (ops/native.py <- native/cg_native.cpp)."""

import numpy as np
import pytest

from cluster_generator_tpu.ops import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_construct_chunks_matches_numpy():
    from cluster_generator_tpu import data_structures as ds

    cm = native.construct_chunks((128, 128, 64), 32)
    dd = np.array([128, 128, 64])
    counts = dd // 32
    ii, jj, kk = np.meshgrid(*[np.arange(c) for c in counts], indexing="ij")
    starts = np.stack([ii.ravel(), jj.ravel(), kk.ravel()]).astype(np.uint32) * 32
    ref = np.stack([starts, starts + 32], axis=1)
    assert np.array_equal(cm, ref)
    # and the public construct_chunks routes through the native path
    assert np.array_equal(ds.construct_chunks((128, 128, 64), 32), ref)


def test_spline_eval_matches_jax():
    import jax.numpy as jnp

    from cluster_generator_tpu.core.interp import cubic_spline, spline_eval

    x = jnp.asarray(np.logspace(-1, 4, 500))
    y = jnp.sin(x / 1000.0) + 1.0 / x
    sp = cubic_spline(x, y)
    q = np.logspace(-1.2, 4.1, 50_000)  # includes extrapolation both ends
    v_native = native.spline_eval(sp, q)
    v_jax = np.asarray(spline_eval(sp, jnp.asarray(q)))
    assert np.abs(v_native - v_jax).max() < 1e-14 * np.abs(v_jax).max()


def test_paint_radial_chunks():
    import jax.numpy as jnp

    from cluster_generator_tpu.core.interp import cubic_spline, spline_eval

    x = jnp.asarray(np.logspace(-1, 4, 300))
    sp = cubic_spline(x, 1.0 / x)
    starts = np.array([[0, 0, 0], [16, 16, 0]], dtype=np.int64)
    blocks = native.paint_radial_chunks(sp, starts, 16, [10.0] * 3,
                                        [-160.0] * 3)
    assert blocks.shape == (2, 16, 16, 16)
    # spot-check a cell
    i, j, k = 3, 5, 7
    r = np.sqrt(((-160 + (np.array([3, 5, 7]) + 0.5) * 10.0) ** 2).sum())
    assert blocks[0, i, j, k] == pytest.approx(
        float(spline_eval(sp, jnp.asarray([r]))[0]), rel=1e-12)


def test_trilinear_matches_scipy():
    from scipy.interpolate import RegularGridInterpolator

    rng = np.random.RandomState(0)
    xs = np.linspace(0, 1, 24)
    field = rng.rand(24, 24, 24)
    pts = rng.rand(5000, 3) * 1.2 - 0.1  # includes out-of-domain
    v_nat = native.trilinear(xs, xs, xs, field, pts)
    ref = RegularGridInterpolator((xs, xs, xs), field, bounds_error=False,
                                  fill_value=0.0)(pts)
    assert np.abs(v_nat - ref).max() < 1e-13


def test_input_validation_guards():
    """Undersized/ill-shaped inputs raise real exceptions BEFORE the C++
    kernels see them (a bad buffer handed to ctypes is heap corruption,
    and asserts vanish under python -O)."""
    import pytest

    with pytest.raises(ValueError, match="3 values"):
        native.construct_chunks((128, 128), 32)
    xs = np.linspace(0, 1, 8)
    field = np.zeros((8, 8, 8))
    with pytest.raises(ValueError, match="field shape"):
        native.trilinear(xs, xs, xs, np.zeros((8, 8, 7)),
                         np.zeros((4, 3)))
    with pytest.raises(ValueError, match=">= 2 coordinates"):
        native.trilinear(np.zeros(1), xs, xs, np.zeros((1, 8, 8)),
                         np.zeros((4, 3)))
    from cluster_generator_tpu.core.interp import cubic_spline

    sp = cubic_spline(np.linspace(1.0, 2.0, 16), np.ones(16))
    starts = np.zeros((2, 3), dtype=np.int64)
    if native.available():
        with pytest.raises(ValueError, match="out buffer"):
            native.paint_radial_chunks(sp, starts, 4, np.ones(3),
                                       np.zeros(3),
                                       out=np.empty((2, 4, 4, 3)))


def test_stale_library_is_rebuilt_not_dlopened(tmp_path):
    """A libcg_native.so older than cg_native.cpp is rebuilt on first
    load (make's mtime rule runs every time) — dlopening stale native
    code is how missing-symbol AttributeErrors and silently-divergent
    kernels happen."""
    import os
    import subprocess
    import sys

    so = os.path.join(os.path.dirname(native.__file__),
                      "libcg_native.so")
    if not os.path.exists(so):
        pytest.skip("native library not built")
    cpp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(native.__file__))), "native", "cg_native.cpp")
    old = os.path.getmtime(cpp) - 100.0
    os.utime(so, (old, old))
    code = (
        "from cluster_generator_tpu.ops import native\n"
        "import os\n"
        "assert native.available()\n"
        f"assert os.path.getmtime({so!r}) > {old!r}, 'not rebuilt'\n"
        "print('REBUILT OK')\n")
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-1500:]
    assert "REBUILT OK" in res.stdout
