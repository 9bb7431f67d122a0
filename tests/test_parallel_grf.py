"""Grid-sharded GRF over the virtual mesh (parallel/fields.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from cluster_generator_tpu.parallel.fields import sharded_gaussian_random_field


def test_sharded_grf_rms_and_divergence():
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("ens",))
    gx, gy, gz = sharded_gaussian_random_field(
        jax.random.key(0), (32, 32, 32), (10.0, 10.0, 10.0), 50.0, 200.0,
        mesh, g_rms=2.0)
    # output sharded over 8 devices
    assert len(gx.sharding.device_set) == 8
    gx, gy, gz = map(np.asarray, (gx, gy, gz))
    rms = np.sqrt((gx**2 + gy**2 + gz**2).mean())
    assert abs(rms - 2.0) < 1e-5
    div = ((np.roll(gx, -1, 0) - np.roll(gx, 1, 0))
           + (np.roll(gy, -1, 1) - np.roll(gy, 1, 1))
           + (np.roll(gz, -1, 2) - np.roll(gz, 1, 2))) / (2 * 10.0)
    scale = np.abs(gx).mean() / 10.0
    assert np.abs(div).max() / scale < 1e-5  # f32 roundoff


def test_sharded_grf_spectrum_matches_single_device():
    """Same spectrum shape as the single-device generator (statistically)."""
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("ens",))
    n = 32
    gx, gy, gz = sharded_gaussian_random_field(
        jax.random.key(5), (n, n, n), (10.0, 10.0, 10.0), 20.0, 320.0, mesh,
        divergence_clean=False, g_rms=1.0)
    W = np.abs(np.fft.fftn(np.asarray(gx))) ** 2
    k = np.fft.fftfreq(n, d=10.0 / (2 * np.pi))
    kk = np.sqrt(k[:, None, None]**2 + k[None, :, None]**2
                 + k[None, None, :]**2)
    k1 = 2 * np.pi / 320.0
    k0 = 2 * np.pi / 20.0
    sel = (kk > 2 * k1) & (kk < k0 / 3)
    slope = np.polyfit(np.log(kk[sel]), np.log(W[sel]), 1)[0]
    assert -5.5 < slope < -2.0  # consistent with -11/3 given small grid


def test_two_process_sharded_grf(tmp_path):
    """TRUE multi-process grid-sharded GRF: two ``jax.distributed`` CPU
    processes form one 8-slab mesh; the pencil FFT's all-to-alls cross
    the process boundary.  Each process saves only its addressable
    slabs; the union must tile the grid, the two processes' global
    diagnostics must agree, and the assembled field must match a
    single-process run with the same key."""
    import json
    import socket
    import subprocess
    import sys as _sys
    from pathlib import Path

    worker = Path(__file__).parent / "workers" / "sharded_grf_worker.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    import os as _os

    env = {k: v for k, v in _os.environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    procs = [subprocess.Popen(
        [_sys.executable, str(worker), str(i), "2", str(port),
         str(tmp_path)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    diags = [json.loads((tmp_path / f"diag.{i}.json").read_text())
             for i in range(2)]
    # global reductions agree across processes
    assert diags[0]["rms"] == diags[1]["rms"]
    assert diags[0]["gsum"] == diags[1]["gsum"]
    # each process held a disjoint half of the 8 slabs; union tiles 0..28
    n = 32
    for name in ("gx", "gy", "gz"):
        s0, s1 = set(diags[0]["slabs"][name]), set(diags[1]["slabs"][name])
        assert len(s0) == len(s1) == 4 and not (s0 & s1)
        assert s0 | s1 == set(range(0, n, 4))

    # assemble and compare against a single-process reference
    field = {}
    for name in ("gx", "gy", "gz"):
        slabs = [np.load(tmp_path / f"{name}.{start}.npy")
                 for start in range(0, n, 4)]
        field[name] = np.concatenate(slabs, axis=0)
        assert field[name].shape == (n, n, n)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("ens",))
    rx, ry, rz = sharded_gaussian_random_field(
        jax.random.key(11), (n, n, n), (10.0, 10.0, 10.0), 40.0, 160.0,
        mesh, g_rms=2.5e-3)
    np.testing.assert_allclose(field["gx"], np.asarray(rx), rtol=2e-4,
                               atol=1e-9)
    rms = float(np.sqrt(np.mean(sum(field[k]**2 for k in field))))
    np.testing.assert_allclose(rms, diags[0]["rms"], rtol=1e-5)


def test_sharded_grf_builder_is_memoized_and_axis_name_plumbs():
    """Repeated calls with fresh keys reuse ONE compiled executable (a
    per-call @jax.jit closure re-traced the full pencil-FFT program
    every time), and a mesh with a different axis spelling works via
    axis_name=."""
    from cluster_generator_tpu.parallel.fields import _build_fn

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("ens",))
    kw = dict(ddims=(16, 16, 16), deltas=(10.0, 10.0, 10.0),
              l_min=40.0, l_max=160.0, mesh=mesh)
    _build_fn.cache_clear()
    a = sharded_gaussian_random_field(jax.random.key(1), **kw)
    b = sharded_gaussian_random_field(jax.random.key(2), **kw)
    assert _build_fn.cache_info().hits == 1
    assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))

    # g_rms is a traced argument, not a compile-time constant: a
    # g_rms sweep reuses the SAME executable (it only scales the
    # output), and the scaling is exact
    d = sharded_gaussian_random_field(jax.random.key(1), g_rms=2.5, **kw)
    assert _build_fn.cache_info().hits == 2
    np.testing.assert_allclose(np.asarray(d[0]), 2.5 * np.asarray(a[0]),
                               rtol=5e-6, atol=1e-8)

    other = Mesh(np.asarray(jax.devices()).reshape(8), ("grid",))
    cx, _, _ = sharded_gaussian_random_field(
        jax.random.key(1), axis_name="grid",
        **{**kw, "mesh": other})
    np.testing.assert_allclose(np.asarray(cx), np.asarray(a[0]),
                               rtol=5e-6, atol=1e-8)
