"""Distributed pencil FFT + sharded GRF on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cluster_generator_tpu.parallel.fft import pencil_fftn, pencil_ifftn


def _mesh():
    return Mesh(np.asarray(jax.devices()).reshape(8), ("ens",))


def test_pencil_fftn_matches_local():
    mesh = _mesh()
    rng = np.random.RandomState(0)
    x = rng.rand(32, 32, 32)
    xd = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P("ens", None, None)))
    got = np.asarray(pencil_fftn(xd, mesh))
    ref = np.fft.fftn(x)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10
    # output is sharded over the second axis
    assert len(got.shape) == 3


def test_pencil_roundtrip():
    mesh = _mesh()
    rng = np.random.RandomState(1)
    x = rng.rand(16, 16, 16)
    xd = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P("ens", None, None)))
    xk = pencil_fftn(xd, mesh)
    back = np.asarray(pencil_ifftn(xk, mesh).real)
    assert np.abs(back - x).max() < 1e-12


def test_pencil_fft_under_jit_with_kspace_work():
    """k-space elementwise work between forward/backward partitions with no
    resharding; the whole thing jits."""
    mesh = _mesh()
    n = 16
    kx = np.fft.fftfreq(n)[:, None, None]
    ky = np.fft.fftfreq(n)[None, :, None]
    kz = np.fft.fftfreq(n)[None, None, :]
    kk2 = jnp.asarray(kx**2 + ky**2 + kz**2)

    @jax.jit
    def smooth(x):
        xk = pencil_fftn(x, mesh)
        xk = xk * jnp.exp(-100.0 * kk2)
        return pencil_ifftn(xk, mesh).real

    rng = np.random.RandomState(2)
    x = rng.rand(n, n, n)
    xd = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P("ens", None, None)))
    got = np.asarray(smooth(xd))
    ref = np.fft.ifftn(np.fft.fftn(x) * np.exp(-100.0 * np.asarray(kk2))).real
    assert np.abs(got - ref).max() < 1e-12
