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
