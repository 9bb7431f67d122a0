"""Multi-chip Gaussian random fields: grid-sharded generation.

Scales the L5' field generator (fields/grf.py) past one chip's HBM: the
grid is slab-sharded over the mesh, FFTs run as pencil decompositions
(parallel/fft.py), and all k-space work (spectrum shaping, finite-
difference divergence projection) is communication-free elementwise math on
the sharded representation.  A 1024^3 three-component float32 field is
~12 GB — out-of-core chunking in the reference ("disk as VRAM",
model.py:1166-1168), a few HBM-resident slabs here.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .fft import pencil_fftn, pencil_ifftn

__all__ = ["sharded_gaussian_random_field"]


def _waves(n, deltas):
    kx = np.fft.fftfreq(n[0], d=deltas[0] / (2 * np.pi))[:, None, None]
    ky = np.fft.fftfreq(n[1], d=deltas[1] / (2 * np.pi))[None, :, None]
    kz = np.fft.fftfreq(n[2], d=deltas[2] / (2 * np.pi))[None, None, :]
    return kx, ky, kz


@lru_cache(maxsize=None)
def _build_fn(ddims, deltas, k0, k1, mesh, alpha, divergence_clean,
              dtype, axis_name):
    """One jitted builder per configuration: a fresh ``@jax.jit`` closure
    per *call* would re-trace and re-compile the full pencil-FFT program
    every time (jit caches key on function identity) — looping over keys
    for an ensemble of fields must reuse one executable.  ``g_rms`` is a
    TRACED argument of the built function, not part of this memo key: it
    only scales the output, so a g_rms sweep must not recompile the
    distributed FFT program."""
    nx, ny, nz = ddims
    kx, ky, kz = _waves((nx, ny, nz), deltas)
    # only THIN broadcastable 1D wavenumber arrays become device constants;
    # the full-grid sigma is computed INSIDE the jit so XLA partitions the
    # elementwise graph with the Y-sharded spectra it multiplies — a
    # precomputed (nx, ny, nz) host sigma was gigabytes of host f64
    # temporaries plus an unsharded device constant, defeating the
    # past-one-chip scaling this module exists for.  Wavenumbers are cast
    # to the field dtype (an f64 operand would promote the whole graph).
    kxd = jnp.asarray(np.sin(kx * deltas[0]) / deltas[0], dtype)
    kyd = jnp.asarray(np.sin(ky * deltas[1]) / deltas[1], dtype)
    kzd = jnp.asarray(np.sin(kz * deltas[2]) / deltas[2], dtype)
    kxj = jnp.asarray(kx, dtype)
    kyj = jnp.asarray(ky, dtype)
    kzj = jnp.asarray(kz, dtype)

    slab = NamedSharding(mesh, P(axis_name, None, None))

    @jax.jit
    def build(key, g_rms):
        from ..fields.grf import _spectrum_sigma

        kk = jnp.sqrt(kxj**2 + kyj**2 + kzj**2)
        sigma = _spectrum_sigma(kk, k0, k1, alpha, dtype)
        keys = jax.random.split(key, 3)
        comps_k = []
        for i in range(3):
            noise = jax.random.normal(keys[i], (nx, ny, nz), dtype=dtype)
            noise = jax.lax.with_sharding_constraint(noise, slab)
            comps_k.append(pencil_fftn(noise, mesh, axis_name) * sigma)
        gxk, gyk, gzk = comps_k
        if divergence_clean:
            from ..fields.grf import _div_clean_k

            gxk, gyk, gzk = _div_clean_k(gxk, gyk, gzk, kxd, kyd, kzd)
        gx = pencil_ifftn(gxk, mesh, axis_name).real.astype(dtype)
        gy = pencil_ifftn(gyk, mesh, axis_name).real.astype(dtype)
        gz = pencil_ifftn(gzk, mesh, axis_name).real.astype(dtype)
        g_avg = jnp.sqrt(jnp.mean(gx**2 + gy**2 + gz**2))
        s = jnp.asarray(g_rms, dtype) / g_avg
        return gx * s, gy * s, gz * s

    return build


def sharded_gaussian_random_field(key, ddims, deltas, l_min, l_max, mesh,
                                  alpha=-11.0 / 3.0, g_rms=1.0,
                                  divergence_clean=True,
                                  dtype=jnp.float32, axis_name="ens"):
    """Unit-rms (then g_rms-scaled) solenoidal GRF sharded over the mesh.

    Returns (gx, gy, gz), each (nx, ny, nz) sharded over the first axis
    of ``mesh`` along ``axis_name``.  Same spectrum and projection math
    as fields.GaussianRandomField (fields.py:341-573), distributed.

    ``dtype``: float32 is the TPU path (float64 promotes the FFTs to
    complex128, which TPU does not lower; it works on the CPU backend).
    The builder is memoized per configuration, so repeated calls with
    fresh keys reuse one compiled executable.
    """
    build = _build_fn(tuple(int(d) for d in ddims),
                      tuple(float(d) for d in deltas),
                      2.0 * np.pi / float(l_min), 2.0 * np.pi / float(l_max),
                      mesh, float(alpha),
                      bool(divergence_clean), np.dtype(dtype),
                      str(axis_name))
    with mesh:
        return build(key, float(g_rms))
