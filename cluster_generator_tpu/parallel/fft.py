"""Pencil-decomposed distributed 3D FFT over a device mesh.

The reference handles large field grids out-of-core ("disk as VRAM",
SURVEY.md §5.7); the TPU-native answer is to shard the grid across chips and
run a pencil FFT whose transposes are ``lax.all_to_all`` collectives riding
ICI:

    slab (X-sharded)      : FFT over the two local axes (Y, Z)
    all_to_all transpose  : reshard X-full / Y-sharded
    final axis            : FFT over X (now local)

The result lives in k-space sharded over Y; k-space elementwise work
(spectrum shaping, divergence projection) partitions with zero
communication, and the inverse pencil brings the field back to X-sharded
real space.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pencil_fftn", "pencil_ifftn"]


def _fft_local_yz(x):
    return jnp.fft.fftn(x, axes=(-2, -1))


def _ifft_local_yz(x):
    return jnp.fft.ifftn(x, axes=(-2, -1))


def pencil_fftn(x, mesh: Mesh, axis_name: str = "ens"):
    """3D FFT of a global (N, N, N) array sharded over its first axis.

    Returns the k-space array sharded over its *second* axis (the pencil
    transpose leaves it there; feed it to :func:`pencil_ifftn` to come
    back).  Works on complex or real input (promotes to complex).
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=P(axis_name, None, None),
             out_specs=P(None, axis_name, None))
    def _fwd(local):
        # local: (N/d, N, N)
        f = _fft_local_yz(local.astype(jnp.complex64)
                          if local.dtype in (jnp.float32, jnp.complex64)
                          else local.astype(jnp.complex128))
        # transpose: split Y, concat X  ->  (N, N/d, N)
        f = jax.lax.all_to_all(f, axis_name, split_axis=1, concat_axis=0,
                               tiled=True)
        return jnp.fft.fft(f, axis=0)

    return _fwd(x)


def pencil_ifftn(xk, mesh: Mesh, axis_name: str = "ens"):
    """Inverse of :func:`pencil_fftn`: k-space (X-full, Y-sharded) back to
    real space (X-sharded).  Returns the complex array; take ``.real``."""

    @partial(jax.shard_map, mesh=mesh,
             in_specs=P(None, axis_name, None),
             out_specs=P(axis_name, None, None))
    def _bwd(local_k):
        f = jnp.fft.ifft(local_k, axis=0)
        f = jax.lax.all_to_all(f, axis_name, split_axis=0, concat_axis=1,
                               tiled=True)
        return _ifft_local_yz(f)

    return _bwd(xk)
