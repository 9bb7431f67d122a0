"""Device-mesh helpers.

The reference has no distributed story (SURVEY.md §2.3); scaling here is
native: a 1D/2D ``jax.sharding.Mesh`` whose axes are

* ``ens``  — the cluster-ensemble axis (data parallel over ICI/DCN),
* ``part`` — the particle axis (sharded sampling; per-device PRNG streams
  via ``jax.random.fold_in``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ensemble_sharding", "particle_sharding", "P",
           "NamedSharding"]


def make_mesh(n_ens: int | None = None, n_part: int | None = None,
              devices=None) -> Mesh:
    """Create an (ens, part) mesh over the available devices.

    With one axis size given, the other takes the remaining devices.  With
    neither, all devices go to the ensemble axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_ens is None and n_part is None:
        n_ens, n_part = n, 1
    elif n_ens is None:
        n_ens = n // n_part
    elif n_part is None:
        n_part = n // n_ens
    assert n_ens * n_part == n, (n_ens, n_part, n)
    arr = np.asarray(devices).reshape(n_ens, n_part)
    return Mesh(arr, axis_names=("ens", "part"))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ensemble/batch) axis over 'ens'."""
    return NamedSharding(mesh, P("ens"))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (particle) axis over the whole mesh."""
    return NamedSharding(mesh, P(("ens", "part")))
