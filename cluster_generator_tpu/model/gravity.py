"""Gravity-solver extension point.

The reference's config ships MOND sections (QUMOND/AQUAL/EMOND
interpolation functions, bin/config.yaml "gravity") whose implementing code
is absent from the snapshot (SURVEY.md §5.6) — alternative gravity is a
*documented extension point*, and that is what this module provides:
a registry of named gravity laws mapping an enclosed-mass profile to a
gravitational field, with Newton as the default and a reference QUMOND
implementation to demonstrate the contract.

A gravity law is a callable ``law(rr, m_tot, params) -> g`` (g < 0,
kpc/Myr^2) that must be pure jnp (jit/vmap-safe).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..core import constants as C
from ..core.config import cgparams

__all__ = ["register_gravity", "get_gravity", "newtonian_field",
           "qumond_field"]

_REGISTRY: dict[str, Callable] = {}


def register_gravity(name: str, law: Callable):
    """Register a gravity law under ``name`` (programmatic only — never
    eval'd from config, unlike the reference's ``!lambda`` YAML tag,
    utils.py:36-37)."""
    _REGISTRY[name] = law


def get_gravity(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"Unknown gravity law {name!r}; registered: "
                       f"{sorted(_REGISTRY)}")


def newtonian_field(rr, m_tot, params=None):
    """g = -G M(<r) / r^2."""
    return -C.G * m_tot / (rr * rr)


def _nu_simple(y):
    """QUMOND simple interpolation function nu(y) = 1/2 + sqrt(1/4 + 1/y)
    (the reference config's QUMOND lambda, bin/config.yaml)."""
    return 0.5 * (jnp.sqrt(1.0 + 4.0 / y) + 1.0)


def qumond_field(rr, m_tot, params=None):
    """QUMOND field from the Newtonian one: g = nu(|g_N|/a0) g_N.

    a0 defaults to the config value (1.2e-10 m/s^2 converted to galactic
    units).  Provided as the working example of the extension contract;
    building full MOND equilibrium models remains future work, as in the
    reference snapshot.
    """
    if params is None:
        params = {}
    a0_si = params.get("a0_m_s2",
                       cgparams["gravity"]["mond"]["a0_m_s2"])
    a0 = a0_si * C.MYR_S**2 / C.KPC_M  # m/s^2 -> kpc/Myr^2
    g_n = newtonian_field(rr, m_tot)
    y = jnp.abs(g_n) / a0
    return _nu_simple(y) * g_n


register_gravity("newtonian", newtonian_field)
register_gravity("qumond", qumond_field)
