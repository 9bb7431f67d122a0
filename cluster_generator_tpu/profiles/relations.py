"""Observed scaling relations (reference relations.py:1-51)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import units

__all__ = ["f_gas", "m_bcg", "m_sat", "r_bcg", "convert_ne_to_density"]


def f_gas(M500, hubble=0.7):
    """Vikhlinin+09 gas fraction within r500 (relations.py:7-26)."""
    m = M500 * 1.0e-15 / hubble
    return ((0.72 / hubble) ** 1.5) * (0.125 + 0.037 * jnp.log10(m))


def m_bcg(M500):
    """BCG stellar mass from M500 (relations.py:29-33)."""
    x = jnp.log10(M500) - 14.5
    return 10.0 ** (0.39 * x + 12.15)


def m_sat(M500):
    """Satellite stellar mass from M500 (relations.py:36-40)."""
    x = jnp.log10(M500) - 14.5
    return 10.0 ** (0.87 * x + 12.42)


def r_bcg(r200):
    """BCG radius from r200 (relations.py:43-46)."""
    x = jnp.log10(r200) - 1.0
    return 10.0 ** (0.95 * x - 0.3)


def convert_ne_to_density(ne):
    """n_e [cm^-3] -> mass density [Msun/kpc^3] (relations.py:49-51)."""
    return units.ne_to_density(ne)
