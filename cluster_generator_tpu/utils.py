"""Compatibility layer exposing the reference's ``cluster_generator.utils``
surface (utils.py:116-211) on top of the TPU-native core.

Users migrating from the reference can keep importing the same names; the
implementations delegate to the vectorized core (batched quadrature instead
of per-point adaptive quad, jax.random instead of RandomState).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .core.constants import G, X_H, kboltz, kpc_to_cm, mp, mu, mue  # noqa: F401
from .core.logging import devLogger, mylog  # noqa: F401
from .core.config import cgparams  # noqa: F401
from .core.quadrature import integrate_from, integrate_tail_to_inf
from .core.quadrature import integrate_mass as _integrate_mass
from .sampling import generate_particle_radii, parse_prng  # noqa: F401

__all__ = ["G", "mp", "kboltz", "kpc_to_cm", "X_H", "mu", "mue", "mylog",
           "devLogger", "cgparams", "integrate_mass", "integrate",
           "integrate_toinf", "generate_particle_radii", "parse_prng",
           "ensure_list", "field_label_map"]


def integrate_mass(profile, rr):
    """m(r) = 4 pi int_0^r rho r^2 dr on the grid (utils.py:129-134)."""
    return np.asarray(_integrate_mass(profile, jnp.asarray(rr)))


def integrate(profile, rr):
    """int_r^rmax profile dr per grid point (utils.py:137-142)."""
    return np.asarray(integrate_from(profile, jnp.asarray(rr)))


def integrate_toinf(profile, rr):
    """int_r^rmax + int_rmax^inf (utils.py:145-151)."""
    rr = jnp.asarray(rr)
    ret = integrate_from(profile, rr)
    tail = integrate_tail_to_inf(profile, rr[-1])
    return np.asarray(ret + tail)


def ensure_list(x):
    if isinstance(x, (list, tuple)):
        return list(x)
    if isinstance(x, np.ndarray):
        return list(x)
    return [x]


field_label_map = {
    "density": "$\\rho_g$ (g cm$^{-3}$)",
    "temperature": "kT (keV)",
    "pressure": "P (erg cm$^{-3}$)",
    "entropy": "S (keV cm$^{2}$)",
    "dark_matter_density": "$\\rho_{\\rm DM}$ (g cm$^{-3}$)",
    "electron_number_density": "n$_e$ (cm$^{-3}$)",
    "stellar_mass": "M$_*$ (M$_\\odot$)",
    "stellar_density": "$\\rho_*$ (g cm$^{-3}$)",
    "dark_matter_mass": "$M_{\\rm DM}$ (M$_\\odot$)",
    "gas_mass": "M$_g$ (M$_\\odot$)",
    "total_mass": "M$_{\\rm tot}$ (M$_\\odot$)",
    "gas_fraction": "f$_{\\rm gas}$",
    "magnetic_field_strength": "B (G)",
    "gravitational_potential": "$\\Phi$ (kpc$^2$ Myr$^{-2}$)",
    "gravitational_field": "g (kpc Myr$^{-2}$)",
}
