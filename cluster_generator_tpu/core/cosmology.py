"""Flat-LCDM cosmology helpers (critical density).

Replaces the reference's dependence on ``yt.utilities.cosmology.Cosmology``
(radial_profiles.py:285-313, :765-817).  Defaults match yt's defaults
(h=0.71, Omega_m=0.27, Omega_L=0.73) so that profile constructors that rely
on rho_crit reproduce the reference's numbers.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .constants import G, KPC_M, MYR_S

__all__ = ["Cosmology", "default_cosmology"]


@dataclass(frozen=True)
class Cosmology:
    hubble_constant: float = 0.71  # in 100 km/s/Mpc
    omega_matter: float = 0.27
    omega_lambda: float = 0.73
    omega_radiation: float = 0.0
    omega_curvature: float = 0.0

    def hubble_parameter(self, z):
        """H(z) in 1/Myr."""
        # H0 = h * 100 km/s/Mpc -> 1/Myr
        H0_SI = self.hubble_constant * 100.0 * 1.0e3 / (1.0e3 * KPC_M)  # 1/s
        H0 = H0_SI * MYR_S
        zp1 = 1.0 + z
        E2 = (self.omega_radiation * zp1**4 + self.omega_matter * zp1**3
              + self.omega_curvature * zp1**2 + self.omega_lambda)
        return H0 * jnp.sqrt(E2)

    def critical_density(self, z=0.0):
        """rho_crit(z) in Msun/kpc^3."""
        H = self.hubble_parameter(z)
        return 3.0 * H * H / (8.0 * jnp.pi * G)


def default_cosmology() -> Cosmology:
    return Cosmology()
