"""yt.utilities.cosmology.Cosmology shim: flat LCDM critical density with
yt's default parameters (h=0.71, Om=0.27, OL=0.73) — the same defaults
cluster_generator_tpu/core/cosmology.py uses."""

import math

from unyt import unyt_quantity

_G_CGS = 6.67430e-8  # cm^3 g^-1 s^-2 (CODATA 2018, matching the unyt shim)
_KM_CM = 1.0e5
_MPC_CM = 648000.0 / math.pi * 1.495978707e11 * 100.0 * 1.0e6


class Cosmology:
    def __init__(self, hubble_constant=0.71, omega_matter=0.27,
                 omega_lambda=0.73, omega_radiation=0.0,
                 omega_curvature=0.0):
        self.hubble_constant = hubble_constant
        self.omega_matter = omega_matter
        self.omega_lambda = omega_lambda
        self.omega_radiation = omega_radiation
        self.omega_curvature = omega_curvature

    def hubble_parameter(self, z):
        """H(z) in 1/s (plain float; callers convert via critical_density)."""
        h0 = self.hubble_constant * 100.0 * _KM_CM / _MPC_CM
        zp1 = 1.0 + z
        e2 = (self.omega_radiation * zp1**4 + self.omega_matter * zp1**3
              + self.omega_curvature * zp1**2 + self.omega_lambda)
        return h0 * math.sqrt(e2)

    def critical_density(self, z=0.0):
        h = self.hubble_parameter(z)
        rho = 3.0 * h * h / (8.0 * math.pi * _G_CGS)  # g/cm^3
        return unyt_quantity(rho, "g/cm**3")
