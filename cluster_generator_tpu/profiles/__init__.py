"""Profile algebra layer (L2'): parameterized profiles, library, solvers."""

from .algebra import Profile, RadialProfile, constant_profile, power_law_profile
from .library import (
    am06_density_profile,
    am06_temperature_profile,
    baseline_entropy_profile,
    beta_model_profile,
    broken_entropy_profile,
    convert_nfw_to_hernquist,
    cored_hernquist_density_profile,
    cored_snfw_density_profile,
    cored_snfw_mass_profile,
    cored_snfw_total_mass,
    einasto_density_profile,
    einasto_mass_profile,
    hernquist_density_profile,
    hernquist_mass_profile,
    nfw_density_profile,
    nfw_mass_profile,
    nfw_scale_density,
    snfw_conc,
    snfw_density_profile,
    snfw_mass_profile,
    snfw_total_mass,
    tnfw_density_profile,
    tnfw_mass_profile,
    vikhlinin_density_profile,
    vikhlinin_temperature_profile,
    walker_entropy_profile,
)
from .solvers import (
    find_overdensity_radius,
    find_radius_mass,
    mass_within,
    rescale_profile_by_mass,
)

__all__ = [
    "Profile", "RadialProfile", "constant_profile", "power_law_profile",
    "am06_density_profile", "am06_temperature_profile",
    "baseline_entropy_profile", "beta_model_profile",
    "broken_entropy_profile", "convert_nfw_to_hernquist",
    "cored_hernquist_density_profile", "cored_snfw_density_profile",
    "cored_snfw_mass_profile", "cored_snfw_total_mass",
    "einasto_density_profile", "einasto_mass_profile",
    "hernquist_density_profile", "hernquist_mass_profile",
    "nfw_density_profile", "nfw_mass_profile", "nfw_scale_density",
    "snfw_conc", "snfw_density_profile", "snfw_mass_profile",
    "snfw_total_mass", "tnfw_density_profile", "tnfw_mass_profile",
    "vikhlinin_density_profile", "vikhlinin_temperature_profile",
    "walker_entropy_profile", "find_overdensity_radius", "find_radius_mass",
    "mass_within", "rescale_profile_by_mass",
]
