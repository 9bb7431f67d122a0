"""Minimal unit layer for the I/O boundary.

Design stance (SURVEY.md §7 step 1): arrays inside the jitted compute path are
plain float64 in *galactic* units (kpc, Msun, Myr, with temperature carried in
keV and magnetic field in Gauss).  Unit handling therefore reduces to a tiny
registry of named units with conversion factors to/from the galactic base,
used only by writers/readers (HDF5, Gadget, Fortran) and user-facing helpers.

This replaces the reference's pervasive ``unyt`` arrays
(``cluster_generator/utils.py:169-181``) — ``unyt`` must not appear inside
``jit``; a traced computation cannot carry a Python unit object.
"""

from __future__ import annotations

import numpy as np

from . import constants as C

# Dimension signature: (mass, length, time, temperature) exponents over the
# galactic base (Msun, kpc, Myr, K).  "factor" converts FROM the named unit
# TO galactic base units: x_galactic = x_unit * factor.
_G_CM3 = C.MSUN_KG * 1.0e3 / (C.CM_PER_KPC**3)  # 1 Msun/kpc**3 in g/cm**3

_REGISTRY: dict[str, tuple[float, tuple[float, float, float, float]]] = {
    # length
    "kpc": (1.0, (0, 1, 0, 0)),
    "Mpc": (1.0e3, (0, 1, 0, 0)),
    "pc": (1.0e-3, (0, 1, 0, 0)),
    "cm": (1.0 / C.CM_PER_KPC, (0, 1, 0, 0)),
    "m": (100.0 / C.CM_PER_KPC, (0, 1, 0, 0)),
    "km": (1.0e5 / C.CM_PER_KPC, (0, 1, 0, 0)),
    # mass
    "Msun": (1.0, (1, 0, 0, 0)),
    "1e10*Msun": (1.0e10, (1, 0, 0, 0)),
    "g": (1.0e-3 / C.MSUN_KG, (1, 0, 0, 0)),
    "kg": (1.0 / C.MSUN_KG, (1, 0, 0, 0)),
    # time
    "Myr": (1.0, (0, 0, 1, 0)),
    "Gyr": (1.0e3, (0, 0, 1, 0)),
    "yr": (1.0e-6, (0, 0, 1, 0)),
    "s": (1.0 / C.MYR_S, (0, 0, 1, 0)),
    # temperature
    "K": (1.0, (0, 0, 0, 1)),
    # velocity
    "kpc/Myr": (1.0, (0, 1, -1, 0)),
    "km/s": (C.km_s, (0, 1, -1, 0)),
    "cm/s": (C.km_s * 1e-5, (0, 1, -1, 0)),
    # density
    "Msun/kpc**3": (1.0, (1, -3, 0, 0)),
    "1e10*Msun/kpc**3": (1.0e10, (1, -3, 0, 0)),
    "g/cm**3": (1.0 / _G_CM3, (1, -3, 0, 0)),
    # number density (bare; composition conversions live in helpers below)
    "cm**-3": (1.0, (0, -3, 0, 0)),
    # mass / enclosed-mass
    # pressure / energy density
    "Msun/kpc/Myr**2": (1.0, (1, -1, -2, 0)),
    "Msun/(kpc*Myr**2)": (1.0, (1, -1, -2, 0)),
    "Msun/(Myr**2*kpc)": (1.0, (1, -1, -2, 0)),
    # 1 erg/cm**3 = 0.1 kg m^-1 s^-2 -> galactic pressure units
    "erg/cm**3": (0.1 * C.KPC_M * C.MYR_S**2 / C.MSUN_KG, (1, -1, -2, 0)),
    # momentum density
    "Msun/(Myr*kpc**2)": (1.0, (1, -2, -1, 0)),
    # specific energy
    "kpc**2/Myr**2": (1.0, (0, 2, -2, 0)),
    "km**2/s**2": (C.km_s**2, (0, 2, -2, 0)),
    # 1 erg/g = 1e-4 m^2/s^2 -> kpc^2/Myr^2
    "erg/g": (1.0e-4 * (C.MYR_S / C.KPC_M) ** 2, (0, 2, -2, 0)),
    # temperature-as-energy (keV) — stored natively for the temperature field
    "keV": (1.0, (0, 0, 0, 0)),  # opaque: temperature fields carry keV natively
    # magnetic field — stored natively in gauss; dimensions are the true
    # Gaussian-cgs ones (B ~ g^1/2 cm^-1/2 s^-1) so dimension checks can
    # tell a field strength from a velocity or a plain scalar
    "gauss": (1.0, (0.5, -0.5, -1, 0)),
    "G": (1.0, (0.5, -0.5, -1, 0)),
    "uG": (1.0e-6, (0.5, -0.5, -1, 0)),
    # magnetic vector potential (B x length; ClusterField.units for
    # vector_potential=True fields — particles.py:89)
    "gauss*kpc": (1.0, (0.5, 0.5, -1, 0)),
    "G*kpc": (1.0, (0.5, 0.5, -1, 0)),
    "uG*kpc": (1.0e-6, (0.5, 0.5, -1, 0)),
    # distribution function (model.py "Msun*Myr**3/kpc**6")
    "Msun*Myr**3/kpc**6": (1.0, (1, -6, 3, 0)),
    # potential gradient
    "kpc/Myr**2": (1.0, (0, 1, -2, 0)),
    "dimensionless": (1.0, (0, 0, 0, 0)),
    "": (1.0, (0, 0, 0, 0)),
}

# The Gadget magnetic-field unit 1e5*sqrt(Msun)*km/s/(kpc**1.5): handled in
# the particle writer directly (particles.py reference :59).


def unit_factor(unit: str) -> float:
    """Conversion factor from `unit` to galactic base units."""
    try:
        return _REGISTRY[unit][0]
    except KeyError:
        raise KeyError(f"Unknown unit {unit!r}; register it in core/units.py")


def conversion_factor(from_unit: str, to_unit: str) -> float:
    """Factor converting values in ``from_unit`` to ``to_unit``,
    REFUSING dimensionally-incompatible pairs (``unit_factor`` ratios
    alone would happily convert gauss to kpc/Myr)."""
    try:
        f_f, d_f = _REGISTRY[from_unit]
    except KeyError:
        raise KeyError(f"Unknown unit {from_unit!r}; register it in "
                       "core/units.py")
    try:
        f_t, d_t = _REGISTRY[to_unit]
    except KeyError:
        raise KeyError(f"Unknown unit {to_unit!r}; register it in "
                       "core/units.py")
    if d_f != d_t:
        raise ValueError(
            f"Unit {to_unit!r} (dimensions {d_t}) is not convertible "
            f"from {from_unit!r} (dimensions {d_f}).")
    return f_f / f_t


def to_galactic(x, unit: str):
    return np.asarray(x, dtype=np.float64) * unit_factor(unit)


def from_galactic(x, unit: str):
    return np.asarray(x, dtype=np.float64) / unit_factor(unit)


# --------------------------------------------------------------- field units
#: canonical unit string for every model field, as stored on disk.  Matches
#: the reference's galactic-unit field system (model.py:64-80); "entropy",
#: "electron_number_density" and "magnetic_field_strength" keep their natural
#: units exactly as the reference's ``_keep_units`` does (model.py:80).
FIELD_UNITS: dict[str, str] = {
    "radius": "kpc",
    "density": "Msun/kpc**3",
    "temperature": "keV",
    "pressure": "Msun/(kpc*Myr**2)",
    "entropy": "keV*cm**2",
    "total_density": "Msun/kpc**3",
    "gravitational_potential": "kpc**2/Myr**2",
    "gravitational_field": "kpc/Myr**2",
    "total_mass": "Msun",
    "gas_mass": "Msun",
    "dark_matter_mass": "Msun",
    "dark_matter_density": "Msun/kpc**3",
    "stellar_density": "Msun/kpc**3",
    "stellar_mass": "Msun",
    "gas_fraction": "dimensionless",
    "electron_number_density": "cm**-3",
    "magnetic_field_strength": "gauss",
    "velocity_dispersion": "kpc/Myr",
}

# cgs equivalents used by ``write_model_to_h5(in_cgs=True)`` (model.py:342-397)
CGS_UNITS: dict[str, str] = {
    "radius": "cm",
    "density": "g/cm**3",
    "temperature": "K",  # thermal equivalent: T[K] = T[keV]*keV/kboltz
    "pressure": "erg/cm**3",
    "total_density": "g/cm**3",
    "gravitational_potential": "cm**2/s**2",
    "gravitational_field": "cm/s**2",
    "total_mass": "g",
    "gas_mass": "g",
    "dark_matter_mass": "g",
    "dark_matter_density": "g/cm**3",
    "stellar_density": "g/cm**3",
    "stellar_mass": "g",
    "gas_fraction": "dimensionless",
    "velocity_dispersion": "cm/s",
}

# native-unit families for fields stored in non-galactic-base units (the
# reference's ``_keep_units`` + temperature): only same-family units convert
_NATIVE_GROUPS: dict[str, set[str]] = {
    "keV": {"keV"},
    "gauss": {"gauss", "G", "uG"},
    "cm**-3": {"cm**-3"},
    "keV*cm**2": {"keV*cm**2"},
}


def to_field_units(x, unit: str, field: str):
    """Convert ``x`` given in ``unit`` into ``field``'s NATIVE storage unit,
    refusing dimensionally-incompatible conversions.

    Fields stored in galactic base units accept any registered unit of the
    same dimension; fields stored natively in keV / gauss / cm^-3 accept
    only their own unit family (e.g. temperature must come in keV — passing
    Kelvin raises instead of silently storing K values as keV; convert
    thermally with :func:`K_to_keV` first, as upstream unyt would also
    refuse K -> keV without a thermal equivalence).
    """
    native = FIELD_UNITS.get(field)
    if native is None:
        return to_galactic(x, unit)
    if native in _NATIVE_GROUPS:
        group = _NATIVE_GROUPS[native]
        if unit not in group:
            raise ValueError(
                f"Field {field!r} is stored in {native!r}; cannot convert "
                f"from {unit!r} (accepted: {sorted(group)}). For "
                "temperature in Kelvin use units.K_to_keV first.")
        return np.asarray(x, np.float64) * (unit_factor(unit)
                                            / unit_factor(native))
    # one copy of the dimension-check-then-ratio rule (conversion_factor);
    # re-raise with the field name for context
    try:
        return np.asarray(x, np.float64) * conversion_factor(unit, native)
    except ValueError as e:
        raise ValueError(f"Field {field!r}: {e}") from None


def keV_to_K(T_keV):
    """Thermal equivalent temperature: T[K] = E[keV] / k_B."""
    return np.asarray(T_keV) * (C.KEV_SI / C.KBOLTZ_SI)


def K_to_keV(T_K):
    return np.asarray(T_K) / (C.KEV_SI / C.KBOLTZ_SI)


_CM_PER_S = 1.0  # marker


def galactic_to_cgs_factor(field: str) -> float:
    """Multiplier converting a galactic-units field value to its cgs unit."""
    kpc_cm = C.CM_PER_KPC
    s_per_Myr = C.MYR_S
    g_per_Msun = C.MSUN_KG * 1.0e3
    table = {
        "kpc": kpc_cm,
        "Msun": g_per_Msun,
        "Msun/kpc**3": g_per_Msun / kpc_cm**3,
        "Msun/(kpc*Myr**2)": g_per_Msun / (kpc_cm * s_per_Myr**2),
        "kpc**2/Myr**2": kpc_cm**2 / s_per_Myr**2,
        "kpc/Myr**2": kpc_cm / s_per_Myr**2,
        "kpc/Myr": kpc_cm / s_per_Myr,
        "Msun/(Myr*kpc**2)": g_per_Msun / (s_per_Myr * kpc_cm**2),
    }
    unit = FIELD_UNITS.get(field)
    if field == "temperature":
        return C.KEV_SI / C.KBOLTZ_SI  # keV -> K
    if unit in table:
        return table[unit]
    return 1.0  # keep-units fields and dimensionless


def ne_to_density(ne_cm3):
    """Electron number density [cm^-3] -> gas mass density [Msun/kpc^3].

    rho = n_e * mue * m_p  (relations.py:49-51).  Trace-safe (works on jnp
    tracers and numpy arrays alike).
    """
    mp_g = C.MP_SI * 1.0e3
    return ne_cm3 * (C.mue * mp_g / _G_CM3)


def density_to_ne(rho_gal):
    """Gas mass density [Msun/kpc^3] -> electron number density [cm^-3].

    Matches ``fields["density"].to("cm**-3", "number_density", mu=mue)``
    (model.py:262-264).  Trace-safe.
    """
    mp_g = C.MP_SI * 1.0e3
    return rho_gal * (_G_CM3 / (C.mue * mp_g))
