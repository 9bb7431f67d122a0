"""Jitted hydrostatic-equilibrium field builders.

Pure-functional cores of the reference's ``ClusterModel`` constructors
(model.py:474-656 and ``_from_scratch`` model.py:213-269).  Each builder maps
(profile pytrees, radius grid) -> dict of float64 field arrays in galactic
units, with every cumulative integral expressed as batched Gauss-Legendre
panels (core/quadrature.py) instead of the reference's per-point
``scipy.quad`` python loops (SURVEY.md §3.1-3.2 HOT LOOPs #1/#2).

The whole construction jits into a single XLA program and is vmappable over
profile-parameter batches (ensemble axis).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.interp import cubic_spline, spline_eval
from ..core.quadrature import (
    integrate_from,
    integrate_mass,
    integrate_tail_to_inf,
)
from .gravity import dynamical_mass, field_for_law

__all__ = ["build_from_dens_and_tden", "build_from_dens_and_temp",
           "build_no_gas", "derive_secondary_fields",
           "potential_from_field"]


def potential_from_field(rr, g):
    """Potential by integrating the (sampled) field:
    Phi(r) = Phi(rmax) + int_r^rmax g dr, anchored at
    Phi(rmax) = g(rmax) * rmax — i.e. the field is continued as pure
    1/r^2 beyond the grid, the same truncation convention as the
    Newtonian mass-integral form (mass beyond rmax ignored).  For MOND
    laws the true field falls as ~1/r outside and the potential has no
    finite zero at infinity; this anchor keeps psi = -Phi finite and
    shifts it uniformly, which is the quantity the DF machinery uses.
    """
    g_sp = cubic_spline(rr, g)
    return g[-1] * rr[-1] + integrate_from(
        lambda r: spline_eval(g_sp, r), rr)


def derive_secondary_fields(fields: dict, stellar_density=None,
                            total_density_fn=None, potential=None) -> dict:
    """The ``_from_scratch`` derivations (model.py:213-269).

    Adds: gravitational_potential, gas_mass (if absent), stellar fields,
    dark-matter density/mass (with the reference's negative clamping),
    gas_fraction, electron_number_density, entropy.

    ``total_density_fn``: when the caller still has the total-density
    PROFILE (all builders do), the potential integrand evaluates it
    directly — no spline rebuild of the sampled array, and the integral
    sees the true profile at the Gauss-Legendre nodes rather than its
    interpolant.

    ``potential``: a precomputed potential array overriding the
    Newtonian mass-integral form — non-Newtonian builders pass the
    field-integrated potential (:func:`potential_from_field`), since
    Phi = -G[M/r + ...] only holds when g = -GM/r^2.
    """
    rr = fields["radius"]

    if potential is not None:
        fields["gravitational_potential"] = potential
    else:
        # Phi = -G [ M(<r)/r + 4 pi int_r^rmax rho_tot(r') r' dr' ] (:220-226)
        if total_density_fn is None:
            tdens_sp = cubic_spline(rr, fields["total_density"])
            total_density_fn = lambda r: spline_eval(tdens_sp, r)  # noqa: E731
        gpot2 = 4.0 * jnp.pi * integrate_from(
            lambda r: total_density_fn(r) * r, rr)
        gpot1 = fields["total_mass"] / rr
        fields["gravitational_potential"] = -C.G * (gpot1 + gpot2)

    if "density" in fields and "gas_mass" not in fields:
        # cumulative trapezoid + central m0 (model.py:230-235)
        from ..core.quadrature import cumtrapz

        m0 = fields["density"][0] * rr[0] ** 3 / 3.0
        fields["gas_mass"] = (4.0 * jnp.pi
                              * cumtrapz(fields["density"] * rr * rr, rr) + m0)

    if stellar_density is not None:
        fields["stellar_density"] = stellar_density(rr)
        fields["stellar_mass"] = integrate_mass(stellar_density, rr)

    mdm = fields["total_mass"]
    ddm = fields["total_density"]
    if "density" in fields:
        mdm = mdm - fields["gas_mass"]
        ddm = ddm - fields["density"]
    if "stellar_mass" in fields:
        mdm = mdm - fields["stellar_mass"]
        ddm = ddm - fields["stellar_density"]
    # negative-DM clamp (model.py:252-253)
    neg = ddm < 0.0
    mdm = jnp.where(neg, jnp.max(mdm), mdm)
    ddm = jnp.where(neg, 0.0, ddm)
    fields["dark_matter_density"] = ddm
    fields["dark_matter_mass"] = mdm

    if "density" in fields:
        from ..core import units

        fields["gas_fraction"] = fields["gas_mass"] / fields["total_mass"]
        fields["electron_number_density"] = units.density_to_ne(fields["density"])
        # entropy S = T[keV] * n_e^(-2/3)  (model.py:265-267)
        fields["entropy"] = (fields["temperature"]
                             * fields["electron_number_density"] ** (-2.0 / 3.0))
    return fields


@partial(jax.jit, static_argnames=("order", "gravity"))
def build_from_dens_and_tden(rr, density, total_density, stellar_density=None,
                             order: int = 16, gravity: str = "newtonian",
                             gravity_params=None) -> dict:
    """``from_dens_and_tden`` math (model.py:565-618).

    P(r) = - int_r^{rmax} rho_g g dr - int_{rmax}^inf rho_g g(rmax)(rmax/r)^2 dr
    with g = -G M_tot / r^2 under Newton; for a registered MOND law
    (``gravity="aqual"|"qumond"|"emond"``) the *matter* mass from
    ``total_density`` maps to the field via the law's forward relation
    (model/gravity.py; the reference documents this wiring at
    docs/source/models.rst:75-123).  EMOND's A0 depends on the potential,
    which depends on the field — resolved by a short fixed-point
    iteration (A0 is a bounded tanh of log|phi|, so the map is a strong
    contraction; 4 unrolled steps reach f64 roundoff in practice).
    """
    fields: dict = {}
    fields["radius"] = rr
    fields["density"] = density(rr)
    fields["total_density"] = total_density(rr)
    fields["total_mass"] = integrate_mass(total_density, rr, order=order)
    fields["gas_mass"] = integrate_mass(density, rr, order=order)
    phi = None
    if gravity == "newtonian":
        g = -C.G * fields["total_mass"] / rr**2
    elif gravity == "emond":
        g = -C.G * fields["total_mass"] / rr**2  # Newtonian start
        for _ in range(4):
            phi = potential_from_field(rr, g)
            g = field_for_law(rr, fields["total_mass"], gravity,
                              phi=phi, params=gravity_params)
        phi = potential_from_field(rr, g)
    else:
        g = field_for_law(rr, fields["total_mass"], gravity,
                          params=gravity_params)
        phi = potential_from_field(rr, g)
    fields["gravitational_field"] = g

    # spline g on the grid (reference model.py:608) and integrate rho_g * g
    g_sp = cubic_spline(rr, g)
    dPdr = lambda r: density(r) * spline_eval(g_sp, r)
    P = -integrate_from(dPdr, rr, order=order)
    # outer tail: field continued as 1/r^2 beyond rmax (the same
    # truncation convention as potential_from_field's anchor)
    tail = integrate_tail_to_inf(
        lambda r: density(r) * g[-1] * (rr[-1] / r) ** 2, rr[-1])
    P = P - tail
    fields["pressure"] = P
    # T[keV] = P mu m_p / rho  (energy in galactic units -> keV).
    # The constant MUST be folded on the host: mp (8.4e-58) and keV
    # (7.3e-61) individually underflow TPU f64 emulation, whose exponent
    # range is float32's; their folded ratio (~7e2) is well-scaled.
    fields["temperature"] = P / fields["density"] * (C.mu * C.mp / C.keV)
    return derive_secondary_fields(fields, stellar_density,
                                   total_density_fn=total_density,
                                   potential=phi)


@partial(jax.jit, static_argnames=("order", "gravity"))
def build_from_dens_and_temp(rr, density, temperature, stellar_density=None,
                             order: int = 16, gravity: str = "newtonian",
                             gravity_params=None) -> dict:
    """``from_dens_and_temp`` math (model.py:474-523).

    P = rho T / (mu m_p); g = (dP/dr)/rho; then the *dynamical* (matter)
    mass per the gravity law — Newton's M = -r^2 g / G, or the MOND
    inversion M_dyn = -(r^2/G) mu(|g|/a0) g for ``aqual``/``qumond``
    (identical in spherical symmetry for the simple interpolation pair)
    and a0 -> A0(phi) for ``emond`` (models.rst:75-123);
    rho_tot = (dM/dr) / (4 pi r^2).  Here g comes straight from HSE, so
    EMOND's phi is computed directly from the field — no fixed point.
    """
    fields: dict = {}
    fields["radius"] = rr
    fields["density"] = density(rr)
    fields["temperature"] = temperature(rr)
    # pressure in galactic units; T[keV] -> galactic energy via keV factor
    # (folded on host — see build_from_dens_and_tden's temperature note)
    fields["pressure"] = (fields["density"] * fields["temperature"]
                          * (C.keV / (C.mu * C.mp)))
    p_sp = cubic_spline(rr, fields["pressure"])
    dPdr = spline_eval(p_sp, rr, nu=1)
    g = dPdr / fields["density"]
    fields["gravitational_field"] = g
    fields["gas_mass"] = integrate_mass(density, rr, order=order)
    phi = None
    if gravity != "newtonian":
        phi = potential_from_field(rr, g)
    fields["total_mass"] = dynamical_mass(rr, g, gravity, phi=phi,
                                          params=gravity_params)
    m_sp = cubic_spline(rr, fields["total_mass"])
    dMdr = spline_eval(m_sp, rr, nu=1)
    fields["total_density"] = dMdr / (4.0 * jnp.pi * rr**2)
    return derive_secondary_fields(fields, stellar_density, potential=phi)


@partial(jax.jit, static_argnames=("order", "gravity"))
def build_no_gas(rr, total_density, stellar_density=None, order: int = 16,
                 gravity: str = "newtonian", gravity_params=None) -> dict:
    """``no_gas`` math (model.py:620-656), with the same gravity-law
    forward wiring as :func:`build_from_dens_and_tden`."""
    fields: dict = {}
    fields["radius"] = rr
    fields["total_density"] = total_density(rr)
    fields["total_mass"] = integrate_mass(total_density, rr, order=order)
    phi = None
    if gravity == "newtonian":
        g = -C.G * fields["total_mass"] / rr**2
    elif gravity == "emond":
        g = -C.G * fields["total_mass"] / rr**2
        for _ in range(4):
            phi = potential_from_field(rr, g)
            g = field_for_law(rr, fields["total_mass"], gravity,
                              phi=phi, params=gravity_params)
        phi = potential_from_field(rr, g)
    else:
        g = field_for_law(rr, fields["total_mass"], gravity,
                          params=gravity_params)
        phi = potential_from_field(rr, g)
    fields["gravitational_field"] = g
    return derive_secondary_fields(fields, stellar_density,
                                   total_density_fn=total_density,
                                   potential=phi)
