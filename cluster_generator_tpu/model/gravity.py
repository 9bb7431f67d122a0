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
           "qumond_field", "aqual_field", "emond_field", "emond_a0",
           "dynamical_mass", "field_for_law"]

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


def _a0_galactic(params):
    a0_si = (params or {}).get("a0_m_s2",
                               cgparams["gravity"]["mond"]["a0_m_s2"])
    return a0_si * C.MYR_S**2 / C.KPC_M  # m/s^2 -> kpc/Myr^2


def _simple_mu_inverse(g_n, a0):
    """Closed-form inversion of the spherical relation mu(x) x = y for
    the simple interpolation function mu(x) = x/(1+x), with
    y = |g_N|/a0 and x = |g|/a0:

        x^2 / (1 + x) = y  =>  x = (y + sqrt(y (y + 4))) / 2.

    Returns the (negative, inward) field -a0 x.  Shared by AQUAL and
    EMOND (EMOND passes a pointwise A0(phi) array as ``a0``)."""
    y = jnp.abs(g_n) / a0
    x = 0.5 * (y + jnp.sqrt(y * (y + 4.0)))
    return -a0 * x


def aqual_field(rr, m_tot, params=None):
    """AQUAL field with the simple interpolation function
    mu(x) = x / (1 + x) (the reference config's AQUAL lambda,
    bin/config.yaml).

    In spherical symmetry the AQUAL field equation reduces exactly to
    the algebraic relation mu(|g|/a0) g = g_N (Gauss' theorem; the curl
    field vanishes), and for the simple mu the inversion is closed-form:
    with y = |g_N|/a0 and x = |g|/a0,

        x^2 / (1 + x) = y  =>  x = (y + sqrt(y^2 + 4 y)) / 2,

    so no implicit solver is needed (the reference config carries a
    Gauss-Newton ``numerical.implicit`` block for the general case;
    jit/vmap-safe closed forms are the TPU-native route).  Limits:
    x -> y (Newtonian) as y -> inf, x -> sqrt(y) (deep MOND) as y -> 0.
    """
    a0 = _a0_galactic(params)
    return _simple_mu_inverse(newtonian_field(rr, m_tot), a0)


def emond_a0(phi, params=None):
    """EMOND's potential-dependent acceleration scale A0(phi)
    (Zhao & Famaey 2012 / Hodson & Zhao 2017 form; constants from the
    reference config's EMOND ``a0_function`` lambda, bin/config.yaml:51):

        A0(phi) = a + (A - a) * (tanh(log10((phi/p0)^2)) + 1) / 2

    with a = 0.003868, A = 0.30944, p0 = -7.614 and phi the (negative)
    gravitational potential in units where those constants live
    ((100 km/s)^2, the convention of the EMOND literature); the result
    is returned in GALACTIC units (kpc/Myr^2) scaled so that
    A0 -> a reproduces the standard a0.  All constants are overridable
    via ``params`` keys a, A, p0.

    Note the reference's lambda transcribes the shape as
    ``np.log10(x/p0)**2`` — the exponent OUTSIDE the log — which is
    non-monotonic in |phi| (maximal at BOTH phi -> 0 and |phi| -> inf)
    and never reduces to the standard a0 in shallow potentials,
    defeating EMOND's purpose (boost A0 only in deep cluster
    potentials).  This rebuild implements the monotone log-of-square
    literature form; tests pin A0 -> a0 as |phi| -> 0, A0 -> (A/a) a0
    in deep potentials, and monotonicity in |phi|."""
    p = params or {}
    a = p.get("a", 0.003868)
    A = p.get("A", 0.30944)
    p0 = p.get("p0", -7.614)
    # phi in (100 km/s)^2: 1 kpc^2/Myr^2 = (977.79 km/s)^2
    phi_units = jnp.asarray(phi) * (C.KPC_M / C.MYR_S / 1.0e5) ** 2
    # |phi/p0|: the shape is even in phi (log of the SQUARE), so accept
    # either sign convention for the potential (callers routinely flip
    # sign, e.g. psi = -Phi); clamping the signed ratio instead would
    # collapse psi > 0 inputs to the shallow limit silently.
    ratio = jnp.maximum(jnp.abs(phi_units / p0), 1e-30)
    shape = 0.5 * (jnp.tanh(jnp.log10(ratio * ratio)) + 1.0)
    A0 = a + (A - a) * shape
    # normalize: the literature's a corresponds to the standard a0
    return A0 / a * _a0_galactic(params)


def emond_field(rr, m_tot, params=None):
    """EMOND field: AQUAL's simple-mu closed-form inversion with the
    acceleration scale promoted to A0(phi) (:func:`emond_a0`).

    Needs the potential: pass ``params={"phi": <(N,) potential on rr>}``
    (galactic units, negative).  The spherical reduction is the same
    algebraic relation as AQUAL with a0 -> A0(phi(r)) evaluated
    pointwise."""
    if params is None or "phi" not in params:
        raise ValueError("emond_field needs params={'phi': potential "
                         "array on rr} (EMOND's A0 depends on the "
                         "potential)")
    a0 = emond_a0(params["phi"], params)
    return _simple_mu_inverse(newtonian_field(rr, m_tot), a0)


register_gravity("newtonian", newtonian_field)
register_gravity("qumond", qumond_field)
register_gravity("aqual", aqual_field)
register_gravity("emond", emond_field)


# ------------------------------------------------------------------
# Constructor-facing entry points (the reference documents exactly this
# wiring for its MOND fork: the dynamical-mass relation per law inside
# the HSE constructors, docs/source/models.rst:75-123, with the law
# config in bin/config.yaml:34-51).
# ------------------------------------------------------------------

def dynamical_mass(rr, g, gravity="newtonian", phi=None, params=None):
    """Invert a gravity law: observed HSE field ``g`` (negative, inward,
    kpc/Myr^2) -> matter ("dynamical") mass M_dyn(<r).

    * ``newtonian``: M = -r^2 g / G.
    * ``aqual``/``qumond``: in spherical symmetry with the *simple*
      interpolation pair the two theories coincide exactly — AQUAL's
      mu(x) x = y inverts to QUMOND's x = nu(y) y (check:
      nu(y) y = (y + sqrt(y^2+4y))/2 = x) — so one closed form serves
      both: g_N = mu(|g|/a0) g with mu(x) = x/(1+x), M = -r^2 g_N / G.
      This is the reference's documented relation
      M_dyn = (r^2/G) mu(|Gamma|/a0) Gamma (models.rst:96-104).
    * ``emond``: same with a0 -> A0(phi) pointwise (pass ``phi``).

    Pure jnp; jit/vmap-safe for fixed ``gravity``.
    """
    if gravity == "newtonian":
        return -rr * rr * g / C.G
    if gravity == "emond":
        if phi is None:
            raise ValueError("emond dynamical_mass needs phi")
        a0 = emond_a0(phi, params)
    elif gravity in ("aqual", "qumond"):
        a0 = _a0_galactic(params)
    else:
        raise KeyError(f"Unknown gravity law {gravity!r} for "
                       "dynamical_mass")
    x = jnp.abs(g) / a0
    g_n = g * x / (1.0 + x)  # mu(x) g
    return -rr * rr * g_n / C.G


def field_for_law(rr, m_tot, gravity="newtonian", phi=None, params=None):
    """Forward direction: matter mass profile -> field per the law
    (``get_gravity`` lookup, with EMOND's potential threaded through
    ``params``)."""
    law = get_gravity(gravity)
    if gravity == "emond":
        p = dict(params or {})
        p["phi"] = phi
        return law(rr, m_tot, p)
    return law(rr, m_tot, params)
