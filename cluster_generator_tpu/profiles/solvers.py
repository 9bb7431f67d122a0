"""Profile solvers: mass rescaling, overdensity radii (vectorized bisection).

Replaces radial_profiles.py:732-817 (scipy.quad + scipy.optimize.bisect) with
fixed-order quadrature and a fixed-iteration ``lax.while_loop``-free bisection
(64 halvings of [0.01, 10000] kpc reach ~5e-17 relative width — below f64
resolution), so the solvers are jit-safe and vmappable over ensembles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.cosmology import Cosmology, default_cosmology
from ..core.quadrature import gauss_legendre
from .algebra import Profile

__all__ = ["rescale_profile_by_mass", "find_overdensity_radius",
           "find_radius_mass", "mass_within"]

_BISECT_ITERS = 100
_BRACKET = (0.01, 10000.0)


def mass_within(profile: Profile, radius, order: int = 64) -> jnp.ndarray:
    """4 pi int_0^R rho(r) r^2 dr with a sqrt-substituted GL rule.

    Substituting r = R u^2 resolves the same integrable cusps scipy's
    adaptive quad handles in the reference (radial_profiles.py:758-762).
    """
    x, w = gauss_legendre(order)
    u = 0.5 * (jnp.asarray(x) + 1.0)
    wu = 0.5 * jnp.asarray(w)
    r = radius * u * u
    dr = radius * 2.0 * u
    return 4.0 * jnp.pi * jnp.sum(profile(r) * r * r * dr * wu)


def rescale_profile_by_mass(profile: Profile, mass, radius) -> Profile:
    """Rescale a density profile to enclose ``mass`` within ``radius``
    (radial_profiles.py:732-762)."""
    rescale = mass / mass_within(profile, radius)
    return rescale * profile


def find_overdensity_radius(m, delta, z=0.0, cosmo: Cosmology | None = None):
    """Radius enclosing mass ``m`` at overdensity ``delta``
    (radial_profiles.py:765-788)."""
    if cosmo is None:
        cosmo = default_cosmology()
    rho_crit = cosmo.critical_density(z)
    return (3.0 * m / (4.0 * jnp.pi * delta * rho_crit)) ** (1.0 / 3.0)


def find_radius_mass(m_r: Profile, delta, z=0.0, cosmo: Cosmology | None = None):
    """(r_delta, M(r_delta)) for a mass profile (radial_profiles.py:791-817).

    Bisection on f(r) = 3 M(r) / (4 pi r^3) - delta rho_crit over the same
    [0.01, 10000] kpc bracket the reference uses, with a fixed count of
    100 halvings (jit/vmap-safe, no data-dependent control flow) and
    wrapped in ``lax.custom_root`` so r_delta carries exact *implicit*
    derivatives with respect to the profile parameters — bisection alone is
    piecewise-constant and would silently zero the dr/dtheta chain in any
    gradient-based calibration (tests/test_autodiff.py).

    Returns NaN when the bracket does not straddle a root (same-signed
    ``f`` at both ends — e.g. r_delta outside [0.01, 10000] kpc), where
    the reference's ``scipy.bisect`` raised; a silent bracket-endpoint
    answer would be wrong physics.
    """
    if cosmo is None:
        cosmo = default_cosmology()
    rho_crit = cosmo.critical_density(z)

    def f(r):
        return 3.0 * m_r(r) / (4.0 * jnp.pi * r**3) - delta * rho_crit

    def solve(fn, x0):
        lo = jnp.asarray(_BRACKET[0], jnp.float64)
        hi = jnp.asarray(_BRACKET[1], jnp.float64)
        flo = fn(lo)
        bracketed = jnp.sign(flo) != jnp.sign(fn(hi))

        def body(_, state):
            lo, hi, flo = state
            mid = 0.5 * (lo + hi)
            fmid = fn(mid)
            go_right = jnp.sign(fmid) == jnp.sign(flo)
            lo2 = jnp.where(go_right, mid, lo)
            flo2 = jnp.where(go_right, fmid, flo)
            hi2 = jnp.where(go_right, hi, mid)
            return lo2, hi2, flo2

        lo, hi, _ = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi, flo))
        return jnp.where(bracketed, 0.5 * (lo + hi), jnp.nan)

    def tangent_solve(g, y):
        # g is linear & scalar: solve g(x) = y
        return y / g(1.0)

    r_delta = jax.lax.custom_root(f, jnp.asarray(1000.0, jnp.float64), solve,
                                  tangent_solve)
    return r_delta, m_r(r_delta)
