"""Gravity extension point + Jeans velocity dispersion."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad
from scipy.interpolate import InterpolatedUnivariateSpline as IUS

import cluster_generator_tpu as cg
from cluster_generator_tpu.model.gravity import (
    aqual_field,
    emond_a0,
    emond_field,
    get_gravity,
    newtonian_field,
    qumond_field,
    register_gravity,
)


def test_registry():
    assert get_gravity("newtonian") is newtonian_field
    assert get_gravity("qumond") is qumond_field
    with pytest.raises(KeyError):
        get_gravity("nope")
    register_gravity("custom", lambda rr, m, p=None: rr * 0.0)
    assert get_gravity("custom") is not None


def test_newtonian_matches_model(canonical_model):
    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    g = np.asarray(newtonian_field(rr, m))
    assert np.allclose(g, np.asarray(canonical_model["gravitational_field"]),
                       rtol=1e-12)


def test_qumond_stronger_in_weak_field(canonical_model):
    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    g_n = np.asarray(newtonian_field(rr, m))
    g_q = np.asarray(qumond_field(rr, m))
    # |g_qumond| > |g_newton| everywhere; boost grows with radius
    assert (np.abs(g_q) > np.abs(g_n)).all()
    boost = np.abs(g_q / g_n)
    assert boost[-1] > boost[0]


def test_aqual_closed_form_and_limits(canonical_model):
    """The spherical AQUAL inversion must satisfy mu(x) x = y exactly
    (mu(x) = x/(1+x), the reference config's AQUAL lambda) and approach
    Newton in the strong field / sqrt(g_N a0) in the deep-MOND limit."""
    from cluster_generator_tpu.core import constants as C
    from cluster_generator_tpu.core.config import cgparams

    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    a0 = (cgparams["gravity"]["mond"]["a0_m_s2"]
          * C.MYR_S**2 / C.KPC_M)
    g_n = np.asarray(newtonian_field(rr, m))
    g_a = np.asarray(aqual_field(rr, m))
    x, y = np.abs(g_a) / a0, np.abs(g_n) / a0
    np.testing.assert_allclose(x * (x / (1.0 + x)), y, rtol=1e-12)
    assert (np.abs(g_a) > np.abs(g_n)).all()
    # the MOND boost x/y = (1 + sqrt(1 + 4/y))/2 grows outward (weaker
    # field); exact at both ends
    boost = np.abs(g_a / g_n)
    np.testing.assert_allclose(boost, 0.5 * (1.0 + np.sqrt(1.0 + 4.0 / y)),
                               rtol=1e-12)
    assert boost[-1] > boost[0] > 1.0
    # weak-field end: deep-MOND asymptote sqrt(g_N a0) plus an O(g_N)
    # correction (x = sqrt(y) + y/2 + O(y^1.5) for small y)
    deep = np.sqrt(np.abs(g_n[-1]) * a0)
    assert deep < np.abs(g_a[-1]) < deep + np.abs(g_n[-1])


def test_emond_a0_and_field(canonical_model):
    """EMOND's A0(phi): -> a0 in shallow potentials, -> (A/a) a0 in deep
    ones, monotone in |phi| ((a+A)/2 at the p0 scale), and emond_field
    demands phi.  The reference's config lambda writes the shape as
    log10(x/p0)**2 (exponent outside the log) which is non-monotonic
    and never reduces to a0 — this rebuild fixes it to the
    log-of-square literature form (gravity.emond_a0 docstring)."""
    from cluster_generator_tpu.core import constants as C

    to_units = (C.KPC_M / C.MYR_S / 1.0e5) ** 2  # kpc^2/Myr^2 -> (100km/s)^2
    phi_p0 = -7.614 / to_units
    a0_gal = 1.2e-10 * C.MYR_S**2 / C.KPC_M
    a0_at_p0 = float(emond_a0(phi_p0))
    # at phi = p0 the tanh argument is 0 -> A0 = (a + A)/2 scaled
    assert abs(a0_at_p0 / a0_gal
               - 0.5 * (0.003868 + 0.30944) / 0.003868) < 1e-6
    # shallow potential: standard MOND recovered (A0 -> a0)
    base = float(emond_a0(phi_p0 * 1e-12))
    assert abs(base / a0_gal - 1.0) < 1e-3
    # deep potential: full EMOND boost A0 -> (A/a) a0 (~80x)
    deep = float(emond_a0(phi_p0 * 1e12))
    assert abs(deep / a0_gal - 0.30944 / 0.003868) < 1e-3
    # monotone non-decreasing in |phi|
    sweep = np.asarray(emond_a0(phi_p0 * np.logspace(-6, 6, 121)))
    assert (np.diff(sweep) >= -1e-12 * a0_gal).all()

    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    phi = jnp.asarray(canonical_model["gravitational_potential"])
    g_e = np.asarray(emond_field(rr, m, {"phi": phi}))
    g_n = np.asarray(newtonian_field(rr, m))
    assert np.isfinite(g_e).all() and (np.abs(g_e) > np.abs(g_n)).all()
    with pytest.raises(ValueError, match="phi"):
        emond_field(rr, m)
    assert get_gravity("aqual") is aqual_field
    assert get_gravity("emond") is emond_field
    # A0 is EVEN in phi (log of the SQUARE): the psi = -Phi sign
    # convention used throughout the codebase must give identical
    # values, not silently collapse to the shallow-potential limit
    np.testing.assert_allclose(np.asarray(emond_a0(-phi)),
                               np.asarray(emond_a0(phi)), rtol=0)


def test_velocity_dispersion_jeans(canonical_model):
    sigma = canonical_model.compute_velocity_dispersion("dark_matter")
    assert (sigma >= 0).all() and np.isfinite(sigma).all()
    # r_a <= 0 would silently NaN-poison the stored field; validated
    # like the other two r_a entry points
    for bad in (0.0, -500.0):
        with pytest.raises(ValueError, match="r_a"):
            canonical_model.compute_velocity_dispersion("dark_matter",
                                                        r_a=bad)
    # scipy cross-check at a few radii
    rr = np.asarray(canonical_model["radius"])
    rho = IUS(rr, np.asarray(canonical_model["dark_matter_density"]))
    g = IUS(rr, np.asarray(canonical_model["gravitational_field"]))
    for i in [100, 400, 700]:
        val = quad(lambda r: rho(r) * (-g(r)), rr[i], rr[-1], limit=200)[0]
        ref = np.sqrt(val / rho(rr[i]))
        assert abs(sigma[i] - ref) / ref < 1e-6
    # enables RadialRandomVelocityField straight from the model
    f = cg.RadialRandomVelocityField([0] * 3, [1000.0] * 3, [16] * 3, 100.0,
                                     500.0, [500.0] * 3, canonical_model,
                                     prng=1)
    assert np.isfinite(f["velocity_x"]).all()
