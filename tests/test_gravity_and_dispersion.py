"""Gravity extension point + Jeans velocity dispersion."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad
from scipy.interpolate import InterpolatedUnivariateSpline as IUS

import cluster_generator_tpu as cg
from cluster_generator_tpu.model.gravity import (
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


def test_velocity_dispersion_jeans(canonical_model):
    sigma = canonical_model.compute_velocity_dispersion("dark_matter")
    assert (sigma >= 0).all() and np.isfinite(sigma).all()
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
