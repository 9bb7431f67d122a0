"""Quadrature engine vs scipy adaptive quad (the reference's ground truth,
utils.py:129-151)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad

import cluster_generator_tpu as cg
from cluster_generator_tpu.core.grid import numpy_log_radius_grid
from cluster_generator_tpu.core.quadrature import (
    cumtrapz,
    integrate_from,
    integrate_mass,
    integrate_tail_to_inf,
)

RR = numpy_log_radius_grid(0.1, 1.0e4, 1000)


def _scipy_integrate_mass(profile, rr):
    mass_int = lambda r: float(profile(np.atleast_1d(r))[0]) * r * r
    return np.array([4.0 * np.pi * quad(mass_int, 0, r)[0] for r in rr])


@pytest.mark.parametrize("profile_name,profile", [
    ("nfw", cg.nfw_density_profile(1.0e7, 500.0)),
    ("hernquist", cg.hernquist_density_profile(1.0e15, 600.0)),
    ("vikhlinin", cg.vikhlinin_density_profile(1.0e7, 100.0, 1000.0, 1.0,
                                               0.67, 3)),
    ("snfw", cg.snfw_density_profile(1.2e15, 500.0)),
])
def test_integrate_mass_vs_scipy(profile_name, profile):
    mine = np.asarray(integrate_mass(profile, jnp.asarray(RR)))
    # sample scipy at a subset (adaptive quad is slow)
    idx = np.unique(np.linspace(0, RR.size - 1, 60).astype(int))
    ref = np.array([4.0 * np.pi * quad(
        lambda r: float(profile(np.array([r]))[0]) * r * r, 0, RR[i],
        limit=200)[0] for i in idx])
    rel = np.abs(mine[idx] - ref) / ref
    assert rel.max() < 1.0e-8, (profile_name, rel.max())


def test_integrate_from_vs_scipy():
    profile = cg.nfw_density_profile(1.0e7, 500.0)
    fn = lambda r: profile(r) * r
    mine = np.asarray(integrate_from(fn, jnp.asarray(RR)))
    idx = np.unique(np.linspace(0, RR.size - 1, 40).astype(int))
    ref = np.array([quad(lambda r: float(profile(np.array([r]))[0]) * r,
                         RR[i], RR[-1], limit=200)[0] for i in idx])
    denom = np.maximum(np.abs(ref), np.abs(ref).max() * 1e-12)
    assert (np.abs(mine[idx] - ref) / denom).max() < 1.0e-8


def test_tail_integral_vs_scipy():
    # the pressure-tail integrand of from_dens_and_tden (model.py:612-613)
    profile = cg.vikhlinin_density_profile(1.0e7, 100.0, 1000.0, 1.0, 0.67, 3)
    rmax = RR[-1]
    fn = lambda r: profile(r) * (rmax / r) ** 2
    mine = float(integrate_tail_to_inf(fn, rmax))
    ref = quad(lambda r: float(profile(np.array([r]))[0]) * (rmax / r) ** 2,
               rmax, np.inf, limit=200)[0]
    assert abs(mine - ref) / ref < 1.0e-8


def test_cumtrapz_matches_scipy():
    from scipy.integrate import cumulative_trapezoid

    y = np.sin(RR / 1000.0)
    mine = np.asarray(cumtrapz(jnp.asarray(y), jnp.asarray(RR)))
    ref = cumulative_trapezoid(y, x=RR, initial=0.0)
    assert np.allclose(mine, ref, rtol=1e-12, atol=1e-300)


def test_tail_integral_shallow_decay():
    """The s^2-substituted tail rule handles slow power-law decays: exact
    for r^-1.5 and r^-2, GL-accurate down to ~r^-1.2 (the plain 1/t map
    lost ~0.7% at p=1.5)."""
    from cluster_generator_tpu.core.quadrature import integrate_tail_to_inf

    r0 = 10.0
    # p=1.25 leaves an integrable s^-0.5 endpoint singularity: GL gets
    # percent-level there (the old map was already 0.7% wrong at p=1.5)
    for p, tol in [(1.5, 1e-12), (2.0, 1e-12), (3.0, 1e-12),
                   (1.25, 1e-2), (4.0, 1e-10)]:
        exact = r0 ** (1.0 - p) / (p - 1.0)
        got = float(integrate_tail_to_inf(lambda r: r ** (-p), r0))
        assert abs(got - exact) / exact < tol, (p, got, exact)


def test_integrate_mass_randomized_profile_params():
    """Sweep randomized profile parameters (scales, slopes, radii over
    decades) and hold the scipy.quad parity bar on a thinned radius set —
    the canonical-parameter tests can hide parameter-dependent quadrature
    blind spots (e.g. panel placement vs a tiny core radius)."""
    rng = np.random.default_rng(7)
    rr = RR[::50]  # 20 radii per case keeps scipy.quad affordable
    cases = []
    for _ in range(6):
        cases.append(cg.nfw_density_profile(10 ** rng.uniform(5, 9),
                                            10 ** rng.uniform(1.0, 3.3)))
        cases.append(cg.hernquist_density_profile(10 ** rng.uniform(13, 15.5),
                                                  10 ** rng.uniform(1.5, 3.2)))
        cases.append(cg.vikhlinin_density_profile(
            10 ** rng.uniform(5, 8), 10 ** rng.uniform(0.5, 2.5),
            10 ** rng.uniform(2.5, 3.5), rng.uniform(0.3, 1.5),
            rng.uniform(0.4, 0.9), 3))
    for i, prof in enumerate(cases):
        ours = np.asarray(integrate_mass(prof, jnp.asarray(rr)))
        ref = _scipy_integrate_mass(prof, rr)
        err = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-300)
        assert err.max() < 1e-6, (i, err.max())
