"""Eddington inversion vs the analytic Hernquist distribution function
(Hernquist 1990 eq. 17) — an absolute physics check, independent of any
scipy reimplementation."""

import numpy as np
import pytest

import cluster_generator_tpu as cg
from cluster_generator_tpu.core.constants import G


def hernquist_f(E, M, a):
    """Analytic isotropic DF for the Hernquist profile.

    f(E) = M / (8 sqrt(2) pi^3 a^3 v_g^3) * (1-q^2)^{-5/2} *
           [3 asin(q) + q sqrt(1-q^2) (1-2q^2)(8q^4 - 8q^2 - 3)]
    with q = sqrt(E a / (G M)), v_g = sqrt(G M / a).
    """
    v_g = np.sqrt(G * M / a)
    q = np.sqrt(E * a / (G * M))
    pref = M / (8.0 * np.sqrt(2.0) * np.pi**3 * a**3 * v_g**3)
    term = (3.0 * np.arcsin(q)
            + q * np.sqrt(1.0 - q * q) * (1.0 - 2.0 * q * q)
            * (8.0 * q**4 - 8.0 * q * q - 3.0))
    return pref * term / (1.0 - q * q) ** 2.5


@pytest.fixture(scope="module")
def hernquist_model():
    M, a = 1.0e15, 600.0
    rhot = cg.hernquist_density_profile(M, a)
    m = cg.ClusterModel.no_gas(0.5, 2.0e4, rhot, num_points=2000)
    return m, M, a


def test_df_matches_analytic(hernquist_model):
    m, M, a = hernquist_model
    v = m.dm_virial
    ee = v.ee
    ff = v.ff
    f_ref = hernquist_f(ee, M, a)
    # The numeric system is truncated at rmax (33 a): its potential is
    # offset from the infinite-extent analytic one by the missing outer
    # mass, which blows up the *analytic* comparison wherever f varies
    # steeply — at q -> 1 via the (1-q^2)^{-5/2} divergence — even though
    # the DF is exact for its own truncated system (check_virial).
    # Compare in the window q in [0.3, 0.85] where truncation effects are
    # controlled.
    q = np.sqrt(ee * a / (G * M))
    sl = (q > 0.3) & (q < 0.85)
    rel = np.abs(ff[sl] - f_ref[sl]) / f_ref[sl]
    assert np.median(rel) < 2e-2, np.median(rel)
    assert rel.max() < 1.5e-1, rel.max()
    # and the DF is positive + monotonically increasing in E (Hernquist)
    assert (ff > 0).all()
    assert (np.diff(ff) > 0).mean() > 0.99


def test_potential_matches_analytic(hernquist_model):
    m, M, a = hernquist_model
    rr = np.asarray(m["radius"])
    phi_ref = -G * M / (rr + a)
    phi = np.asarray(m["gravitational_potential"])
    # finite rmax truncates the potential by ~G M_outside; interior match
    rel = np.abs(phi[:1500] - phi_ref[:1500]) / np.abs(phi_ref[:1500])
    assert rel.max() < 5e-3, rel.max()


def test_sampled_velocity_dispersion(hernquist_model):
    """Sampled radial velocity dispersion matches the Jeans prediction in
    radial shells (integral physics of the full chain: DF -> table ->
    draws)."""
    m, M, a = hernquist_model
    p = m.generate_dm_particles(400_000, r_max=10000.0, prng=77)
    pos = np.asarray(p["dm", "particle_position"])
    vel = np.asarray(p["dm", "particle_velocity"])
    r = np.linalg.norm(pos, axis=1)
    v2 = (vel**2).sum(axis=1)
    # Hernquist isotropic sigma_r^2 (Hernquist 1990 eq. 10); use the Jeans
    # integral computed from the model instead for the finite-domain truth
    sigma = np.asarray(m.compute_velocity_dispersion("dark_matter"))
    rr = np.asarray(m["radius"])
    for r0 in [100.0, 600.0, 2000.0]:
        sel = (r > 0.9 * r0) & (r < 1.1 * r0)
        assert sel.sum() > 3000
        got = np.sqrt(v2[sel].mean() / 3.0)  # 1D dispersion
        want = np.interp(r0, rr, sigma)
        assert abs(got - want) / want < 0.05, (r0, got, want)
